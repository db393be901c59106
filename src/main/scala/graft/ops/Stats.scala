package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over a corpus — the "where do I cut?"
  * primitives a curation pipeline runs before it filters: exact
  * quantiles of a length/quality score (to pick gate thresholds) and
  * exact heavy hitters (to find vocabulary/domain concentration).
  * Everything is EXACT and deterministic, so every result is
  * oracle-checkable; the scale shapes avoid the two classic killers
  * (a global single-partition window for ranks, a driver-side
  * count-then-filter round trip).
  */
object Stats {

  /** Exact discrete quantiles of `valueCol`: for each q in `qs` the
    * element at 0-based rank `ceil(q·n) − 1` of the sorted column —
    * `quantile_disc` semantics (SQL PERCENTILE_DISC). `approx_percentile`
    * answers the same question with error bars; this is the exact form
    * for when the quantile IS the product (a published length cut, a
    * reproducible gate threshold).
    *
    * Scale shape: ranks come from [[Sketches.contiguousIds]]'s
    * range-partitioned two-pass zip — sorting never collapses to one
    * partition — and the q→rank targets ride a broadcast of one count
    * row, so the corpus is walked once for the sort and once for the
    * count with no driver round trip. The rank arithmetic subtracts
    * 1e-9 before ceil: q·n computed in doubles can land an ulp ABOVE
    * the exact-rational integer it means (0.1·500 → 50.000000000000004)
    * and a naive ceil would shift the rank by one.
    *
    * Ties are safe: contiguousIds breaks rank ties arbitrarily, but
    * every rank within a tie holds the same VALUE, which is all the
    * quantile reads. Nulls drop (SQL aggregate semantics). Output:
    * (q, value) — value keeps `valueCol`'s type. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val values = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("value"))
    val ranked = Sketches.contiguousIds(values, "value")
    val targets = values.agg(count(lit(1)).as("__n"))
      .select(explode(typedlit(qs.sorted)).as("q"), col("__n"))
      .withColumn("__ix",
        (ceil(col("q") * col("__n") - lit(1e-9)) - 1).cast("long"))
      .select(col("q"), col("__ix"))
    ranked.join(broadcast(targets), col("row_ix") === col("__ix"))
      .select(col("q"), col("value"))
  }

  /** Per-group exact discrete quantiles — the "calibrate the cut per
    * domain/language" form of [[exactQuantiles]] (a global p95 length
    * cut under-trims verbose domains and guts terse ones). Same
    * epsilon-corrected `ceil(q·n) − 1` rank semantics, per group.
    *
    * Scale shape: ONE shuffle on the group key feeds both windows
    * (rank and group size share the partitioning); rows are gated by
    * an `array_contains` against the |qs| target ranks BEFORE the
    * q-explode, so the corpus never multiplies by |qs| — only the
    * ≤|qs| selected rows per group do. Groups must fit a window
    * partition (the standard grouped-rank idiom; a group is a domain,
    * not the corpus). Output: (group, q, value). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("value"))
      .withColumn("__rk",
        row_number().over(byGroup.orderBy(col("value").asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(byGroup))
    def target(q: Column, n: Column): Column =
      ceil(q * n - lit(1e-9)).cast("long")
    val targets = array(qs.map(q => target(lit(q), col("__n"))): _*)
    ranked.filter(array_contains(targets, col("__rk")))
      .select(col(groupCol), explode(typedlit(qs.sorted)).as("q"),
        col("value"), col("__rk"), col("__n"))
      .filter(col("__rk") === target(col("q"), col("__n")))
      .select(col(groupCol), col("q"), col("value"))
  }

  /** Single-pass corpus profile — the observability query every
    * pipeline runs before it trusts a table: per column, row/null
    * counts, a KMV distinct-count estimate, and min/max (rendered as
    * strings for a uniform schema; the extrema compute on the native
    * type first, so numeric columns profile numerically).
    *
    * ONE corpus scan produces everything: each column contributes its
    * aggregates (count, `graft_kmv_mins`, min, max) to a single wide
    * aggregation row — the bounded KMV buffers ride the same partial
    * aggregation as the ordinary aggregates — and the wide row unpivots
    * driver-side (|cols| rows). Output:
    * (column, n_rows, n_nulls, distinct_est, min, max). */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        call_function("graft_kmv_mins",
          Sketches.hash60(col(c)), lit(k)).as(s"__kmv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      val est = when(col(s"__kmv_$c.n_mins") < k,
          col(s"__kmv_$c.n_mins").cast("double"))
        .otherwise(round(lit((k - 1).toDouble) /
          ((col(s"__kmv_$c.kth_hash").cast("double") + 1.0) /
            lit(math.pow(2.0, 60))), 6))
      wide.select(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        est.as("distinct_est"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"))
    }
    perCol.reduce(_.unionByName(_))
  }

  /** Exact heavy hitters: the distinct values of `colName` whose share
    * of non-null rows is at least `minShare`, with their exact counts.
    * One corpus walk: the per-value counts map-side combine into one
    * shuffle, and the total is the SUM of those counts — the total's
    * aggregation reuses the counts exchange (same canonical subtree →
    * ReuseExchange) instead of rescanning the corpus, and its one-row
    * result broadcasts. Output: (value, cnt, share) with share rounded
    * to 6 for cross-engine float parity. */
  def heavyHitters(df: DataFrame, colName: String,
                   minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0, "minShare must lie in (0, 1]")
    val counts = df.filter(col(colName).isNotNull)
      .groupBy(col(colName).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") >= col("__total") * minShare)
      .select(col("value"), col("cnt"),
        round(col("cnt").cast("double") / col("__total"), 6).as("share"))
  }

  // ---- Mergeable fixed-width histograms (bounded quantile sketches) --

  /** Per-GROUP fixed-width histogram sketches: (group, bin, cnt) with
    * bin = floor(value / binWidth) — the MERGEABLE quantile shape next
    * to [[exactQuantiles]]: bins are additive ([[histogramMergeSketches]]
    * is a plain per-bin SUM), so per-shard histograms computed as data
    * lands answer global quantile questions without re-sorting the
    * corpus — at the cost of `binWidth` resolution instead of
    * exactness. ONE aggregation keyed (group, bin), map-side combined;
    * state per group is bounded by the value range / binWidth. Floor
    * division is exact integer arithmetic end to end (pmod-subtract,
    * then integral `div` — never the DOUBLE `/`, which silently loses
    * bins past 2^53), correct for negative values too. Nulls drop.
    *
    * `weightCol`: sketch over a PRE-REDUCED (value, weight) frame —
    * each row counts `weight` times instead of once. The shape that
    * lets one corpus aggregation feed several sketches: reduce the
    * corpus to (group, value, n) once, then every histogram/quantile
    * consumer reads the reduced frame, never the corpus again. */
  def histogramSketchGrouped(df: DataFrame, groupCol: String,
                             valueCol: String, binWidth: Long,
                             weightCol: Option[String] = None): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    val v = col(valueCol).cast("long")
    val bin = call_function("div", v - pmod(v, lit(binWidth)), lit(binWidth))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(weightCol.map(w => sum(col(w))).getOrElse(count(lit(1))).as("cnt"))
  }

  /** Merge per-group histograms into the global histogram: per-bin SUM
    * — equals the direct single-pass histogram exactly (counts are
    * additive). Touches only sketch rows (groups × bins). */
  def histogramMergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Quantile BRACKETS from a (bin, cnt) histogram: for each q, the
    * bin containing the element at rank `ceil(q·n − 1e-9)` (the same
    * epsilon-corrected PERCENTILE_DISC rank as [[exactQuantiles]] —
    * the exact quantile PROVABLY lies in [bin_lo, bin_hi]). The
    * histogram is BOUNDED by construction (bins, not corpus rows), so
    * instead of an unpartitioned window — WindowExec's
    * single-partition warning shape, and a shuffle + sort of its own —
    * the whole frame collapses into ONE sorted array row (a plain
    * partial+final aggregation), the cumulative sums compute
    * in-expression (O(bins²) adds over slices — bins-sized by
    * contract), and the rows explode back out. One job, no window, no
    * broadcast; n falls out of the same array. Output: (q, bin,
    * bin_lo, bin_hi, cum, n). */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Double],
                         binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    hist
      .agg(sort_array(collect_list(
        struct(col("bin").as("bin"), col("cnt").as("cnt")))).as("__bins"))
      .select(col("__bins"),
        aggregate(col("__bins"), lit(0L), (a, x) => a + x("cnt")).as("n"),
        posexplode(col("__bins")).as(Seq("__i", "__b")))
      .select(col("n"), col("__b.bin").as("bin"), col("__b.cnt").as("cnt"),
        // prefix sum over the materialized array attribute (lambda
        // captures the ATTRIBUTE, never an unmaterialized subtree)
        aggregate(slice(col("__bins"), lit(1), col("__i") + 1), lit(0L),
          (a, x) => a + x("cnt")).as("cum"))
      .select(explode(typedlit(qs.sorted)).as("q"),
        col("bin"), col("cnt"), col("cum"), col("n"))
      .withColumn("__target", ceil(col("q") * col("n") - lit(1e-9)).cast("long"))
      // the containing bin: target in (cum - cnt, cum]
      .filter(col("cum") >= col("__target") &&
        col("cum") - col("cnt") < col("__target"))
      .select(col("q"), col("bin"),
        (col("bin") * binWidth).as("bin_lo"),
        ((col("bin") + 1) * binWidth - 1).as("bin_hi"),
        col("cum"), col("n"))
  }

  /** Exact discrete quantiles via the VALUE-LEVEL histogram — the same
    * PERCENTILE_DISC semantics as [[exactQuantiles]] (identical output
    * on any input), shaped for DISCRETE value columns: one map-combined
    * (value → count) aggregation replaces the corpus sort entirely,
    * then the bounded distinct-value frame collapses into ONE sorted
    * array row whose prefix sums compute in-expression (the
    * [[histogramQuantiles]] shape — no window, no single-partition
    * shuffle; boundedness is the caller's contract: |distinct values|
    * must be driver-row-sized, which is what "discrete" means here).
    * The quantile is the first value whose cumulative count reaches
    * the epsilon-corrected rank target. Use [[exactQuantiles]] for
    * continuous columns where |distinct| ≈ n. Nulls drop (SQL
    * aggregate semantics). `weightCol` as in
    * [[histogramSketchGrouped]]: each row counts `weight` times —
    * quantiles over a pre-reduced (value, n) frame. Output: (q, value). */
  def exactQuantilesDiscrete(df: DataFrame, valueCol: String,
                             qs: Seq[Double],
                             weightCol: Option[String] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("value"))
      .agg(weightCol.map(w => sum(col(w))).getOrElse(count(lit(1))).as("__cnt"))
      .agg(sort_array(collect_list(
        struct(col("value").as("value"), col("__cnt").as("cnt")))).as("__vs"))
      .select(col("__vs"),
        aggregate(col("__vs"), lit(0L), (a, x) => a + x("cnt")).as("__n"),
        posexplode(col("__vs")).as(Seq("__i", "__v")))
      .select(col("__n"), col("__v.value").as("value"),
        col("__v.cnt").as("__cnt"),
        aggregate(slice(col("__vs"), lit(1), col("__i") + 1), lit(0L),
          (a, x) => a + x("cnt")).as("__cum"))
      .select(explode(typedlit(qs.sorted)).as("q"),
        col("value"), col("__cnt"), col("__cum"), col("__n"))
      .withColumn("__target",
        ceil(col("q") * col("__n") - lit(1e-9)).cast("long"))
      .filter(col("__cum") >= col("__target") &&
        col("__cum") - col("__cnt") < col("__target"))
      .select(col("q"), col("value"))
  }

  /** Per-group cumulative distribution of an (integer-valued) score —
    * `CUME_DIST() OVER (PARTITION BY group ORDER BY value)` — WITHOUT a
    * per-group sort of the corpus. The quantile-normalization
    * primitive: heterogeneous sources score on incomparable raw scales
    * (one crawl's "good" is another's median), so selection gates
    * calibrate per source — "top 20% of each source", not one global
    * raw threshold.
    *
    * Scale shape: a corpus-wide window partitioned by source is the
    * classic skew killer (one partition per source — a 100 TB corpus
    * has FEW sources, each huge). Instead the corpus aggregates to
    * (group, value) counts — bounded by groups × |score range|, tiny
    * for any discretized score — the cumulative/total window runs on
    * THAT frame, and the per-row cume_dist comes back via a broadcast
    * join. The corpus is touched by one map-combined aggregation and
    * one broadcast join: no corpus sort, no skewed window, identical
    * values (cume_dist is tie-insensitive: every row with the same
    * (group, value) shares `cum ≤ value / n_group`).
    *
    * Output: the input plus `cume_dist` (round 6). `valueCol` should
    * be discrete (ints, a milli-scaled score): the aggregate frame is
    * |distinct values| per group. */
  def groupedCumeDist(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__n"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    val cd = counts
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"),
        round(col("__cum").cast("double") / col("__tot"), 6).as("cume_dist"))
    // null-SAFE join back (the ensembleCumeDist discipline): the
    // aggregation counts null group/value keys, so a null-unsafe
    // equi-join would silently drop those rows from the output —
    // real CUME_DIST keeps them (nulls order first)
    df.join(broadcast(cd),
        col(groupCol) <=> col("__g") && col(valueCol) <=> col("__v"))
      .drop("__g", "__v")
  }

  /** The per-source DATASET CARD: the datasheet table a corpus release
    * publishes next to its shards — per source the document/token/char
    * mass, token-count range, mean stopword quality score, exact-dup
    * incidence (corpus-wide md5 collision, so cross-source duplication
    * shows up in BOTH sources' rows), and English-ID'd doc count. One
    * row per source; every number re-derivable by any engine, so
    * consumers can AUDIT the card against the shards they downloaded.
    *
    * Scale shape: ONE corpus pass computes every per-doc scalar; the
    * dup count rides a count-over-hash-partition window on that same
    * pass (single evaluation — the [[graft.ops.Dedup.paragraphDedup]]
    * lesson: a groupBy+join-back form evaluates the corpus subtree
    * twice), then one map-combined aggregation per source. Known
    * trade: a hash shared by a huge fraction of the corpus makes a hot
    * window partition (spills, bounded by the dup group); corpora with
    * a dominant boilerplate doc should exact-dedup first.
    *
    * `mean_stop_milli` is floor(Σ stop_milli / n_docs) — integer in
    * any engine; `dup_ratio` rounds 6. */
  def datasetCard(docs: DataFrame, sourceCol: String, idCol: String,
                  textCol: String,
                  stopwords: Seq[String] =
                    graft.ops.TextOps.DefaultProfiles.head._2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextOps.tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    val perDoc = docs.select(col(sourceCol).as("source"),
      size(toks).cast("long").as("n_toks"),
      length(col(textCol)).cast("long").as("n_chars"),
      // 1000L: the multiply must run in LONG arithmetic — a 32-bit
      // 1000 * size wraps negative past ~2.15M stopword hits (a 10 MB+
      // doc) and corrupts the card's mean silently under non-ANSI eval
      (lit(1000L) * size(filter(toks, tk => array_contains(stopArr, tk))) /
        greatest(size(toks), lit(1))).cast("long").as("stop_milli"),
      TextOps.languageId(col(textCol)).as("lang"),
      md5(col(textCol)).as("h"))
    val withDup = perDoc
      .withColumn("hc", count(lit(1)).over(Window.partitionBy(col("h"))))
    withDup.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"),
        (sum(col("stop_milli")) / count(lit(1))).cast("long")
          .as("mean_stop_milli"),
        count(when(col("hc") > 1, lit(1))).as("n_dup_docs"),
        count(when(col("lang") === "en", lit(1))).as("n_en"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("min_tokens"), col("max_tokens"), col("mean_stop_milli"),
        col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6)
          .as("dup_ratio"),
        col("n_en"))
  }

  /** Population Stability Index between a REFERENCE frame and a NEW
    * frame over a discretized value column — the standard "did the
    * incoming data shift?" monitor a pipeline runs on every ingest
    * batch (rule of thumb: PSI < 0.1 stable, 0.1–0.25 drifting, >
    * 0.25 investigate). PSI = Σ_b (pₙ(b) − pᵣ(b)) · ln(pₙ(b)/pᵣ(b))
    * over fixed-width bins with add-1 smoothing on the FULL shared
    * bin domain (so mass appearing in a bin the reference never saw
    * is priced exactly, not skipped).
    *
    * Scale shape: each frame is touched by ONE map-combined bin
    * count; everything after runs on the bin-domain frame (eagerly
    * checkpointed — it feeds the totals and the join). Per-bin terms
    * convert to exact pico LONGS before the sum (the repo ln
    * discipline). Output: one row — (n_ref, n_new, n_bins,
    * psi round 6). */
  def psi(ref: DataFrame, nw: DataFrame, valueCol: String,
          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integral floor division (same discipline as histogramSketchGrouped
    // — floor(double /) silently loses bins past 2^53)
    def bins(df: DataFrame, cnt: String): DataFrame = {
      val v = col(valueCol).cast("long")
      // nulls are excluded from BOTH masses (the histogramSketchGrouped
      // discipline): a null value would bin to a null key that the
      // null-unsafe domain join can never match, inflating the totals
      // and bin count while its probability mass silently vanishes —
      // Σp < 1 and the PSI is wrong
      df.filter(col(valueCol).isNotNull)
        .select(call_function("div", v - pmod(v, lit(binWidth)), lit(binWidth)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    }
      .localCheckpoint(true)
    val r = bins(ref, "n_r")
    val n = bins(nw, "n_n")
    val dom = r.select(col("bin")).union(n.select(col("bin"))).distinct()
    val totals = r.agg(sum(col("n_r")).as("tr"))
      .crossJoin(n.agg(sum(col("n_n")).as("tn")))
      .crossJoin(dom.agg(count(lit(1)).as("nb")))
    val cells = dom
      .join(r, Seq("bin"), "left").join(n, Seq("bin"), "left")
      .crossJoin(broadcast(totals))
    val pr = (coalesce(col("n_r"), lit(0L)).cast("double") + 1.0) /
      (col("tr").cast("double") + col("nb"))
    val pn = (coalesce(col("n_n"), lit(0L)).cast("double") + 1.0) /
      (col("tn").cast("double") + col("nb"))
    cells
      .withColumn("t_pico", round((pn - pr) * log(pn / pr) * lit(1e12), 0)
        .cast("long"))
      .agg(max(col("tr")).as("n_ref"), max(col("tn")).as("n_new"),
        max(col("nb")).as("n_bins"),
        round(sum(col("t_pico")).cast("double") / lit(1e12), 6).as("psi"))
  }

  /** Source-balance audit: the Lorenz curve of `weightCol` mass over
    * `groupCol` (per-group share and cumulative share in ascending
    * weight order) with the Gini coefficient and Shannon entropy as
    * summary columns — the "is this mixture dominated by one source?"
    * table a pipeline publishes before fixing mixture weights. A
    * 100 TB corpus with gini → 1 is one source wearing a corpus
    * costume; entropy (in nats) is the effective-source-count lens on
    * the same question (e^H ≈ how many sources it behaves as).
    *
    * Scale shape: the corpus is touched by ONE map-combined sum per
    * group; everything after runs on the group-sized frame (sources,
    * domains — bounded), so the unpartitioned rank window is safe by
    * construction. Determinism: Gini's numerator Σ (2·rank − n − 1)·wᵢ
    * is exact integer arithmetic on long weights (order-free); entropy
    * terms are rounded to micro-nats BEFORE the sum (order-free long
    * sum), leaving no float-summation order anywhere.
    *
    * Output: one row per group — (group, weight, share, cum_share,
    * rank) ordered ascending by (weight, group), plus the constant
    * (gini, entropy_nats) columns (round 6). */
  def balanceAudit(df: DataFrame, groupCol: String,
                   weightCol: String): DataFrame = {
    // the per-group frame feeds FOUR downstream subtrees (rows, rank,
    // Gini aggregate, entropy aggregate) whose shapes differ enough
    // that ReuseExchange cannot unify them — without the eager
    // checkpoint the CORPUS aggregation re-runs once per subtree
    // (plan-audited: 4 FileScans). One row per group: checkpoint is
    // free, and the corpus is scanned exactly once.
    val w = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("long").as("weight"))
      .localCheckpoint(true)
    // bounded frame from here on (one row per group): collapse to ONE
    // sorted array row; rank = position, cumulative weight = prefix sum
    // in-expression — the histogramQuantiles shape, no unpartitioned
    // window
    val ranked = w
      .agg(sort_array(collect_list(struct(
        col("weight").as("wt"), col(groupCol).as("g")))).as("__gs"))
      .select(col("__gs"), posexplode(col("__gs")).as(Seq("__i", "__r")))
      .select(col("__gs"), col("__i"), (col("__i") + 1).as("rank"),
        col("__r.g").as(groupCol), col("__r.wt").as("weight"))
      .withColumn("cum_w",
        aggregate(slice(col("__gs"), lit(1), col("__i") + 1), lit(0L),
          (a, x) => a + x("wt")))
      .drop("__gs", "__i")
    val share = col("weight").cast("double") / col("total")
    val summary = ranked
      .agg(count(lit(1)).as("n"), sum(col("weight")).as("total"),
        sum((lit(2) * col("rank") - lit(1)) * col("weight")).as("g_num"))
    val withTotals = ranked.crossJoin(broadcast(summary))
    val entropy = withTotals
      .agg((sum(round(-share * log(share) * lit(1000000.0), 0).cast("long"))
        .cast("double") / lit(1000000.0)).as("h"))
    withTotals.crossJoin(broadcast(entropy))
      .select(col(groupCol), col("weight"),
        round(share, 6).as("share"),
        round(col("cum_w").cast("double") / col("total"), 6).as("cum_share"),
        col("rank").cast("long").as("rank"),
        // Gini = Σ(2i − n − 1)wᵢ / (n Σw); with g_num = Σ(2i − 1)wᵢ the
        // numerator folds to g_num − n·Σw. Exact integer arithmetic.
        round((col("g_num") - col("n") * col("total")).cast("double") /
          (col("n") * col("total")), 6).as("gini"),
        round(col("h"), 6).as("entropy_nats"))
  }
}
