package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus construction: hashed
  * n-gram importance weighting (the DSIR recipe — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"),
  * a self-trained Naive-Bayes quality classifier (the linear
  * bag-of-words scorer behind fastText-style quality filters, with
  * count-based closed-form training instead of SGD), and snake-order
  * balanced sharding for writing size-balanced training shards.
  *
  * Portability conventions (the repo-wide oracle doctrine): feature
  * hashes are md5-derived (`u60(md5(tk)[0,15)) % buckets` — DuckDB:
  * `('0x' || substr(md5(tk), 1, 15))::UBIGINT % buckets`); every `ln`
  * converts to exact integer PICO-units (×1e12, rounded, LONG) before
  * any SUM over a group, because float group-sums are
  * order-nondeterministic in every engine; doubles surface through
  * `round(…, 6)`.
  *
  * Scale shape shared by the scorers: the model side (bucket table /
  * vocabulary) is aggregate-sized, never corpus-sized — it joins back
  * by key, so AQE broadcasts it when small and shuffle-joins at scale;
  * corpus-level scalars ride a broadcast 1-row cross join, never a
  * driver collect; the corpus itself is touched by exactly one
  * explode + one keyed aggregation per pass.
  */
object Selection {

  @inline private def tokens(text: Column): Column = TextOps.tokens(text)

  /** Hashed feature bucket of a token: u60 of the first 15 md5 hex
    * chars, mod `buckets` — the same hash family as
    * [[Curation.bloomPositions]], reproducible in any engine with md5. */
  def hashedBucket(tk: Column, buckets: Int): Column =
    conv(substring(md5(tk), 1, 15), 16, 10).cast("long") % buckets

  /** DSIR importance log-weights: for every document in `raw`, the
    * log-likelihood ratio of its hashed-unigram features under the
    * `target` corpus distribution vs the `raw` corpus distribution,
    *
    *   log w(d) = Σ_tokens [ ln p_target(bucket) − ln p_raw(bucket) ]
    *
    * with add-k smoothed bucket probabilities
    * `p(b) = (C(b) + k) / (N + k·B)`. High-weight documents "read like"
    * the target; sampling ∝ w reshapes raw data toward the target
    * domain (the DSIR selection step — see [[dsirSelect]]).
    *
    * Scale: both distributions are one exploded pass each,
    * map-side-combined into `buckets`-sized count tables; the per-doc
    * score is one exploded pass over `raw` joining those tables by
    * bucket key. Documents with zero tokens surface with
    * `n_tokens = 0, log_weight = null` (left join from the id side —
    * absence is not silence).
    *
    * Output: (doc_id, n_tokens, log_weight) — log_weight rounded to 6. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame,
                     idCol: String, textCol: String,
                     buckets: Int = 4096, k: Double = 0.5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(k > 0, "add-k smoothing needs k > 0")
    def bucketed(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tk"))
      .select(col("doc_id"), hashedBucket(col("tk"), buckets).as("bkt"))
    // pre-aggregate raw tokens to (doc, bucket, n) BEFORE anything
    // else: w_pico is a per-BUCKET value, so Σ_tokens w ≡ Σ_(doc,bkt)
    // n·w exactly — and every downstream exchange (bucket counts, the
    // weight join, the per-doc sum) now carries distinct (doc, bkt)
    // pairs instead of every token occurrence, with the first shuffle
    // map-side combined.
    //
    // SINGLE-CONSUMPTION shape (r15): Catalyst copies a shared
    // subtree into every consuming branch and prunes each copy
    // differently, so ReuseExchange can never dedupe them — the old
    // rawCounts groupBy+join-back form re-ran the corpus tokenize +
    // pre-agg TWICE (stage probe: two ~4 s-CPU stages), and
    // checkpointing instead was measured 0.44 → 2.7-2.9 s on the q88
    // composition (whose upstream pipeline then materializes as a
    // dedicated serial job). Here every heavy frame is consumed
    // exactly once: the bucket total `cr` is a sum-over-bkt-partition
    // WINDOW riding the pre-agg's own exchange (state = one counter;
    // the join that follows reuses the window's hash(bkt)
    // partitioning), and the corpus totals stay the LIGHT
    // sum(size(tokens)) scans — no explode, no shuffle.
    val rawDocBkt = bucketed(raw)
      .groupBy(col("doc_id"), col("bkt")).agg(count(lit(1)).as("n"))
    val tgtCounts = bucketed(target).groupBy(col("bkt"))
      .agg(count(lit(1)).as("ct"))
    val wBkt = org.apache.spark.sql.expressions.Window.partitionBy(col("bkt"))
    val totals = raw
      .agg(sum(size(tokens(col(textCol)))).cast("long").as("nr"))
      .crossJoin(target
        .agg(sum(size(tokens(col(textCol)))).cast("long").as("nt")))
    val perToken = rawDocBkt
      .withColumn("cr", sum(col("n")).over(wBkt)) // every raw bucket exists
      .join(tgtCounts, Seq("bkt"), "left")        // unseen-in-target: count 0
      .crossJoin(broadcast(totals))
      .withColumn("w_pico", round(
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(k)) /
          (col("nt").cast("double") + lit(k * buckets))) -
          log((col("cr").cast("double") + lit(k)) /
            (col("nr").cast("double") + lit(k * buckets)))) * lit(1e12), 0)
        .cast("long"))
    val perDoc = perToken.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        round(sum(col("w_pico") * col("n")).cast("double") / lit(1e12), 6)
          .as("log_weight"))
    raw.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("log_weight"))
  }

  /** DSIR selection: the `n` highest-importance documents of `raw`
    * toward `target` (ties broken by doc_id). Deterministic top-k —
    * rank-by-weight selection, the noise-free limit of DSIR's Gumbel
    * resampling (and what its authors use for the "top-k" ablation).
    * A global TakeOrdered, never a global window: k results cross the
    * wire per partition. */
  def dsirSelect(raw: DataFrame, target: DataFrame,
                 idCol: String, textCol: String, n: Int,
                 buckets: Int = 4096, k: Double = 0.5): DataFrame =
    dsirLogWeights(raw, target, idCol, textCol, buckets, k)
      .filter(col("log_weight").isNotNull)
      .orderBy(col("log_weight").desc, col("doc_id"))
      .limit(n)

  /** Count-based Naive-Bayes training over a labeled corpus: per
    * vocabulary token, the add-k-smoothed log-likelihood ratio
    *
    *   llr(t) = ln (C_pos(t)+k)/(N_pos+k·V) − ln (C_neg(t)+k)/(N_neg+k·V)
    *
    * in exact pico-units, plus the document-prior log-odds
    * `ln(D_pos/D_neg)` on a broadcast 1-row frame. Closed-form (one
    * aggregation pass, no SGD) — the classic high-throughput text
    * classifier, and the linear model family fastText-style quality
    * filters live in.
    *
    * Returns (model, prior): model = (tk, llr_pico) — vocabulary-sized;
    * prior = 1-row (prior_pico, d_pos, d_neg). `labelCol` must be a
    * boolean column; both classes must be present. */
  def naiveBayesTrain(labeled: DataFrame, labelCol: String, textCol: String,
                      k: Double = 0.5): (DataFrame, DataFrame) = {
    require(k > 0, "add-k smoothing needs k > 0")
    // null labels are DROPPED, not trained: when(y, 1).otherwise(0)
    // would silently route unlabeled rows to the negative class in
    // both the token counts and the document prior, skewing the
    // log-odds with data nobody labeled
    val lab = labeled.filter(col(labelCol).isNotNull)
    val tok = lab
      .select(col(labelCol).as("y"), explode(tokens(col(textCol))).as("tk"))
    val counts = tok.groupBy(col("tk")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(
      sum(col("c_pos")).as("n_pos"), sum(col("c_neg")).as("n_neg"),
      count(lit(1)).as("v"))
    val docPrior = lab.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("d_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("d_neg"))
    val model = counts.crossJoin(broadcast(totals))
      .withColumn("llr_pico", round(
        (log((col("c_pos").cast("double") + lit(k)) /
          (col("n_pos").cast("double") + lit(k) * col("v"))) -
          log((col("c_neg").cast("double") + lit(k)) /
            (col("n_neg").cast("double") + lit(k) * col("v")))) * lit(1e12), 0)
        .cast("long"))
      .select(col("tk"), col("llr_pico"))
    val prior = docPrior.withColumn("prior_pico",
      round(log(col("d_pos").cast("double") / col("d_neg")) * lit(1e12), 0)
        .cast("long"))
    (model, prior)
  }

  /** Naive-Bayes inference: per document, prior log-odds + Σ llr over
    * its tokens that are IN the training vocabulary (vocab-restricted
    * NB — out-of-vocabulary tokens contribute nothing, the standard
    * inference-time convention; smoothing already handled
    * single-class tokens at train time). One exploded pass over the
    * scored corpus joining the vocabulary-sized model by token.
    * Zero-vocab-token documents score prior alone (left join from the
    * id side). Output: (doc_id, n_vocab_tokens, log_odds, predicted). */
  def naiveBayesScore(docs: DataFrame, model: DataFrame, prior: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tk"))
      .join(model, Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("llr_pico")).as("s_pico"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior.select(col("prior_pico"))))
      .select(col("doc_id"),
        coalesce(col("n_vocab_tokens"), lit(0L)).as("n_vocab_tokens"),
        round((coalesce(col("s_pico"), lit(0L)) + col("prior_pico"))
          .cast("double") / lit(1e12), 6).as("log_odds"),
        (coalesce(col("s_pico"), lit(0L)) + col("prior_pico") > 0L).as("predicted"))
  }

  /** Snake-order (boustrophedon) balanced sharding: documents ranked by
    * token count descending (ties by id) deal into `nShards` shards in
    * alternating direction — rank r goes to shard `r % n` on even
    * passes and `n−1−(r % n)` on odd passes, so each shard gets one doc
    * per pass from alternating ends of the size distribution. The
    * classic deterministic near-LPT heuristic for writing size-balanced
    * training shards (max/min shard token imbalance ≤ one document's
    * worth per pass), reproducible by any engine with a rank.
    *
    * Scale: the global rank comes from [[Sketches.contiguousIds]]'s
    * range-partitioned two-pass zip — never a single-partition window.
    * Output: (doc_id, n_tokens, shard). */
  def snakeShards(docs: DataFrame, idCol: String, textCol: String,
                  nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sized = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(size(tokens(col(textCol))), lit(0)).cast("long").as("n_tokens"))
    // (n_tokens DESC, doc_id ASC) as an all-ascending LONG pair
    // (negated size) — numeric keys range-partition and sort several
    // times cheaper than the decimal-string idiom at scale
    val keyed = sized.withColumn("__neg_tokens", -col("n_tokens"))
    val ranked = Sketches.contiguousIds(keyed, Seq("__neg_tokens", "doc_id"),
        partitions = 0, persist = true)
      .drop("__neg_tokens")
    val pass = (col("row_ix") / nShards).cast("long")
    val pos = col("row_ix") % nShards
    ranked.select(col("doc_id"), col("n_tokens"),
      when(pass % 2 === 0, pos).otherwise(lit(nShards - 1) - pos)
        .cast("long").as("shard"))
  }

  /** Deterministic seeded GLOBAL SHUFFLE of a corpus: every row gets a
    * contiguous position `pos ∈ [0, n)` in the order of
    * `md5(id || ':' || seed)` — a pseudo-random permutation that is (a)
    * reproducible from the seed alone (re-runs, resumed jobs, and any
    * other engine agree row-for-row), (b) independent of the input's
    * physical layout, and (c) re-drawable by changing the seed (epoch
    * reshuffles). This is the "shuffle the corpus before training"
    * step: sequentially-written sources (one domain per file) must not
    * reach the trainer in file order.
    *
    * Scale: the position comes from [[Sketches.contiguousIds]]'s
    * range-partitioned two-pass zip over the hash key — one range
    * exchange, numPartitions longs to the driver, never a
    * single-partition window and never a driver-side sort. Downstream
    * shard writers key on `pos / shardSize` (contiguous, size-exact) or
    * `pos % nShards` (round-robin).
    *
    * The order key is the LONG pair (u60 of md5's first 15 hex chars,
    * id): a numeric key range-partitions and sorts several times
    * faster than a hex string at 100M+ rows (measured in the
    * LayoutProbe — see NOTES), and the id tiebreak makes the total
    * order exact even under (astronomically unlikely) 60-bit hash
    * collisions, so the permutation is a function, not a tie-break
    * lottery.
    *
    * `persist` follows [[Sketches.contiguousIds]]'s contract: the
    * rank machinery walks the input an extra time (range-boundary
    * sampling), so the default TRUE protects expensive or
    * nondeterministic upstream pipelines — pass false ONLY when `df`
    * is a cheap deterministic scan (measured at 100M rows: the
    * needless cache of a plain scan costs ~3× the shuffle itself —
    * see NOTES/LayoutProbe).
    *
    * Output: the input columns plus `pos` (long). */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long,
                    persist: Boolean = true): DataFrame = {
    val keyed = df.withColumn("__shuffle_key",
      Sketches.hash60(concat(col(idCol).cast("string"), lit(":" + seed))))
    Sketches.contiguousIds(keyed, Seq("__shuffle_key", idCol),
        partitions = 0, persist = persist)
      .withColumnRenamed("row_ix", "pos")
      .drop("__shuffle_key")
  }

  /** 32-bit Morton (Z-order) key of two 16-bit dimensions: the bits of
    * `x` and `y` interleaved (`y` in the odd positions), via the
    * classic magic-mask bit spread — five shift/mask ops per dimension,
    * all built-in long arithmetic, fully inside whole-stage codegen.
    * Rows close in Morton order are close in BOTH dimensions, so
    * range-partitioning / sorting by this key clusters
    * multi-dimensionally — the Z-ORDER data-layout optimization
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`): one sorted write gives
    * min-max-pruned scans on either dimension.
    *
    * Inputs are masked to their low 16 bits (caller buckets real
    * values first). Reproducible in any engine with integer bit ops —
    * the oracle replays the same five-step spread in SQL. */
  def mortonKey(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val m = c.cast("long").bitwiseAND(lit(0xFFFFL))
      val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
      val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
      d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Cluster a frame for two-dimensional locality: range-repartition on
    * the Morton key of (x, y) and sort each partition by it — the
    * Z-order WRITE path (follow with a parquet write; each file then
    * holds a small x-range AND a small y-range, so min-max stats prune
    * scans filtered on either column). One range exchange; the sort is
    * partition-local. */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
                        numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("__z", mortonKey(x, y))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Audit of what Z-order clustering buys: bucket rows by the high
    * bits of their Morton key (fixed-width key ranges — `bucketBits`
    * top bits of a `keyBits`-wide key, deterministic, no quantile
    * pass) and report each bucket's row count and per-dimension
    * min/max envelope. Tight envelopes on BOTH dims = files whose
    * min-max stats prune on either filter column; compare against the
    * same stats bucketed on one dimension alone to quantify the layout
    * win. `keyBits` anchors the bucket split to the OCCUPIED key
    * width — dims bucketed to b bits fill 2b Morton bits, so pass
    * `keyBits = 2b` (full 16-bit dims: the default 32). One
    * map-combined aggregation.
    * Output: (bucket, n, x_min, x_max, y_min, y_max). */
  def zorderStats(df: DataFrame, x: Column, y: Column,
                  bucketBits: Int = 6, keyBits: Int = 32): DataFrame = {
    require(keyBits >= 2 && keyBits <= 32 && keyBits % 2 == 0,
      "keyBits an even number in [2, 32]")
    require(bucketBits >= 1 && bucketBits <= keyBits,
      "bucketBits in [1, keyBits]")
    val xm = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ym = y.cast("long").bitwiseAND(lit(0xFFFFL))
    df.select(shiftrightunsigned(mortonKey(x, y), keyBits - bucketBits).as("bucket"),
        xm.as("xv"), ym.as("yv"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("xv")).as("x_min"),
        max(col("xv")).as("x_max"), min(col("yv")).as("y_min"),
        max(col("yv")).as("y_max"))
  }

  /** Per-source distribution-DRIFT audit: KL(source ∥ corpus) of the
    * add-1-smoothed hashed-unigram distributions — "which source reads
    * least like the corpus" in one nat-valued number per source. The
    * mixture designer's companion to [[dsirLogWeights]] (same feature
    * space, corpus-level instead of per-doc): a source whose KL jumps
    * between snapshots changed its content pipeline; a source with the
    * max KL is the first candidate for its own mixture weight.
    *
    * KL is computed over the FULL bucket domain (sources × buckets
    * cross frame — bounded, e.g. 20 × 1024), so smoothing mass on
    * unseen buckets is counted exactly, not approximated. Per-bucket
    * terms `p·ln(p/q)` convert to exact pico-nat LONGS before the sum
    * (the repo-wide ln discipline — float group-sums are
    * order-nondeterministic in every engine).
    *
    * Scale: one token explode map-combined to (source, bucket) counts;
    * everything after runs on bucket-domain-sized frames.
    * Output: (source, n_tokens, kl_nats round 6) — n_tokens = the
    * source's token mass, the weight for any corpus-level roll-up. */
  def sourceDriftKl(docs: DataFrame, sourceCol: String, textCol: String,
                    buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // the (source, bucket) frame feeds THREE downstream subtrees
    // (source totals, corpus bucket totals, the domain join) — the
    // eager checkpoint pins the corpus explode to ONE scan (it is
    // sources × buckets rows at most)
    val sb = docs
      .select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("tk"))
      .select(col("source"), hashedBucket(col("tk"), buckets).as("bkt"))
      .groupBy(col("source"), col("bkt")).agg(count(lit(1)).as("n_sb"))
      .localCheckpoint(true)
    val sTot = sb.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
    val cb = sb.groupBy(col("bkt")).agg(sum(col("n_sb")).as("n_b"))
    val nTot = cb.agg(sum(col("n_b")).as("n"))
    // full domain: every (source, bucket) cell, zero-count included
    val dom = sTot.select(col("source"), col("n_s"))
      .crossJoin(broadcast(
        sb.sparkSession.range(buckets).select(col("id").cast("long").as("bkt"))))
    val p = (coalesce(col("n_sb"), lit(0L)).cast("double") + 1.0) /
      (col("n_s").cast("double") + buckets)
    val q = (coalesce(col("n_b"), lit(0L)).cast("double") + 1.0) /
      (col("n").cast("double") + buckets)
    dom
      .join(sb, Seq("source", "bkt"), "left")
      .join(broadcast(cb), Seq("bkt"), "left")
      .crossJoin(broadcast(nTot))
      .withColumn("t_pico", round(p * log(p / q) * lit(1e12), 0).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        round(sum(col("t_pico")).cast("double") / lit(1e12), 6).as("kl_nats"))
      .select(col("source"), col("n_tokens"), col("kl_nats"))
  }

  /** Quantile-ensemble quality score: each signal column is mapped to
    * its corpus-wide CUME_DIST and the ensemble score is the MEAN of
    * those quantiles — rank aggregation, the standard fix for
    * combining quality signals with incomparable scales and outliers
    * (a raw weighted sum lets one heavy-tailed signal dominate; in
    * quantile space every signal votes in [0, 1]). Signals must be
    * "higher is better" (negate a badness score first) and DISCRETE
    * (ints / milli-scaled ratios): the per-signal frame is its
    * distinct-value histogram.
    *
    * Scale shape: the input lineage is evaluated EXACTLY ONCE — the
    * scored frame (narrow by contract: an id plus k discrete signals)
    * is checkpointed, then ALL k signal histograms come out of ONE
    * map-combined aggregation over a (signal, value) stack (an
    * explode of k structs per row collapses map-side to the k
    * histograms' cardinality), the per-signal cumulative windows run
    * on THAT bounded frame partitioned by signal (never a corpus-wide
    * rank/sort — the [[Stats.groupedCumeDist]] trick), and the q's
    * come back via k broadcast joins against histogram-sized frames.
    * Before the fuse this op cost k + 1 passes over the input (one
    * count-aggregation per signal plus the join-back), re-running the
    * caller's signal expressions each time.
    *
    * Nulls: rows with a NULL signal are KEPT (the join back is
    * null-safe), with the SQL CUME_DIST convention — nulls order
    * first, so they share the lowest quantile. No input row is ever
    * dropped: the output is exactly the input plus `q_<signal>` per
    * signal (round 6) and `ensemble_score` = round(mean of the q's,
    * 6). Signal columns must be INTEGRAL (discrete scores by
    * contract; histograms are keyed on the long value) — enforced,
    * not just documented: a fractional-typed signal would silently
    * truncate (0.2 and 0.9 collapsing into one quantile bucket), so a
    * non-integral column type fails fast here instead. */
  def ensembleCumeDist(df: DataFrame, signalCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    require(signalCols.nonEmpty, "need at least one signal column")
    signalCols.foreach { s =>
      val dt = df.schema(s).dataType
      require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"ensembleCumeDist signal column '$s' must be integral " +
          s"(byte/short/int/long), got ${dt.simpleString}: fractional " +
          "signals would be silently truncated by the long-keyed " +
          "histograms — pre-discretize (e.g. round to milli-units) first")
    }
    val base = df.localCheckpoint(true)
    val hist = base
      .select(explode(array(signalCols.map(s =>
        struct(lit(s).as("sig"), col(s).cast("long").as("v"))): _*)).as("p"))
      .groupBy(col("p.sig").as("sig"), col("p.v").as("v"))
      .agg(count(lit(1)).as("__n"))
    val cumW = Window.partitionBy(col("sig")).orderBy(col("v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("sig"))
    // bounded: k × |distinct signal values|; checkpoint so the k
    // join-backs read it instead of re-running the stack aggregation
    val cd = hist
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .select(col("sig"), col("v"),
        round(col("__cum").cast("double") / col("__tot"), 6).as("q"))
      .localCheckpoint(true)
    val out = signalCols.foldLeft(base) { (acc, s) =>
      val cdS = cd.filter(col("sig") === s)
        .select(col("v").as("__v"), col("q").as(s"q_$s"))
      acc.join(broadcast(cdS), col(s).cast("long") <=> col("__v"), "left")
        .drop("__v")
    }
    out.withColumn("ensemble_score",
      round(signalCols.map(s => col(s"q_$s")).reduce(_ + _) /
        lit(signalCols.size.toDouble), 6))
  }
}
