package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sketch/sampling primitives whose randomness is md5-derived — no RNG
  * state, no seed coordination, and (unlike HLL implementations, whose
  * register layouts differ by engine) EXACTLY reproducible anywhere
  * md5 exists, so every estimate is oracle-checkable.
  */
object Sketches {

  /** 60-bit uniform hash of a value: u60(first 15 md5 hex chars). */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV (k-minimum-values) distinct-count estimate: with u_k = the
    * k-th smallest distinct hash mapped into (0, 1], the estimator is
    * `(k−1) / u_k` (Bar-Yossef et al. 2002). Scale shape: the native
    * `graft_kmv_mins` aggregate (a TypedImperativeAggregate) carries a
    * bounded ≤k-entry buffer per partition and merges buffers — ONE
    * aggregation, state O(k), versus the relational
    * `distinct().limit(k)` form that shuffles every distinct hash in
    * the corpus for a k-row answer
    * ([[kmvDistinctRelational]], kept as the equivalence reference).
    * Returns one row: (k, kth_hash, estimate). */
  def kmvDistinct(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // nulls drop (SQL COUNT DISTINCT semantics); hash60(null) is null
    // and the aggregate skips nulls — the filter just prunes the scan
    df.filter(col(colName).isNotNull)
      .agg(call_function("graft_kmv_mins",
        hash60(col(colName)), lit(k)).as("s"))
      .select(lit(k.toLong).as("k"), col("s.kth_hash").as("kth_hash"),
        // when fewer than k distinct values exist the count is exact
        kmvEstimate(col("s"), k).as("estimate"))
  }

  /** The KMV estimate from a `graft_kmv_mins` struct column — shared
    * by the direct, grouped, and merged forms. Exact when fewer than
    * k distinct values were seen. */
  private def kmvEstimate(s: Column, k: Int): Column =
    when(s.getField("n_mins") < k, s.getField("n_mins").cast("double"))
      .otherwise(round(lit((k - 1).toDouble) /
        ((s.getField("kth_hash").cast("double") + 1.0) / lit(math.pow(2.0, 60))), 6))

  /** PER-GROUP KMV sketches: one bounded ≤k-long min-set and estimate
    * per group — the MERGEABLE corpus-stats pattern (per-source
    * vocabulary sizes, per-shard id cardinalities). Each sketch is
    * O(k) state carried by the native aggregate; the `mins` arrays are
    * what downstream merges consume ([[kmvMergeSketches]]): compute
    * once per shard as data lands, merge later — never re-scan the
    * corpus for a global number.
    * Output: (group, n_mins, kth_hash, mins, estimate). */
  def kmvSketchGrouped(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(call_function("graft_kmv_mins", hash60(col(valueCol)), lit(k)).as("s"))
      .select(col(groupCol), col("s.n_mins").as("n_mins"),
        col("s.kth_hash").as("kth_hash"), col("s.mins").as("mins"),
        kmvEstimate(col("s"), k).as("estimate"))
  }

  /** Merge per-group sketches into ONE global sketch + estimate: the k
    * smallest of the union of min-sets ARE the union's k smallest
    * (every global top-k hash is in its own group's top-k), so the
    * merged estimate equals the direct single-pass estimate EXACTLY —
    * spec-pinned, not approximately. Input: a frame with a
    * `mins array<long>` column (from [[kmvSketchGrouped]]); the merge
    * touches only sketch rows (groups × k longs), never the corpus.
    * Output: one row (k, n_mins, kth_hash, estimate). */
  def kmvMergeSketches(sketches: DataFrame, k: Int,
                       minsCol: String = "mins"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    graft.functions.GraftFunctions.register(sketches.sparkSession)
    sketches.select(explode(col(minsCol)).as("h"))
      .agg(call_function("graft_kmv_mins", col("h"), lit(k)).as("s"))
      .select(lit(k.toLong).as("k"), col("s.n_mins").as("n_mins"),
        col("s.kth_hash").as("kth_hash"), kmvEstimate(col("s"), k).as("estimate"))
  }

  /** Pairwise Jaccard ESTIMATES from per-group KMV sketches (Beyer et
    * al. 2007 k-min set operations): for groups A, B with min-sets
    * S_A, S_B, take U = the k smallest of S_A ∪ S_B; the estimator is
    * |U ∩ S_A ∩ S_B| / |U| — the fraction of the union's k-sample
    * that both sides saw. When |A ∪ B| ≤ k the estimate is EXACT.
    *
    * This is the cross-source overlap PLANNING matrix at 100 TB: the
    * corpus is touched once (building the sketches as data lands);
    * every pairwise question after that runs on sketch rows alone
    * (groups × k longs — here via a sketch-sized nested-loop
    * self-join, never a corpus join). All-integer set ops + one
    * divide, deterministic anywhere md5 exists.
    * Output: (g_a, g_b, denom, matches, est_jaccard) for g_a < g_b. */
  def kmvPairwiseJaccard(sketches: DataFrame, k: Int,
                         groupCol: String, minsCol: String = "mins"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val a = sketches.select(col(groupCol).as("g_a"), col(minsCol).as("m_a"))
    val b = sketches.select(col(groupCol).as("g_b"), col(minsCol).as("m_b"))
    a.join(b, col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("m_a"), col("m_b"),
        slice(array_sort(array_union(col("m_a"), col("m_b"))), 1, k).as("u"))
      .select(col("g_a"), col("g_b"),
        size(col("u")).cast("long").as("denom"),
        size(array_intersect(col("u"),
          array_intersect(col("m_a"), col("m_b")))).cast("long").as("matches"))
      .withColumn("est_jaccard",
        round(col("matches").cast("double") / col("denom"), 6))
  }

  /** The relational form of [[kmvDistinct]] — distinct hashes then the
    * k minimums via TakeOrdered. Correct, but its distinct() shuffles
    * every distinct hash; kept as the independent reference the native
    * aggregate is equivalence-tested against (SketchesSpec). */
  private[graft] def kmvDistinctRelational(df: DataFrame, colName: String,
                                           k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    df.filter(col(colName).isNotNull)
      .select(hash60(col(colName)).as("h")).distinct()
      .orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("n_mins"), max(col("h")).as("kth_hash"))
      .select(lit(k.toLong).as("k"), col("kth_hash"),
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            ((col("kth_hash").cast("double") + 1.0) / lit(math.pow(2.0, 60))), 6))
          .as("estimate"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, A-ES form): item i ranks by `ln(u_i) / w_i` with
    * u_i md5-uniform in (0,1]; the top-`n` keys are the sample. Heavier
    * weights pull the key toward 0 (ranked descending). Pure function
    * of (id, weight): repeatable across runs, partitionings and
    * engines; ranking uses the ROUNDED key so cross-engine `ln` ulp
    * noise cannot reorder. Scale: TakeOrdered, no global sort. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    val u = (hash60(col(idCol)).cast("double") + 1.0) / math.pow(2.0, 60)
    val key = round(log(u) / col(weightCol).cast("double"), 6)
    // non-positive weights are undefined under A-ES (a negative weight
    // would FLIP the key sign and sample first) — excluded, not scored
    df.filter(col(weightCol) > 0)
      .withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
  }

  /** PER-GROUP weighted sampling: `nPerGroup` rows from every group,
    * drawn ∝ weight by the same deterministic Efraimidis-Spirakis
    * keys as [[weightedSample]] — the stratified form ("200 docs per
    * language, length-weighted"). The rank window is PARTITIONED BY
    * the group key, so each window group is one stratum — keyed
    * shuffle, no global sort, no single partition; skew is bounded by
    * the largest stratum, the same bound any per-group operator
    * carries. Non-positive weights are excluded (undefined under
    * A-ES), empty groups simply absent.
    * Output: input columns + (sample_key, rank ∈ [1, nPerGroup]). */
  def weightedSampleGrouped(df: DataFrame, groupCol: String, idCol: String,
                            weightCol: String, nPerGroup: Int): DataFrame = {
    require(nPerGroup > 0, "nPerGroup must be positive")
    val u = (hash60(col(idCol)).cast("double") + 1.0) / math.pow(2.0, 60)
    val key = round(log(u) / col(weightCol).cast("double"), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("sample_key").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("sample_key", key)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= nPerGroup)
  }

  /** Contiguous 0-based row ids in `orderCol` order — the "give every
    * training example a stable index" primitive. A `row_number()` over
    * a global ORDER BY collapses to ONE partition (the classic
    * scale-killer); this runs range-partitioned sort + per-partition
    * counts (a numPartitions-sized driver collect — that array IS the
    * offset table) + a partition-local zip. `orderCol` must be a
    * unique key, or ids within ties follow partition order.
    *
    * The INPUT is persisted (MEMORY_AND_DISK) because the plan walks
    * it three times — `repartitionByRange`'s range-boundary sampling
    * job, then the two id passes (those two share the exchange's
    * shuffle files; the sampling job runs on the exchange's CHILD and
    * shares nothing). Unpersisted, an expensive upstream pipeline
    * recomputes per walk (the classic `zipWithIndex` trap) and a
    * nondeterministic source (rand/sample) would hand pass 2 DIFFERENT
    * rows than pass 1 counted. The cache is released by Spark's
    * ContextCleaner once the returned frame is unreferenced; pass
    * `persist = false` only when the input is a cheap deterministic
    * scan. */
  def contiguousIds(df: DataFrame, orderCol: String,
                    partitions: Int = 0, persist: Boolean = true): DataFrame =
    contiguousIds(df, Seq(orderCol), partitions, persist)

  /** Multi-column order-key form: ranks by the columns
    * lexicographically (all ascending). Prefer narrow NUMERIC key
    * columns over one concatenated string — range-partitioning and
    * sorting 100M+ rows on long keys is several times cheaper than on
    * fixed-width decimal/hex strings (the probe that motivated this:
    * globalShuffle at 100M rows, string key 375 s → long-pair key,
    * see NOTES). */
  def contiguousIds(df: DataFrame, orderCols: Seq[String],
                    partitions: Int, persist: Boolean): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    // A bounded plan (global limit upstream — e.g. a top-k sample)
    // announces its row count at plan time via maxRows: size the id
    // partitions from the bound instead of the session default. When
    // ONE partition suffices, the range exchange has no boundaries to
    // sample and both id passes share its shuffle files — the lineage
    // computes once and the cache below is pure overhead, so skip it.
    val bound = df.queryExecution.optimizedPlan.maxRows
    val n = if (partitions > 0) partitions
      else bound.fold(spark.sessionState.conf.numShufflePartitions)(b =>
        math.min(spark.sessionState.conf.numShufflePartitions.toLong,
          b / 4000000L + 1L).toInt)
    val input = if (persist && n > 1)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val sorted = input.repartitionByRange(n, orderCols.map(c => col(c).asc): _*)
      .sortWithinPartitions(orderCols.map(c => col(c).asc): _*)
    val rdd = sorted.rdd
    // pass 1: per-partition counts (numPartitions longs to the driver).
    // One partition has one offset — 0 — so the counting job is skipped.
    val offsets = if (n == 1) Array(0L) else {
      val counts = rdd.mapPartitionsWithIndex { case (ix, it) =>
        // Long accumulator, not it.size: Iterator.size returns Int and
        // silently wraps past 2^31 rows per partition
        var cnt = 0L
        while (it.hasNext) { it.next(); cnt += 1L }
        Iterator((ix, cnt))
      }.collect().sortBy(_._1).map(_._2)
      counts.scanLeft(0L)(_ + _)
    }
    // pass 2: attach offset + local position
    val withIx = rdd.mapPartitionsWithIndex { case (ix, it) =>
      var i = offsets(ix)
      it.map { row => val r = Row.fromSeq(i +: row.toSeq); i += 1; r }
    }
    spark.createDataFrame(withIx,
      StructType(StructField("row_ix", LongType, nullable = false) +: sorted.schema.fields))
  }

  // ---- HyperLogLog (Flajolet et al. 2007), md5-derived registers ----

  /** α_m · m² — the HLL bias-correction constant, exposed so oracle SQL
    * can interpolate the IDENTICAL double literal. */
  private[graft] def hllAlphaM2(p: Int): Double = {
    val m = 1 << p
    val alpha =
      if (m <= 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m
  }

  /** Per-GROUP HyperLogLog sketches: one dense 2^p-register array per
    * group — the other mergeable distinct-count shape next to KMV
    * ([[kmvSketchGrouped]]): registers are elementwise-MAXABLE, so
    * per-shard sketches computed as data lands union into exact global
    * registers without a corpus re-scan. Registers are md5-derived
    * (bucket = top p bits of [[hash60]], ρ = leading-zero rank of the
    * remaining 60−p bits), so — unlike every engine's built-in HLL,
    * whose register layouts differ — the sketch is EXACTLY reproducible
    * in any engine with md5, and every estimate is oracle-checkable.
    *
    * Determinism discipline: the 2^{−reg} register sum is carried as
    * the INTEGER Σ 2^{(61−p)−reg} (`s_int`, max 2^61 — overflow-safe
    * for p ≤ 16), so the only floating arithmetic is one final divide
    * (and `ln` on the linear-counting branch) — no float summation
    * order to diverge cross-engine.
    *
    * Output: (group, v_zero, s_int, registers array<int>[2^p],
    * estimate round(…,6)). Estimate = α_m·m²·2^{61−p}/s_int, switched
    * to linear counting m·ln(m/V) below 2.5m when empty registers
    * remain (the standard small-range correction). */
  def hllSketchGrouped(df: DataFrame, groupCol: String, valueCol: String,
                       p: Int): DataFrame =
    hllRegisterRows(df, groupCol, valueCol, p)
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("rho")))).as("rm"))
      .select(col(groupCol),
        transform(sequence(lit(0), lit((1 << p) - 1)),
          i => coalesce(element_at(col("rm"), i), lit(0))).as("registers"))
      .transform(withHllStats(_, p, Seq(groupCol)))

  /** The SPARSE (group, bucket, rho-max) register rows BEFORE
    * densification — a single `groupBy.max`, which makes it the
    * STREAMING-maintainable form of the sketch: a watermark-free
    * update-mode aggregation keeps the running max per (group,
    * bucket) across micro-batches with state bounded by
    * groups × 2^p ints, and the maintained rows equal the batch
    * registers at every point (max is order-insensitive).
    * [[hllSketchGrouped]] is this plus densify + estimate. */
  def hllRegisterRows(df: DataFrame, groupCol: String, valueCol: String,
                      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision p in [4, 16]")
    val rem = col("h").bitwiseAND(lit((1L << (60 - p)) - 1L))
    val rho = when(rem === 0L, lit(61 - p))
      .otherwise(lit(61 - p) - length(bin(rem)))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), hash60(col(valueCol)).as("h"))
      .select(col(groupCol),
        shiftrightunsigned(col("h"), 60 - p).cast("int").as("bucket"),
        rho.cast("int").as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge per-group HLL sketches into ONE global sketch + estimate:
    * registers merge by elementwise max, and because every value hashes
    * identically everywhere, merged registers EQUAL the direct global
    * computation's — the estimate matches a single-pass run exactly,
    * not approximately. Touches only sketch rows (groups × 2^p ints).
    * Output: one row (v_zero, s_int, registers, estimate). */
  def hllMergeSketches(sketches: DataFrame, p: Int,
                       registersCol: String = "registers"): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision p in [4, 16]")
    sketches
      .select(posexplode(col(registersCol)).as(Seq("bucket", "reg")))
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("reg")))).as("rm"))
      .select(transform(sequence(lit(0), lit((1 << p) - 1)),
        i => coalesce(element_at(col("rm"), i), lit(0))).as("registers"))
      .transform(withHllStats(_, p, Seq.empty))
  }

  /** Attach (v_zero, s_int, estimate) to a frame with a dense
    * `registers` array — shared by the grouped and merged forms. Two
    * selects: the estimate reads the s_int/v_zero columns the first
    * one defines. */
  private def withHllStats(df: DataFrame, p: Int,
                           keyCols: Seq[String]): DataFrame = {
    val m = 1 << p
    val keys = keyCols.map(col)
    // Σ 2^{(61−p)−reg} as a LONG fold in index order — exact integers,
    // no float sum; shiftleft via call_function (the functions.shiftleft
    // overload only takes a literal shift amount)
    val sInt = aggregate(col("registers"), lit(0L),
      (acc, r) => acc + call_function("shiftleft", lit(1L), lit(61 - p) - r))
    val vZero = size(filter(col("registers"), r => r === 0)).cast("long")
    val raw = lit(hllAlphaM2(p)) * lit(math.pow(2.0, 61 - p)) /
      col("s_int").cast("double")
    df.select(keys ++ Seq(vZero.as("v_zero"), sInt.as("s_int"),
        col("registers")): _*)
      .select(keys ++ Seq(col("v_zero"), col("s_int"), col("registers"),
        round(when(raw <= lit(2.5 * m) && col("v_zero") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
          .otherwise(raw), 6).as("estimate")): _*)
  }

  // ---- Count-min (Cormode & Muthukrishnan 2005), md5-derived rows ----

  /** Per-GROUP count-min sketches in SPARSE cell form: one
    * (group, i, bucket, cnt) row per non-empty cell, `depth` hash rows
    * of `width` buckets, row i's hash = [[hash60]] of `"i|value"`.
    * Sparse beats a dense depth×width array at scale: the sketch
    * builds in ONE aggregation keyed on (group, i, bucket) — map-side
    * partial counts collapse the corpus before the shuffle — and cells
    * merge across groups by plain summation ([[cmMergeSketches]]).
    * All-integer: estimates are oracle-exact, no float discipline
    * needed. */
  def cmSketchGrouped(df: DataFrame, groupCol: String, valueCol: String,
                      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    // pre-aggregate to (group, value, n) BEFORE the ×depth explode:
    // counts are additive, so hashing value TYPES and summing their
    // multiplicities is cell-for-cell identical to hashing every
    // occurrence — and the exploded frame shrinks from depth×values
    // to depth×TYPES (Zipf: types ≪ tokens)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("v"), col("n"),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col(groupCol), col("i"), col("n"),
        pmod(hash60(concat(col("i").cast("string"), lit("|"), col("v"))),
          lit(width.toLong)).as("bucket"))
      .groupBy(col(groupCol), col("i"), col("bucket"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Merge per-group count-min cells into one global sketch: counts are
    * additive, so cell-wise SUM of shard sketches equals the direct
    * global sketch exactly. Touches only sketch rows. */
  def cmMergeSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("i"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates from a count-min sketch: for each query
    * value, min over the `depth` rows of its cell count (missing cell
    * = 0). The classic one-sided guarantee — estimate ≥ true count —
    * holds per construction. `queries` keeps its other columns; the
    * sketch side is broadcast (depth × width cells, tiny). */
  def cmPointEstimate(sketch: DataFrame, queries: DataFrame,
                      valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    val qcols = queries.columns
    // the depth-row explode folds back through a groupBy keyed by a
    // per-ROW surrogate id, not the query columns alone: grouping by
    // value would collapse duplicate query rows, so output row count
    // would silently diverge from input (the docstring's "queries
    // keeps its other columns" row-preservation contract)
    queries
      .withColumn("__qid", monotonically_increasing_id())
      .withColumn("__i", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("__bucket",
        pmod(hash60(concat(col("__i").cast("string"), lit("|"),
          col(valueCol).cast("string"))), lit(width.toLong)))
      .join(broadcast(sketch.withColumnRenamed("i", "__i")
          .withColumnRenamed("bucket", "__bucket")),
        Seq("__i", "__bucket"), "left")
      .groupBy((col("__qid") +: qcols.map(col)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
      .drop("__qid")
  }
}
