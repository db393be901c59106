package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path broadcasts the (small) probe set
  * against the corpus — one pass, no corpus shuffle; the LSH path
  * buckets by random-hyperplane signs so only same-bucket candidates
  * join (IVF-style), trading recall for a corpus-size-independent
  * candidate list. Dot products run through `zip_with`+`aggregate` in
  * doubles — sequential, deterministic, engine-portable.
  */
object Similarity {

  /** Sequential double-precision dot product — a native expression over
    * primitive float arrays (graft.functions.FloatDotExpression).
    * Identical operation order to DuckDB's `list_dot_product` over a
    * DOUBLE list, so oracle hashes match bit-for-bit. */
  def dotUdf(a: Column, b: Column): Column = call_function("graft_float_dot", a, b)

  /** Deterministic double-precision cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    safeCosineRaw(dotUdf(a, b), sqrt(dotUdf(a, a)) * sqrt(dotUdf(b, b)))

  /** NaN-safe cosine: a zero-norm vector (failed embedding call,
    * padding row) scores 0.0, never 0/0 = NaN — Spark ORDERS NaN
    * above every real double and evaluates `NaN >= t` as TRUE, so an
    * unguarded division would rank the zero vector #1 in every top-k
    * and flag it as a duplicate of everything at every gate (the
    * int8Cosine / pqSearchADC guard, applied to the float path; the
    * native graft_cosine_pairs kernel uses Java NaN semantics, which
    * EXCLUDE such rows — 0.0 with a positive threshold agrees). */
  private def safeCosineRaw(dot: Column, normProduct: Column): Column =
    when(normProduct > 0, dot / normProduct).otherwise(lit(0.0))

  private def safeCosine(dot: Column, normProduct: Column): Column =
    round(safeCosineRaw(dot, normProduct), 6)

  /** Brute-force exact top-k cosine neighbors of each probe vector.
    * `probes` and `corpus` expose (id, embedding); the probe side is
    * broadcast (keep it small — that is the point of a probe set). */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("p_norm")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("c_norm"))
    val scored = p.join(c, col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("p_emb"), col("c_emb")), col("p_norm") * col("c_norm")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes: plane p's
    * component d = the first 8 hex chars of md5("p|d") as an unsigned
    * 32-bit value, mod 1e6, mapped into [-0.5, 0.5). Reproducible in any
    * engine with md5 (DuckDB:
    * `('0x' || substr(md5(p || '|' || d), 1, 8))::UBIGINT`) and across
    * runs, without RNG state. */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"$p|"), d.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L).cast("double") / 1000000.0 - 0.5

  /** Sign-random-projection bucket key: `planes` hyperplane sign bits
    * packed into a long (native expression with a memoized plane
    * matrix — see graft.functions.SrpBucketExpression; values identical
    * to [[srpBucketComposed]]). Vectors in the same bucket are ANN
    * candidates. `planeOffset` selects an independent plane family —
    * multi-table LSH uses table t's buckets at offset `t * planes`. */
  def srpBucket(emb: Column, planes: Int, planeOffset: Int = 0): Column =
    call_function("graft_srp_bucket", emb, lit(planes), lit(planeOffset))

  /** Composed-built-ins form of [[srpBucket]] — the portable reference
    * definition (one interpreted `aggregate(zip_with(...))` per plane;
    * use the native form in hot paths). */
  def srpBucketComposed(emb: Column, planes: Int, planeOffset: Int = 0): Column = {
    val dims = size(emb)
    val bits = (0 until planes).map { p =>
      val dotVal = aggregate(
        zip_with(emb, sequence(lit(0), dims - 1),
          (v, d) => v.cast("double") * planeComponent(planeOffset + p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(dotVal > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: probes join only their own SRP
    * bucket per hash table (IVF-style candidate lists), then exact
    * cosine ranks the deduplicated candidates. `tables` independent
    * plane families trade compute for recall (1-(1-r)^tables). Recall
    * < 1.0 by construction; the corpus shuffles on bucket keys only and
    * never rides the ×tables explosion — candidates re-join embeddings
    * by id. */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8,
              tables: Int = 1,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
          explode(array((0 until tables).map { t =>
            struct(lit(t).as("t"), srpBucket(col(embCol), planes, t * planes).as("bucket"))
          }: _*)).as("tb"))
        .select(col(outId), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val candidates = bucketed(corpus, "neighbor_id")
      .join(broadcast(bucketed(probes, "probe_id")), Seq("t", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("p_norm")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("c_norm"))
    val scored = candidates.join(p, Seq("probe_id")).join(c, Seq("neighbor_id"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("p_emb"), col("c_emb")), col("p_norm") * col("c_norm")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** The (vec_id, t, bucket) SRP rows of a vector frame — `tables`
    * independent plane families of `planes` sign bits, one native
    * projection, embeddings left behind (the skinny probe-row shape
    * every published index here stores). */
  def srpBucketRows(vecs: DataFrame, idCol: String = "vec_id",
                    embCol: String = "embedding", planes: Int = 8,
                    tables: Int = 4): DataFrame =
    vecs.select(col(idCol).cast("long").as("vec_id"),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("t"),
            srpBucket(col(embCol), planes, t * planes).as("bucket"))
        }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))

  /** Incremental SEMANTIC screening of a new batch's embeddings
    * against a PUBLISHED SRP index — the q117/q135/q139
    * ingestion-gate story for MEANING: `oldBuckets` is the
    * accumulated (vec_id, t, bucket) frame
    * ([[srpBucketRows]] rows, at scale the
    * [[graft.sources.SrpIndexStore]]'s (t, bucket)-bucketed table),
    * `oldVecs` the (vec_id, emb) payloads (vec_id-bucketed). The
    * batch SRP-projects once, candidates come from any shared
    * (t, bucket), and EXACT cosine verifies every candidate — a
    * verdict is never "same bucket". EVERY batch id is excluded from
    * the candidates (the crash-replay belt: re-screening a batch an
    * index already holds re-emits the original verdicts — including
    * for batch vectors that are near-dups of each other, which a
    * self-only filter would flag against each other on replay).
    * Output: one row per batch vector — (new_id, n_dup_matches,
    * dup_of = smallest matching old id, best_cosine, is_dup).
    *
    * Scale shape: tables × batch skinny rows, ONE join on (t, bucket)
    * (co-located against the published store), candidate-bounded
    * embedding joins, one aggregation. Recall is the multi-table SRP
    * bound 1-(1-r)^tables — the [[nearDuplicates]] trade, incremental. */
  def embeddingDedupAgainstIndex(newVecs: DataFrame, oldBuckets: DataFrame,
                                 oldVecs: DataFrame,
                                 idCol: String = "vec_id",
                                 embCol: String = "embedding",
                                 planes: Int = 8, tables: Int = 4,
                                 threshold: Double = 0.9): DataFrame = {
    val newK = newVecs.select(col(idCol).cast("long").as("new_id"),
      col(embCol).as("__ne"))
    // replay defense: every batch id anti-joined off the candidates
    // (post-join, batch ids broadcast — the index side keeps its
    // (t, bucket) bucketing Exchange-free; the
    // frameSetDedupAgainstIndex contract: a self-only filter would
    // let mutually-near-dup batch vectors flag each other when a
    // crash-replay screens against their own published rows)
    val batchIds = newK.select(col("new_id").as("old_id"))
    val cands = srpBucketRows(newVecs, idCol, embCol, planes, tables)
      .withColumnRenamed("vec_id", "new_id")
      .join(oldBuckets.withColumnRenamed("vec_id", "old_id"), Seq("t", "bucket"))
      .join(broadcast(batchIds), Seq("old_id"), "left_anti")
      .select(col("new_id"), col("old_id")).distinct()
    // the positional (id, emb) contract on oldVecs is VALIDATED, not
    // assumed: a frame handed in the wrong column order would cast the
    // embedding array to a null old_id, match nothing, and verdict
    // every batch vector clean — a dedup gate failing OPEN silently
    require(!oldVecs.schema.head.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType],
      s"embeddingDedupAgainstIndex oldVecs must be (vec_id, emb) in " +
        s"that order — got ${oldVecs.schema.head.name}: " +
        s"${oldVecs.schema.head.dataType.simpleString} first")
    require(oldVecs.schema(1).dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType],
      s"embeddingDedupAgainstIndex oldVecs second column must be the " +
        s"embedding array — got ${oldVecs.schema(1).dataType.simpleString}")
    val scored = cands
      .join(oldVecs.select(col(oldVecs.columns.head).cast("long").as("old_id"),
        col(oldVecs.columns(1)).as("__oe")), Seq("old_id"))
      .join(newK, Seq("new_id"))
      .withColumn("cosine", safeCosine(dotUdf(col("__ne"), col("__oe")),
        sqrt(dotUdf(col("__ne"), col("__ne"))) *
          sqrt(dotUdf(col("__oe"), col("__oe")))))
      .filter(col("cosine") >= threshold)
    val hits = scored.groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_dup_matches"), min(col("old_id")).as("dup_of"),
        max(col("cosine")).as("best_cosine"))
    newK.select(col("new_id"))
      .join(hits, Seq("new_id"), "left")
      .select(col("new_id"),
        coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"),
        col("dup_of"), col("best_cosine"),
        (coalesce(col("n_dup_matches"), lit(0L)) > 0L).as("is_dup"))
  }

  /** Measured recall of the SEMANTIC ingestion gate's SRP screen —
    * the [[annRecallAudit]] discipline applied to the GATE path
    * ([[embeddingDedupAgainstIndex]] / [[graft.sources.SrpIndexStore]],
    * whose (planes=8, tables=4, threshold=0.9) defaults ship at THIS
    * audit's >=0.93-recall row — measured here every round, raised
    * from the 0.851-recall (8,2) the r14 audit exposed): ground truth
    * is the exact all-pairs verdict set
    * (every (new, old) pair at cosine ≥ threshold), each
    * (planes, tables) construction screens with the gate's own bucket
    * derivation and verifies with the gate's own rounded exact cosine,
    * and the row reports what fraction of true duplicates the screen
    * recovers (recall) plus what it costs (candidate count, precision).
    *
    * One shared pass for ALL constructions: each side projects its
    * bucket rows once with a construction tag, candidates ride ONE
    * (cons, t, bucket) join, verification joins embeddings once. The
    * truth pass broadcasts the batch side (gate batches are
    * probe-scale; the index side streams) — the same bound the gate
    * itself relies on.
    *
    * Output: (planes, tables, n_true, n_candidates, n_found, recall,
    * precision), one row per construction — the "which construction
    * do we publish?" table, answered on data. */
  def gateRecallAudit(newVecs: DataFrame, oldVecs: DataFrame,
                      constructions: Seq[(Int, Int)],
                      threshold: Double = 0.9,
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): DataFrame = {
    require(constructions.nonEmpty, "need at least one (planes, tables) construction")
    require(constructions.forall { case (p, ts) => p >= 1 && p <= 63 && ts >= 1 },
      "planes in [1, 63], tables >= 1")
    val spark = newVecs.sparkSession
    import spark.implicits._
    val n = broadcast(newVecs.select(col(idCol).cast("long").as("new_id"),
      col(embCol).as("__ne"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("__nn")))
    val o = oldVecs.select(col(idCol).cast("long").as("old_id"),
      col(embCol).as("__oe"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("__on"))
    // exact truth: one streamed pass of the index against the
    // broadcast batch; feeds only a 1-row count, so no checkpoint
    val truth = o.join(n, col("old_id") =!= col("new_id"))
      .withColumn("cosine", safeCosine(dotUdf(col("__ne"), col("__oe")),
        col("__nn") * col("__on")))
      .filter(col("cosine") >= threshold)
      .agg(count(lit(1)).as("n_true"))
    // every construction's bucket rows in ONE tagged projection per
    // side (plane family p of construction c reuses the engine's
    // md5-portable planes at offset t·planes, exactly as the gate
    // derives them)
    def bucketRows(vecs: DataFrame, id: String): DataFrame =
      vecs.select(col(idCol).cast("long").as(id),
          explode(array(constructions.zipWithIndex.flatMap { case ((p, ts), ci) =>
            (0 until ts).map { t =>
              struct(lit(ci).as("cons"), lit(t).as("t"),
                srpBucket(col(embCol), p, t * p).as("bucket"))
            }
          }: _*)).as("tb"))
        .select(col(id), col("tb.cons").as("cons"), col("tb.t").as("t"),
          col("tb.bucket").as("bucket"))
    val cands = bucketRows(newVecs, "new_id")
      .join(bucketRows(oldVecs, "old_id"), Seq("cons", "t", "bucket"))
      .filter(col("old_id") =!= col("new_id"))
      .select(col("cons"), col("new_id"), col("old_id")).distinct()
    val verified = cands
      .join(o.select(col("old_id"), col("__oe"), col("__on")), Seq("old_id"))
      .join(n, Seq("new_id"))
      .withColumn("cosine", safeCosine(dotUdf(col("__ne"), col("__oe")),
        col("__nn") * col("__on")))
      .groupBy(col("cons"))
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("cosine") >= threshold, lit(1))).as("n_found"))
    // spine so a construction whose screen finds NOTHING still reports
    val spine = constructions.zipWithIndex
      .map { case ((p, ts), ci) => (ci, p, ts) }
      .toDF("cons", "planes", "tables")
    broadcast(spine).join(verified, Seq("cons"), "left")
      .crossJoin(broadcast(truth))
      .select(col("planes").cast("long").as("planes"),
        col("tables").cast("long").as("tables"),
        col("n_true"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        when(col("n_true") > 0L,
          round(coalesce(col("n_found"), lit(0L)).cast("double") /
            col("n_true"), 6)).as("recall"),
        when(coalesce(col("n_candidates"), lit(0L)) > 0L,
          round(coalesce(col("n_found"), lit(0L)).cast("double") /
            col("n_candidates"), 6)).as("precision"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via
    * multi-table SRP LSH: `tables` independent plane families of
    * `planes` sign bits each; a pair is a candidate when ANY table
    * buckets it together (recall 1-(1-r)^tables vs a single table's r).
    * The bucket self-join carries only (table, bucket, id) — embeddings
    * re-join by id for exact-cosine verification, so vector payloads
    * never ride the ×tables shuffle. Set `planes = 0` for exact
    * all-pairs (only sane for probe-scale inputs — guarded by
    * `exactRowLimit`, which callers must raise EXPLICITLY to run exact
    * mode on anything bigger than a probe corpus). */
  def nearDuplicates(df: DataFrame, threshold: Double, planes: Int = 8,
                     tables: Int = 1,
                     idCol: String = "vec_id", embCol: String = "embedding",
                     maxBucketSize: Int = 0,
                     exactRowLimit: Int = 100000): DataFrame = {
    if (planes <= 0)
      return exactNearDuplicates(df, threshold, idCol, embCol, exactRowLimit)
    val keyed = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      sqrt(dotUdf(col(embCol), col(embCol))).as("norm"))
    // one shuffle on the (table, bucket) key; pairs generate locally
    // per bucket group (see Dedup.pairsFromSortedIds)
    val buckets = keyed.select(col("id"),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("t"),
            srpBucket(col("emb"), planes, t * planes).as("bucket"))
        }: _*)).as("tb"))
      .groupBy(col("tb.t").as("t"), col("tb.bucket").as("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
    // maxBucketSize (0 = off) drops degenerate buckets — pair count per
    // bucket is quadratic, and a clustered embedding space can land a
    // large corpus fraction in one bucket
    val capped =
      if (maxBucketSize > 0) buckets.filter(size(col("ids")) <= maxBucketSize)
      else buckets
    val pairs = capped
      .select(explode(Dedup.pairsFromSortedIds(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    pairs
      .join(keyed.select(col("id").as("id_a"), col("emb").as("emb_a"), col("norm").as("norm_a")), Seq("id_a"))
      .join(keyed.select(col("id").as("id_b"), col("emb").as("emb_b"), col("norm").as("norm_b")), Seq("id_b"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("emb_a"), col("emb_b")), col("norm_a") * col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Low-dimension variant of [[nearDuplicates]]: embeddings RIDE the
    * one (table, bucket) shuffle and cosine verification runs where the
    * bucket lives (`graft_cosine_pairs` — norms once per member,
    * survivors only leave the group), so the whole operator is TWO
    * exchanges (bucket agg + pair distinct) versus the ids-only form's
    * five (bucket agg, distinct, two embedding re-joins, sort). The
    * trade is shuffle payload: tables × dims floats per corpus row —
    * right when dims is small (≲256); [[nearDuplicates]] stays the
    * default for high-dim corpora, where vector payloads must never
    * multiply through a shuffle. Same bucket definition, same rounded
    * cosine, same output — the two forms are interchangeable per
    * corpus shape. */
  def nearDuplicatesCompact(df: DataFrame, threshold: Double, planes: Int = 8,
                            tables: Int = 1,
                            idCol: String = "vec_id", embCol: String = "embedding",
                            maxBucketSize: Int = 0): DataFrame = {
    require(planes >= 1, "nearDuplicatesCompact needs planes >= 1")
    val keyed = df.select(col(idCol).as("id"), col(embCol).as("emb"))
    val buckets = keyed.select(col("id"), col("emb"),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("t"),
            srpBucket(col("emb"), planes, t * planes).as("bucket"))
        }: _*)).as("tb"))
      .groupBy(col("tb.t").as("t"), col("tb.bucket").as("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("emb")))).as("members"))
    val capped =
      if (maxBucketSize > 0) buckets.filter(size(col("members")) <= maxBucketSize)
      else buckets
    capped
      .select(explode(call_function("graft_cosine_pairs",
        col("members"), lit(threshold))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"),
        col("p.cosine").as("cosine"))
      .distinct()
  }

  /** A codebook frame materialized to driver arrays, cid-ascending.
    * Collecting the CODEBOOK is the broadcast: a codebook is small by
    * construction (seeds, a k-means coarse level), and embedding it in
    * the plan ships it once per executor via the task-binary broadcast —
    * the corpus never joins, shuffles, or windows for assignment. */
  private def codebookArrays(centroids: DataFrame, cidCol: String,
                             embCol: String): (Array[Long], Array[Array[Float]]) = {
    val rows = centroids.select(col(cidCol).cast("long"), col(embCol)).collect()
    val sorted = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** `n` nearest centroid ids for an embedding column — the native
    * argmin kernel (graft.functions.IvfNearestExpression): one row in,
    * one row out, distance arithmetic identical to [[ivfAssignJoined]].
    */
  def ivfNearest(emb: Column, n: Int, cids: Array[Long],
                 cembs: Array[Array[Float]]): Column =
    call_function("graft_ivf_nearest", emb, lit(n), lit(cids),
      typedlit[Seq[Seq[Float]]](cembs.map(_.toSeq).toSeq))

  /** IVF coarse quantization: assign every vector to its nearest
    * centroid by squared euclidean distance (`‖v‖² − 2·v·c + ‖c‖²`,
    * sequential double dots — deterministic and engine-portable), ties
    * broken by centroid id. `centroids` is ANY (cid, embedding) frame —
    * seeds, a trained k-means codebook, a product quantizer's coarse
    * level. Assignment is a per-row expression over the collected
    * codebook — no corpus×codebook row materialization (the joined form
    * is a ×|codebook| blowup plus a corpus-wide window at scale). */
  def ivfAssign(df: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id", embCol: String = "embedding",
                cidCol: String = "cid"): DataFrame = {
    val (cids, cembs) = codebookArrays(centroids, cidCol, embCol)
    df.withColumn("cluster", element_at(ivfNearest(col(embCol), 1, cids, cembs), 1))
  }

  /** The crossJoin+window form of [[ivfAssign]] — kept as the
    * independent reference implementation the native kernel is
    * equivalence-tested against (SimilaritySpec); not used by any
    * registered query. */
  private[ops] def ivfAssignJoined(df: DataFrame, centroids: DataFrame,
                                   idCol: String = "vec_id", embCol: String = "embedding",
                                   cidCol: String = "cid"): DataFrame = {
    val c = broadcast(centroids.select(col(cidCol).as("__cid"), col(embCol).as("__cemb")))
    val d2 = dotUdf(col(embCol), col(embCol)) -
      lit(2.0) * dotUdf(col(embCol), col("__cemb")) +
      dotUdf(col("__cemb"), col("__cemb"))
    val w = Window.partitionBy(col(idCol)).orderBy(d2, col("__cid"))
    df.crossJoin(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__cemb", "__rn")
      .withColumnRenamed("__cid", "cluster")
  }

  /** IVF search: each probe visits its `nProbe` nearest centroids'
    * inverted lists only, then exact cosine ranks the candidates —
    * the real scale path for ANN (SRP buckets partition blindly; IVF
    * lists follow the data distribution via the codebook). Join keys
    * are cluster ids: the corpus shuffles once on its assignment, the
    * probe side explodes ×nProbe. Recall < 1 by construction. */
  def ivfSearch(probes: DataFrame, corpus: DataFrame, centroids: DataFrame,
                k: Int, nProbe: Int = 2,
                idCol: String = "vec_id", embCol: String = "embedding",
                cidCol: String = "cid"): DataFrame = {
    val (cids, cembs) = codebookArrays(centroids, cidCol, embCol)
    // both sides quantize with the per-row kernel: probes explode their
    // nProbe nearest lists, the corpus maps to its single list — the
    // only join left is the candidate join on cluster ids
    val probeClusters = probes
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        explode(ivfNearest(col(embCol), nProbe, cids, cembs)).as("cluster"))
      .withColumn("p_norm", sqrt(dotUdf(col("p_emb"), col("p_emb"))))
    val corpusAssigned = corpus
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        element_at(ivfNearest(col(embCol), 1, cids, cembs), 1).as("cluster"))
      .withColumn("c_norm", sqrt(dotUdf(col("c_emb"), col("c_emb"))))
    val scored = probeClusters.join(corpusAssigned, Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("p_emb"), col("c_emb")), col("p_norm") * col("c_norm")))
    val wRank = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // no dedupe needed: a corpus vector lives in exactly ONE inverted
    // list, so each (probe, neighbor) pair joins at most once
    scored
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** ANN RECALL AUDIT: measured recall@k of IVF search against exact
    * brute-force ground truth, one row per `nProbe` configuration —
    * the [[graft.ops.Dedup.lshAudit]] counterpart for the embedding
    * side. `nProbe` is ANN's recall/cost dial (probe more inverted
    * lists → scan more candidates); this measures what each setting
    * actually buys ON THIS corpus, so the production config is a
    * number, not folklore. With `nProbe = |centroids|` every list is
    * probed and the candidate set equals the exact search's — recall
    * must read 1.0 (spec-pinned; a cheap self-test of the whole IVF
    * path).
    *
    * Scale: audits run on a probe SAMPLE (thousands), never the full
    * corpus — ground truth is [[bruteForceTopK]]'s broadcast-probe
    * corpus pass; each config is one [[ivfSearch]]. The per-config
    * joins are (probe_id, neighbor_id)-keyed counts.
    *
    * Output: (n_probe, n_returned, n_true, n_hits, recall) — every
    * configured row present, `recall` null when the truth set is
    * empty. Counts exact; recall round(…, 6). */
  def annRecallAudit(probes: DataFrame, corpus: DataFrame,
                     centroids: DataFrame, k: Int,
                     nProbeConfigs: Seq[Int] = Seq(1, 2, 4, 8),
                     idCol: String = "vec_id", embCol: String = "embedding",
                     cidCol: String = "cid",
                     // ground truth is CODEBOOK-INDEPENDENT — callers
                     // auditing several codebooks over one probe set
                     // (seeding A/Bs) compute bruteForceTopK once and
                     // pass it here instead of paying the exact pass
                     // per audit; (probe_id, neighbor_id) columns
                     truthOverride: Option[DataFrame] = None): DataFrame = {
    require(nProbeConfigs.nonEmpty, "need at least one nProbe configuration")
    require(nProbeConfigs.forall(_ > 0), "nProbe must be positive")
    val spark = probes.sparkSession
    import spark.implicits._
    // ALL configs share one pass: corpus assigned once, probes rank
    // their max(nProbe) nearest lists once, candidates join once; a
    // config explode (candidate qualifies for every np > its cluster
    // rank) then ONE window ranks every (config, probe) group — vs
    // running ivfSearch per config, which would recompute the corpus
    // assignment and the candidate join |configs| times
    val maxNp = nProbeConfigs.max
    val (cids, cembs) = codebookArrays(centroids, cidCol, embCol)
    require(maxNp <= cids.length,
      s"nProbe ${maxNp} exceeds the ${cids.length}-centroid codebook")
    val probeNearest = probes
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        posexplode(ivfNearest(col(embCol), maxNp, cids, cembs))
          .as(Seq("c_rank", "cluster")))
      .withColumn("p_norm", sqrt(dotUdf(col("p_emb"), col("p_emb"))))
    val corpusAssigned = corpus
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        element_at(ivfNearest(col(embCol), 1, cids, cembs), 1).as("cluster"))
      .withColumn("c_norm", sqrt(dotUdf(col("c_emb"), col("c_emb"))))
    val candidates = probeNearest.join(corpusAssigned, Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("p_emb"), col("c_emb")), col("p_norm") * col("c_norm")))
      .withColumn("n_probe",
        explode(array(nProbeConfigs.map(lit(_)): _*)))
      .filter(col("c_rank") < col("n_probe"))
    val wRank = Window.partitionBy(col("n_probe"), col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val approx = candidates
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("n_probe"))
    // Ground truth: when the widest config probes EVERY inverted list,
    // its candidate set is all (probe, corpus) pairs — that branch IS
    // exact search (same rounding, same tie-break), so truth falls out
    // of the shared pass for free. Otherwise pay the brute-force pass.
    // truth feeds BOTH the per-config join and the broadcast n_true
    // aggregate — eager-checkpoint so the brute-force corpus pass (or
    // the shared-pass branch's window) runs once, not twice; an
    // override arrives already materialized by its owner
    val truth = truthOverride match {
      case Some(t) => t.select(col("probe_id"), col("neighbor_id"))
        .withColumn("is_true", lit(true))
      case None => (if (maxNp == cids.length)
          approx.filter(col("n_probe") === maxNp)
            .select(col("probe_id"), col("neighbor_id"))
        else
          bruteForceTopK(probes, corpus, k, idCol, embCol)
            .select(col("probe_id"), col("neighbor_id")))
        .withColumn("is_true", lit(true))
        .localCheckpoint(true)
    }
    val perConfig = approx
      .join(truth, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_hits"))
    val spine = nProbeConfigs.toDF("n_probe")
    spine.join(perConfig, Seq("n_probe"), "left")
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .select(col("n_probe").cast("long").as("n_probe"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        col("n_true"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_true") > 0L,
          round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_true"), 6)).as("recall"))
  }

  /** MULTI-CODEBOOK recall audit: [[annRecallAudit]] for several
    * codebooks (a seeding / training A/B) in ONE shared pass — the
    * corpus is scanned once with every codebook's assignment as a
    * tagged per-row expression, candidates ride ONE (seeding, cluster)
    * join, ONE window ranks every (seeding, config, probe) group, and
    * the codebook-independent brute-force truth computes once. Running
    * |codebooks| separate audits instead pays the corpus scan, join,
    * and window per codebook — the fused shape is what an A/B HARNESS
    * needs (audit N candidate codebooks without N corpus passes).
    * Output: (seeding, n_probe, n_returned, n_true, n_hits, recall). */
  def annRecallAuditMulti(probes: DataFrame, corpus: DataFrame,
                          codebooks: Seq[(String, DataFrame)], k: Int,
                          nProbeConfigs: Seq[Int] = Seq(1, 2, 4, 8),
                          idCol: String = "vec_id", embCol: String = "embedding",
                          cidCol: String = "cid",
                          truthOverride: Option[DataFrame] = None): DataFrame = {
    require(codebooks.nonEmpty, "need at least one codebook")
    require(nProbeConfigs.nonEmpty && nProbeConfigs.forall(_ > 0),
      "nProbe configs must be positive")
    val spark = probes.sparkSession
    import spark.implicits._
    val maxNp = nProbeConfigs.max
    val arrays = codebooks.map { case (tag, c) =>
      val (cids, cembs) = codebookArrays(c, cidCol, embCol)
      require(maxNp <= cids.length,
        s"nProbe $maxNp exceeds codebook '$tag' (${cids.length} centroids)")
      (tag, cids, cembs)
    }
    val probeNearest = probes
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"),
        sqrt(dotUdf(col(embCol), col(embCol))).as("p_norm"))
      .select(col("probe_id"), col("p_emb"), col("p_norm"),
        explode(array(arrays.map { case (tag, cids, cembs) =>
          struct(lit(tag).as("seeding"),
            ivfNearest(col("p_emb"), maxNp, cids, cembs).as("nearest"))
        }: _*)).as("s"))
      .select(col("probe_id"), col("p_emb"), col("p_norm"),
        col("s.seeding").as("seeding"),
        posexplode(col("s.nearest")).as(Seq("c_rank", "cluster")))
    val corpusAssigned = corpus
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        sqrt(dotUdf(col(embCol), col(embCol))).as("c_norm"))
      .select(col("neighbor_id"), col("c_emb"), col("c_norm"),
        explode(array(arrays.map { case (tag, cids, cembs) =>
          struct(lit(tag).as("seeding"),
            element_at(ivfNearest(col("c_emb"), 1, cids, cembs), 1).as("cluster"))
        }: _*)).as("s"))
      .select(col("neighbor_id"), col("c_emb"), col("c_norm"),
        col("s.seeding").as("seeding"), col("s.cluster").as("cluster"))
    val candidates = probeNearest.join(corpusAssigned, Seq("seeding", "cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        safeCosine(dotUdf(col("p_emb"), col("c_emb")), col("p_norm") * col("c_norm")))
      .withColumn("n_probe", explode(array(nProbeConfigs.map(lit(_)): _*)))
      .filter(col("c_rank") < col("n_probe"))
    val wRank = Window.partitionBy(col("seeding"), col("n_probe"), col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val approx = candidates
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("seeding"), col("probe_id"), col("neighbor_id"), col("n_probe"))
    val truth = (truthOverride match {
      case Some(t) => t.select(col("probe_id"), col("neighbor_id"))
      case None => bruteForceTopK(probes, corpus, k, idCol, embCol)
        .select(col("probe_id"), col("neighbor_id"))
        .localCheckpoint(true)
    }).withColumn("is_true", lit(true))
    val perConfig = approx
      .join(truth, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("seeding"), col("n_probe"))
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_hits"))
    val spine = codebooks.map(_._1)
      .flatMap(tag => nProbeConfigs.map(np => (tag, np)))
      .toDF("seeding", "n_probe")
    spine.join(perConfig, Seq("seeding", "n_probe"), "left")
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .select(col("seeding"), col("n_probe").cast("long").as("n_probe"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        col("n_true"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_true") > 0L,
          round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_true"), 6)).as("recall"))
  }

  /** Symmetric int8 quantization of an embedding column — the 100 TB
    * storage lever (4× smaller than float32 at ~1% cosine error).
    * Per-vector scale = max|v| / 127; codes are `floor(v / scale)`
    * (floor, not round: floor is bit-identical across engines, round
    * ties are not). Returns `struct(scale float, codes array<tinyint>)`.
    * Composed column expressions, not a native kernel: quantization is
    * a storage-prep pass, not a per-query hot loop.
    *
    * max|v| is LET-BOUND through a one-element-array transform so the
    * codes lambda captures a lambda VARIABLE, not the max-subtree —
    * the naive capture re-evaluated the O(d) max per element (O(d²)
    * per row; the q112 capture shape, caught by LambdaGuardSpec). */
  def quantize(emb: Column): Column =
    element_at(
      transform(array(array_max(transform(emb, v => abs(v)))), m =>
        struct(
          (m.cast("double") / 127.0).cast("float").as("scale"),
          transform(emb, v =>
            when(m === lit(0f), lit(0).cast("byte"))
              .otherwise(floor(v.cast("double") * 127.0 / m.cast("double"))
                .cast("byte"))).as("codes"))),
      1)

  /** Inverse of [[quantize]]: `code × scale` back to float. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => (c.cast("double") * q.getField("scale").cast("double")).cast("float"))

  /** Integer dot product over int8 code arrays — native kernel
    * (graft.functions.Int8DotExpression), exact in Long arithmetic. */
  def int8Dot(a: Column, b: Column): Column = call_function("graft_int8_dot", a, b)

  /** Cosine similarity straight from int8 codes: per-vector
    * quantization scales CANCEL in the cosine ratio, so ranking needs
    * only integer dots — `dot(ca,cb) / (√dot(ca,ca)·√dot(cb,cb))` —
    * never the scales or a dequantized float vector. Zero vectors
    * (all-zero codes) score 0. */
  def int8Cosine(codesA: Column, codesB: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, lit(0.0))
      .otherwise(round(int8Dot(codesA, codesB).cast("double") / (normA * normB), 6))

  /** IVF search over int8-quantized vectors — the 100 TB search path:
    * the corpus rides the candidate join as `array<tinyint>` codes (4×
    * smaller than float32), scoring is the exact integer kernel, and
    * the float embeddings are touched ONLY by the per-row coarse
    * assignment (index-build side). Same join shape as [[ivfSearch]];
    * `qcosine` is the cosine of the QUANTIZED vectors (within ~1% of
    * the float cosine — SimilaritySpec asserts the bound). */
  def ivfSearchQuantized(probes: DataFrame, corpus: DataFrame, centroids: DataFrame,
                         k: Int, nProbe: Int = 2,
                         idCol: String = "vec_id", embCol: String = "embedding",
                         cidCol: String = "cid"): DataFrame = {
    val (cids, cembs) = codebookArrays(centroids, cidCol, embCol)
    // quantize in its own projection BELOW the explode: a generator
    // re-evaluates companion expressions in its own Project per OUTPUT
    // row (×nProbe here — the r3 posexplode lesson)
    val probeClusters = probes
      .select(col(idCol).as("probe_id"), col(embCol).as("__p_emb"),
        quantize(col(embCol)).getField("codes").as("p_codes"))
      .select(col("probe_id"), col("p_codes"),
        explode(ivfNearest(col("__p_emb"), nProbe, cids, cembs)).as("cluster"))
      .withColumn("p_norm", sqrt(int8Dot(col("p_codes"), col("p_codes")).cast("double")))
    val corpusAssigned = corpus
      .select(col(idCol).as("neighbor_id"),
        quantize(col(embCol)).getField("codes").as("c_codes"),
        element_at(ivfNearest(col(embCol), 1, cids, cembs), 1).as("cluster"))
      .withColumn("c_norm", sqrt(int8Dot(col("c_codes"), col("c_codes")).cast("double")))
    val scored = probeClusters.join(corpusAssigned, Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qcosine",
        int8Cosine(col("p_codes"), col("c_codes"), col("p_norm"), col("c_norm")))
    val wRank = Window.partitionBy(col("probe_id"))
      .orderBy(col("qcosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("qcosine"), col("rank"))
  }

  /** Per-cluster embedding means for one Lloyd's round: nearest-centroid
    * assignment (the native kernel, evaluated ONCE per row in its own
    * projection — a posexplode would re-evaluate the argmin per output
    * dim, measured 16× on a 600k probe) followed by ONE array-buffer
    * aggregate. A per-dimension scalar-avg aggregate would put `dims`
    * columns in the plan — at 1024-dim embeddings that is a
    * 1024-column aggregate (plan bloat + codegen-split territory); the
    * typed Aggregator instead carries a single (sum[dims], count)
    * buffer per cluster, width O(1) in dims, and still combines
    * map-side, so the shuffle holds ≤ k buffers per upstream partition.
    */
  private[ops] def clusterMeans(df: DataFrame, cids: Array[Long],
                                cembs: Array[Array[Float]], embCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Float])] = {
    val session = df.sparkSession
    import session.implicits._
    val dims = cembs.headOption.map(_.length).getOrElse(0)
    val meanAgg = new org.apache.spark.sql.expressions.Aggregator[
        (Long, Array[Float]), (Array[Double], Long), Array[Float]] {
      def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)
      def reduce(b: (Array[Double], Long), a: (Long, Array[Float])): (Array[Double], Long) = {
        val s = b._1; val v = a._2
        var i = 0; val n = math.min(dims, v.length)
        while (i < n) { s(i) += v(i); i += 1 }
        (s, b._2 + 1)
      }
      def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
        val s = x._1; val t = y._1
        var i = 0
        while (i < dims) { s(i) += t(i); i += 1 }
        (s, x._2 + y._2)
      }
      def finish(b: (Array[Double], Long)): Array[Float] =
        Array.tabulate(dims)(i => (b._1(i) / math.max(1L, b._2)).toFloat)
      def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
        implicitly[org.apache.spark.sql.Encoder[(Array[Double], Long)]]
      def outputEncoder: org.apache.spark.sql.Encoder[Array[Float]] =
        implicitly[org.apache.spark.sql.Encoder[Array[Float]]]
    }
    df.select(element_at(ivfNearest(col(embCol), 1, cids, cembs), 1).as("cluster"),
        col(embCol).as("emb"))
      .as[(Long, Array[Float])]
      .groupByKey(_._1)
      .agg(meanAgg.toColumn.name("mean"))
  }

  /** Deterministic farthest-first codebook seeding (Gonzalez 1985) —
    * the kmeans++ INTENT (spread seeds across the data instead of
    * clumping them) without kmeans++'s RNG: seed 0 is the lowest-id
    * vector; each next seed is the vector FARTHEST (squared euclidean)
    * from its nearest already-chosen seed, ties by id. Lowest-id
    * seeding ([[trainCodebook]]'s default) can start all k seeds
    * inside one natural cluster, starving the others and hurting IVF
    * recall at small nProbe; farthest-first provably 2-approximates
    * the optimal k-center spread.
    *
    * Scale shape: k−1 corpus passes, each ONE TakeOrdered(1) over a
    * per-row `least(d²…)` projection against the ≤k chosen seeds
    * embedded as literals — no corpus shuffle, no corpus×seed
    * materialization; only single rows reach the driver (the codebook
    * collect pattern). Distance arithmetic is the sequential double
    * dot of [[dotUdf]], so seed choices replay exactly in any engine.
    * Output: (cid 0..k−1 in selection order, embCol). */
  def seedCodebookFarthest(df: DataFrame, k: Int,
                           idCol: String = "vec_id",
                           embCol: String = "embedding",
                           sampleSize: Int = 0): DataFrame = {
    require(k >= 1, "need at least one seed")
    val session = df.sparkSession
    import session.implicits._
    val chosen: Vector[Array[Float]] =
      if (sampleSize > 0) {
        // SAMPLED path (the kmeans‖ idea: seed from a bounded sample,
        // not k corpus passes): ONE TakeOrdered draws the
        // `sampleSize` vectors with the smallest md5-uniform id hash
        // (deterministic, layout-independent), and the greedy runs
        // driver-side over that bounded set — job count is CONSTANT
        // in k, the property a 32k-centroid codebook at 100 TB needs.
        // Distance arithmetic matches the distributed path double for
        // double (sequential folds), so either path is oracle-exact.
        val sample = df
          .select(col(idCol).cast("long").as("id"), col(embCol).as("e"),
            Sketches.hash60(col(idCol)).as("h"))
          .orderBy(col("h"), col("id")).limit(sampleSize)
          .select(col("id"), col("e")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        require(sample.nonEmpty, "cannot seed from an empty corpus")
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var acc = 0.0; var i = 0; val n = math.min(a.length, b.length)
          while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
          acc
        }
        def d2(a: Array[Float], b: Array[Float]): Double =
          dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
        var picked = Vector(sample.minBy(_._1)._2)
        val minD = scala.collection.mutable.Map.empty[Long, Double]
        sample.foreach { case (id, e) => minD(id) = d2(e, picked.head) }
        while (picked.size < math.min(k, sample.length)) {
          val (nextId, _) = sample
            .map { case (id, _) => (id, minD(id)) }
            .maxBy { case (id, d) => (d, -id) } // d DESC, id ASC
          val nextEmb = sample.find(_._1 == nextId).get._2
          picked :+= nextEmb
          sample.foreach { case (id, e) =>
            val d = d2(e, nextEmb); if (d < minD(id)) minD(id) = d
          }
        }
        picked
      } else {
        // EXACT path: k−1 corpus passes, each one TakeOrdered(1) over
        // a least(d²…) projection against the chosen seeds as
        // literals — no corpus shuffle, single rows to the driver.
        val firstRow = df.orderBy(col(idCol)).limit(1)
          .select(col(embCol)).collect()
        require(firstRow.nonEmpty, "cannot seed from an empty corpus")
        var picked = Vector(firstRow.head.getSeq[Float](0).toArray)
        while (picked.size < k) {
          val d2 = picked.map { c =>
            val cl = typedlit[Seq[Float]](c.toSeq)
            // ‖e‖² − 2·e·c + ‖c‖²; ‖c‖² folded driver-side with the
            // same sequential double accumulation as the kernel
            val c2 = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
            dotUdf(col(embCol), col(embCol)) -
              lit(2.0) * dotUdf(col(embCol), cl) + lit(c2)
          }.reduce(least(_, _))
          val next = df.select(col(idCol), col(embCol), d2.as("__d2"))
            .orderBy(col("__d2").desc, col(idCol)).limit(1)
            .select(col(embCol)).collect()
          picked :+= next.head.getSeq[Float](0).toArray
        }
        picked
      }
    chosen.zipWithIndex
      .map { case (emb, i) => (i.toLong, emb) }.toDF("cid", embCol)
  }

  /** Lloyd's k-means codebook trainer for IVF: `iterations` rounds of
    * [[clusterMeans]] (one argmin projection + one array-buffer
    * aggregate, O(1) plan width in dims). Only codebook-sized frames
    * (≤ k rows per round) ever reach the driver — that collect IS the
    * broadcast of the next round's codebook. Seeds: the k lowest-id
    * vectors (deterministic). Empty clusters keep their previous
    * centroid. Returns a (cid, embCol) frame ready for
    * [[ivfAssign]]/[[ivfSearch]]. */
  def trainCodebook(df: DataFrame, k: Int, iterations: Int = 4,
                    idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val seeds = df.orderBy(col(idCol)).limit(k).select(col(embCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    val cids = Array.tabulate(seeds.length)(_.toLong)
    var cembs = seeds
    val dims = seeds.headOption.map(_.length).getOrElse(0)
    (1 to (if (dims > 0) iterations else 0)).foreach { _ =>
      clusterMeans(df, cids, cembs, embCol).collect().foreach { case (cid, mean) =>
        cembs = cembs.updated(cid.toInt, mean)
      }
    }
    cids.zip(cembs).toSeq.toDF("cid", embCol)
  }

  /** Cluster-balanced corpus sampling: IVF-assign every vector to its
    * nearest codebook centroid (per-row kernel, no corpus×codebook
    * join), then take exactly `perCluster` vectors per cluster by the
    * stable md5-of-id order — the "diverse subset" primitive (semantic
    * dedup / coverage sampling à la SemDeDup): one shuffle total, on
    * the cluster key. */
  def clusterBalancedSample(df: DataFrame, centroids: DataFrame, perCluster: Int,
                            idCol: String = "vec_id", embCol: String = "embedding",
                            cidCol: String = "cid"): DataFrame =
    Curation.stratifiedTake(ivfAssign(df, centroids, idCol, embCol, cidCol),
      "cluster", idCol, perCluster)

  /** Per-cluster embedding centroids over an already-assigned frame
    * (`clusterCol` from [[ivfAssign]], [[semanticDedup]]'s labels, any
    * partition key): ONE map-side-combined aggregation whose buffer is
    * `dims+1` longs per group — the native `graft_vec_sum` kernel sums
    * micro-unit (×`scale`, rounded) components exactly, so the centroid
    * is partitioning-invariant AND oracle-replayable where a float SUM
    * is order-nondeterministic. The relational alternative — posexplode
    * to (row × dims) before the aggregation — multiplies the corpus 64×
    * on the map side for the same result ([[clusterCentroidsExploded]],
    * kept as the equivalence reference). Codebook refinement (the
    * k-means M-step), cluster diagnostics, SemDeDup telemetry all sit
    * on this. Output: (cluster, n_vecs, centroid array<double> @6dp). */
  def clusterCentroids(assigned: DataFrame, clusterCol: String,
                       embCol: String, scale: Long = 1000000L): DataFrame =
    assigned.groupBy(col(clusterCol).as("cluster"))
      .agg(call_function("graft_vec_sum", col(embCol), lit(scale)).as("vs"))
      .select(col("cluster"), col("vs.n").as("n_vecs"),
        transform(col("vs.sums"), s =>
          round(s.cast("double") / lit(scale.toDouble) / col("vs.n"), 6))
          .as("centroid"))

  /** Cluster PURITY against a label column: per cluster the majority
    * label, its count and the purity fraction — the "does unsupervised
    * structure recover the labels" audit that decides whether an IVF
    * codebook (or any clustering) is usable for cluster-balanced
    * sampling / SemDeDup on labeled data. Tie on the majority:
    * smallest label wins (total order, oracle-replayable).
    *
    * Scale: one map-combined (cluster, label) aggregation over the
    * assignment; the windows run on that clusters × labels bounded
    * frame. Output: (cluster, n_vecs, majority_label, n_majority,
    * purity round 6). */
  def clusterPurity(assigned: DataFrame, clusterCol: String,
                    labelCol: String): DataFrame = {
    val cl = assigned
      .groupBy(col(clusterCol).as("cluster"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
    val maj = Window.partitionBy(col("cluster"))
      .orderBy(col("n").desc, col("label"))
    cl.withColumn("__rn", row_number().over(maj))
      .withColumn("n_vecs", sum(col("n")).over(Window.partitionBy(col("cluster"))))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("n_vecs"),
        col("label").as("majority_label"), col("n").as("n_majority"),
        round(col("n").cast("double") / col("n_vecs"), 6).as("purity"))
  }

  /** Label-centroid SEPARATION matrix: the pairwise cosine similarity
    * of per-label centroids — "are the classes separable in embedding
    * space" in labels² numbers, the audit run before trusting
    * label-conditioned sampling or a classifier head on these
    * embeddings.
    *
    * Determinism: cosine is scale-invariant, so it is computed from
    * the EXACT micro-unit SUM vectors (per-dim integer longs — the
    * graft_vec_sum kernel) with NO intermediate rounding anywhere; a
    * first cut that rounded per-dim centroids to 6 dp first tripped
    * over the engines' different double-rounding (decimal-string
    * HALF_UP vs binary half-away) on boundary values at sf0.1. The
    * only floats are the final identical left-to-right dot folds and
    * one sqrt/divide. Self-join runs on the label-sized sum frame.
    * Output: (label_a < label_b, n_a, n_b, cosine round 6). */
  def labelCentroidMatrix(df: DataFrame, labelCol: String,
                          embCol: String, scale: Long = 1000000L): DataFrame = {
    val sums = df.groupBy(col(labelCol).as("label"))
      .agg(call_function("graft_vec_sum", col(embCol), lit(scale)).as("vs"))
      .select(col("label"), col("vs.n").as("n_vecs"),
        transform(col("vs.sums"), _.cast("double")).as("ms"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
    val a = sums.select(col("label").as("label_a"), col("n_vecs").as("n_a"),
      col("ms").as("__ca"))
    val b = sums.select(col("label").as("label_b"), col("n_vecs").as("n_b"),
      col("ms").as("__cb"))
    // both sides are label-sized by construction — hint the broadcast
    // explicitly like every sibling cross shape (AQE would get there,
    // but the plan should not depend on it)
    a.crossJoin(broadcast(b)).filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(dot(col("__ca"), col("__cb")) /
          (sqrt(dot(col("__ca"), col("__ca"))) *
            sqrt(dot(col("__cb"), col("__cb")))), 6).as("cosine"))
  }

  /** Exploded reference form of [[clusterCentroids]] — identical
    * values via posexplode + (cluster, dim) aggregation; the ×dims
    * row blow-up is the cost the native kernel avoids. Equivalence
    * pinned by SimilaritySpec; not used by any registered query. */
  private[ops] def clusterCentroidsExploded(assigned: DataFrame, clusterCol: String,
                                            embCol: String, scale: Long = 1000000L): DataFrame =
    assigned
      .select(col(clusterCol).as("cluster"), posexplode(col(embCol)).as(Seq("dim", "x")))
      .withColumn("m", round(col("x").cast("double") * lit(scale.toDouble), 0).cast("long"))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("m")).as("ms"))
      .select(col("cluster"), col("dim"), col("n_vecs"),
        round(col("ms").cast("double") / lit(scale.toDouble) / col("n_vecs"), 6).as("c"))

  /** Lloyd-iteration CONVERGENCE AUDIT: `rounds` k-means rounds from
    * the k lowest-id seeds, reporting per round the inertia (Σ min-d²,
    * in exact micro-units), the number of vectors that changed cluster
    * vs the previous round, and the number of non-empty clusters. The
    * "is the codebook done?" table: inertia must fall monotonically
    * (Lloyd guarantees it), reassignments must dwindle — a codebook
    * trained until this audit flattens is defensible; one trained for
    * "4 iterations because 4" is folklore. [[trainCodebook]] trains;
    * this MEASURES, with every number oracle-replayable.
    *
    * Determinism discipline (the difference from [[trainCodebook]],
    * whose float-sum means are partition-order-sensitive): the M-step
    * is [[clusterCentroids]] — exact micro-unit integer sums, round 6
    * — cast to float (IEEE round-to-nearest, identical in any engine);
    * inertia is summed as per-row `round(d² × 1e6)` LONGS (order-free);
    * empty clusters keep their previous centroid. Per round: one
    * assignment projection (per-row argmin kernel, no corpus×codebook
    * join), one broadcast join for d², one map-combined centroid
    * aggregation, one id-keyed join for the reassignment count — only
    * scalar aggregates and codebook-sized frames reach the driver. */
  def kmeansAudit(df: DataFrame, k: Int, rounds: Int,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  scale: Long = 1000000L): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    val session = df.sparkSession
    import session.implicits._
    // the codebook lives on the DRIVER between rounds (k rows — the
    // codebook-sized-collect doctrine; ivfAssign collects it into
    // literal arrays anyway), so no per-round checkpoint job exists
    // for it. Per round exactly THREE jobs: materialize assignments,
    // one FUSED audit aggregation (inertia + live clusters +
    // reassignments vs the previous round in a single pass), and the
    // k-row centroid collect (skipped on the last round). The first
    // cut ran ~16 jobs and was scheduling-overhead-bound on small
    // inputs.
    // cache the input across rounds — Lloyd re-reads the corpus every
    // round by construction, so caching the dataset is the standard
    // k-means discipline at any scale (spill-backed blocks, never
    // driver memory); lazy, so the seed TakeOrdered doubles as the
    // materializing action
    val src = df.select(col(idCol), col(embCol)).localCheckpoint(false)
    var codebook: Seq[(Long, Seq[Float])] = src.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long"), col(embCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    var prevAssign: DataFrame = null
    val audit = collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val cbDf = codebook.toDF("cid", embCol)
      // LAZY checkpoint: the assignment pass materializes inside the
      // fused audit aggregation (no dedicated job) and its blocks then
      // serve the reassignment join and the centroid update — one
      // corpus pass per round either way, one fewer scheduled job
      val assigned = ivfAssign(src, cbDf, idCol, embCol)
        .select(col(idCol), col(embCol), col("cluster"))
        .localCheckpoint(false)
      val cb = broadcast(cbDf.select(col("cid").as("cluster"),
        col(embCol).as("__c")))
      val d2 = dotUdf(col(embCol), col(embCol)) -
        lit(2.0) * dotUdf(col(embCol), col("__c")) +
        dotUdf(col("__c"), col("__c"))
      val withPrev =
        if (prevAssign == null) assigned.withColumn("__pc", lit(null).cast("long"))
        else assigned.join(
          prevAssign.select(col(idCol), col("cluster").as("__pc")), Seq(idCol))
      // ONE job per round: a per-cluster aggregation carrying the
      // inertia and reassignment partials AND the exact micro-unit
      // centroid sums; the k collected rows yield the global audit
      // numbers (integer sums — exactly the global aggregate) and the
      // next codebook on the driver
      val perCluster = withPrev.join(cb, Seq("cluster"))
        .groupBy(col("cluster"))
        .agg(sum(round(d2 * lit(scale.toDouble), 0).cast("long")).as("in"),
          sum(when(col("__pc").isNotNull && col("cluster") =!= col("__pc"), 1L)
            .otherwise(0L)).as("mv"),
          call_function("graft_vec_sum", col(embCol), lit(scale)).as("vs"))
        .collect()
      val moved = if (prevAssign == null) -1L
        else perCluster.map(_.getLong(2)).sum
      audit += ((r.toLong, perCluster.map(_.getLong(1)).sum, moved,
        perCluster.length.toLong))
      prevAssign = assigned
      if (r < rounds) {
        // driver replica of clusterCentroids' arithmetic: exact long
        // sums / scale / n, round 6 (BigDecimal HALF_UP — what Spark's
        // `round` does on doubles), then the IEEE float cast
        val next = perCluster.map { row =>
          val vs = row.getStruct(3)
          val n = vs.getLong(0)
          val cents = vs.getSeq[Long](1).map(s =>
            BigDecimal(s.toDouble / scale.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble.toFloat)
          row.getLong(0) -> cents
        }.toMap
        codebook = codebook.map { case (cid, emb) =>
          (cid, next.getOrElse(cid, emb))
        }
      }
    }
    audit.toSeq.toDF("round", "inertia_micro", "n_reassigned", "n_clusters")
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space coarsely (IVF codebook), find cosine-near
    * duplicates WITHIN each cluster only, close them into components
    * and keep one representative (min id) per group. Returns the
    * surviving corpus rows.
    *
    * Scale shape — three existing primitives composed: per-row
    * assignment (no corpus×codebook join), cluster-scoped ids-only
    * group-and-pair (embeddings re-join by id for exact-cosine
    * verification — vector payloads never ride the pair blow-up), and
    * the checkpointed connected-components closure. `maxClusterSize`
    * (0 = off) skips pair generation for degenerate clusters — pair
    * count is quadratic in cluster size; a capped-out cluster keeps all
    * its members. */
  def semanticDedup(df: DataFrame, centroids: DataFrame, threshold: Double,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    cidCol: String = "cid", maxClusterSize: Int = 0): DataFrame = {
    val keyed = ivfAssign(df, centroids, idCol, embCol, cidCol)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("cluster"))
    // ONE shuffle on the cluster key; cosine verification runs where
    // the group lives (graft_cosine_pairs — norms once per member,
    // survivors only leave the group). The emit-then-join form
    // materialized every candidate pair twice through embedding
    // re-joins; measured 30% on the sf0.1 bench. The group payload is
    // members × dims floats — maxClusterSize is the memory bound.
    val clusters = keyed.groupBy(col("cluster"))
      .agg(sort_array(collect_list(struct(col("id"), col("emb")))).as("members"))
    val capped =
      if (maxClusterSize > 0) clusters.filter(size(col("members")) <= maxClusterSize)
      else clusters
    val pairs = capped
      .select(explode(call_function("graft_cosine_pairs",
        col("members"), lit(threshold))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    Dedup.resolveClusters(df, idCol, pairs).filter(col("keep"))
      .drop("cluster_id", "keep")
  }

  // ---- Product quantization (Jégou et al. 2011) ----------------------
  // The 100 TB vector-storage lever beyond int8: m sub-codebooks of k
  // centroids quantize each vector to m small codes (64-dim float32 →
  // 8 bytes at m=8 — 32×), and search scans CODES against a per-probe
  // lookup table (ADC) without ever touching float vectors.

  /** Per-subspace codebook rows collected into driver arrays:
    * sub → (cids ascending, centroid subvectors). The collect is
    * codebook-sized (m·k rows) by construction — it IS the broadcast,
    * same contract as [[codebookArrays]]. */
  private def pqBooks(codebook: DataFrame, m: Int, subCol: String,
                      cidCol: String, embCol: String): Array[(Array[Long], Array[Array[Float]])] = {
    val rows = codebook.select(col(subCol).cast("int"), col(cidCol).cast("long"), col(embCol))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, "empty PQ codebook")
    Array.tabulate(m) { j =>
      val sub = rows.filter(_._1 == j).sortBy(_._2)
      require(sub.nonEmpty, s"PQ codebook has no centroids for subspace $j")
      (sub.map(_._2), sub.map(_._3))
    }
  }

  /** Deterministic seed codebook for an `m`-subspace product quantizer:
    * sub-codebook j's centroids are the j-th subvector slices of the
    * `k` lowest-id vectors (same seeding convention as
    * [[trainCodebook]]). Output: (sub, cid, `embCol` = the dsub-dim
    * centroid). Refine with [[pqTrainCodebook]] when recall matters
    * more than reproducibility-by-inspection. */
  def pqSeedCodebook(df: DataFrame, m: Int, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dims = df.select(size(col(embCol))).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    // k seed rows collapse to one sorted array; cid = position — no
    // unpartitioned window over the (k-bounded) seed frame
    val seeds = df.orderBy(col(idCol)).limit(k)
      .agg(sort_array(collect_list(struct(
        col(idCol).as("i"), col(embCol).as("e")))).as("__s"))
      .select(posexplode(col("__s")).as(Seq("__cid", "__sv")))
      .select(col("__sv.e").as("__emb"), col("__cid").cast("long").as("cid"))
    seeds.select(col("cid"),
        explode(array((0 until m).map { j =>
          struct(lit(j).as("sub"), slice(col("__emb"), j * dsub + 1, dsub).as("c"))
        }: _*)).as("sc"))
      .select(col("sc.sub").as("sub"), col("cid"), col("sc.c").as(embCol))
  }

  /** Lloyd's-trained product-quantizer codebook: each subspace trains
    * independently via [[trainCodebook]] on its slice projection — m
    * small codebook-sized collect loops on the driver, never a corpus
    * materialization. Output schema matches [[pqSeedCodebook]]. */
  def pqTrainCodebook(df: DataFrame, m: Int, k: Int, iterations: Int = 4,
                      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dims = df.select(size(col(embCol))).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    (0 until m).map { j =>
      trainCodebook(df.select(col(idCol), slice(col(embCol), j * dsub + 1, dsub).as(embCol)),
          k, iterations, idCol, embCol)
        .withColumn("sub", lit(j))
        .select(col("sub"), col("cid"), col(embCol))
    }.reduce(_.unionByName(_))
  }

  /** PQ encoding: vector → `m` codes, code j = argmin over sub-codebook
    * j of squared euclidean distance to the j-th subvector (same
    * `‖v‖²−2v·c+‖c‖²` sequential-double arithmetic as [[ivfAssign]],
    * ties by cid). Pure per-row expressions — the corpus never joins or
    * shuffles to encode. Output: (`idCol`, codes array<int> length m). */
  def pqEncode(df: DataFrame, codebook: DataFrame, m: Int,
               idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val books = pqBooks(codebook, m, "sub", "cid", embCol)
    val dsub = books(0)._2(0).length
    val codes = array((0 until m).map { j =>
      element_at(ivfNearest(slice(col(embCol), j * dsub + 1, dsub), 1,
        books(j)._1, books(j)._2), 1).cast("int")
    }: _*)
    df.select(col(idCol), codes.as("codes"))
  }

  /** PQ search by asymmetric distance computation: each probe
    * precomputes lut[j][c] = probe-subvector-j · centroid-(j,c) ONCE,
    * then every corpus vector scores as a sequential j-ascending sum of
    * m table lookups over its codes — no corpus shuffle, no float
    * vectors in the scan, probe side broadcast. Approximate cosine uses
    * the PQ-reconstructed corpus norm (Σⱼ‖cⱼ‖², also a lookup).
    * `codes` is [[pqEncode]]'s output; at the 100 TB target it is the
    * stored table and floats exist only at codebook build time. */
  def pqSearchADC(probes: DataFrame, codes: DataFrame, codebook: DataFrame,
                  k: Int, m: Int,
                  idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val books = pqBooks(codebook, m, "sub", "cid", embCol)
    val dsub = books(0)._2(0).length
    val bookLit = typedlit[Seq[Seq[Seq[Float]]]](
      books.map(_._2.map(_.toSeq).toSeq).toSeq)
    def seqDot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // ‖cⱼ‖² lookup table — driver-computed with the same sequential
    // double arithmetic as the kernels, codebook-sized literal
    val n2Lit = typedlit[Seq[Seq[Double]]](
      books.map(_._2.map(c => seqDot(c, c)).toSeq).toSeq)
    val probeSide = broadcast(probes
      .select(col(idCol).as("probe_id"), col(embCol).as("__p_emb"))
      .withColumn("p_norm", sqrt(dotUdf(col("__p_emb"), col("__p_emb"))))
      .withColumn("lut", transform(bookLit, (subBook, j) =>
        transform(subBook, cv =>
          dotUdf(slice(col("__p_emb"), j * dsub + lit(1), lit(dsub)), cv))))
      .drop("__p_emb"))
    val corpus = codes.select(col(idCol).as("neighbor_id"), col("codes"),
      aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
        acc + element_at(element_at(n2Lit, j + 1),
          element_at(col("codes"), j + 1) + 1)).as("n2"))
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
      acc + element_at(element_at(col("lut"), j + 1),
        element_at(col("codes"), j + 1) + 1))
    val scored = corpus.join(probeSide, col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc_cosine",
        when(col("p_norm") === 0.0 || col("n2") === 0.0, lit(0.0))
          .otherwise(round(adc / (col("p_norm") * sqrt(col("n2"))), 6)))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("adc_cosine"), col("rank"))
  }

  /** Float residuals against each vector's nearest coarse centroid —
    * the IVF-PQ preprocessing step. `embCol` is REPLACED by the
    * residual (float subtraction, bit-reproducible in any engine whose
    * FLOAT arithmetic is IEEE — DuckDB's is); `cluster` records the
    * coarse assignment. */
  def coarseResiduals(df: DataFrame, coarse: DataFrame,
                      idCol: String = "vec_id", embCol: String = "embedding",
                      cidCol: String = "cid"): DataFrame = {
    val (cids, cembs) = codebookArrays(coarse, cidCol, embCol)
    val centMap = map(cids.zip(cembs).flatMap { case (cid, c) =>
      Seq(lit(cid), typedlit[Seq[Float]](c.toSeq))
    }: _*)
    df.withColumn("cluster", element_at(ivfNearest(col(embCol), 1, cids, cembs), 1))
      .withColumn(embCol,
        zip_with(col(embCol), element_at(centMap, col("cluster")), (a, b) => a - b))
  }

  /** IVF-PQ encoding (FAISS IndexIVFPQ layout): coarse-assign, subtract
    * the centroid, PQ-encode the RESIDUAL — residual magnitudes are a
    * fraction of vector magnitudes, so the same code budget quantizes
    * much finer than raw-vector PQ. All per-row expressions; the corpus
    * never joins or shuffles to encode. Output: (id, cluster, codes). */
  def ivfPqEncode(df: DataFrame, coarse: DataFrame, pqBook: DataFrame, m: Int,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  cidCol: String = "cid"): DataFrame = {
    val books = pqBooks(pqBook, m, "sub", "cid", embCol)
    val dsub = books(0)._2(0).length
    val res = coarseResiduals(df, coarse, idCol, embCol, cidCol)
    val codes = array((0 until m).map { j =>
      element_at(ivfNearest(slice(col(embCol), j * dsub + 1, dsub), 1,
        books(j)._1, books(j)._2), 1).cast("int")
    }: _*)
    res.select(col(idCol), col("cluster"), codes.as("codes"))
  }

  /** IVF-PQ search: each probe visits its `nProbe` nearest inverted
    * lists; within a list, the probe's residual builds a per-subspace
    * L2² lookup table (`lut[j][c] = ‖pres_j − cent_{j,c}‖²`, float
    * difference → sequential double dot) and every member scores as the
    * j-ascending sum of `m` lookups over its stored codes — approximate
    * squared distance, ranked ascending. The scan touches codes only;
    * floats exist in the (broadcast) probe side and the codebook
    * literals. */
  def ivfPqSearch(probes: DataFrame, encoded: DataFrame, coarse: DataFrame,
                  pqBook: DataFrame, k: Int, nProbe: Int = 2, m: Int = 8,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  cidCol: String = "cid"): DataFrame = {
    val (cids, cembs) = codebookArrays(coarse, cidCol, embCol)
    val centMap = map(cids.zip(cembs).flatMap { case (cid, c) =>
      Seq(lit(cid), typedlit[Seq[Float]](c.toSeq))
    }: _*)
    val books = pqBooks(pqBook, m, "sub", "cid", embCol)
    val dsub = books(0)._2(0).length
    val bookLit = typedlit[Seq[Seq[Seq[Float]]]](
      books.map(_._2.map(_.toSeq).toSeq).toSeq)
    val probeSide = broadcast(probes
      .select(col(idCol).as("probe_id"), col(embCol).as("__p_emb"),
        explode(ivfNearest(col(embCol), nProbe, cids, cembs)).as("cluster"))
      .withColumn("__pres",
        zip_with(col("__p_emb"), element_at(centMap, col("cluster")), (a, b) => a - b))
      .withColumn("lut", transform(bookLit, (subBook, j) =>
        transform(subBook, cv => {
          val diff = zip_with(
            slice(col("__pres"), j * dsub + lit(1), lit(dsub)), cv, (a, b) => a - b)
          dotUdf(diff, diff)
        })))
      .select(col("probe_id"), col("cluster"), col("lut")))
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
      acc + element_at(element_at(col("lut"), j + 1),
        element_at(col("codes"), j + 1) + 1))
    val scored = encoded.join(probeSide, Seq("cluster"))
      .filter(col("probe_id") =!= col(idCol))
      .withColumn("adc_dist", round(adc, 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"),
        col("adc_dist"), col("rank"))
  }

  /** Exact all-pairs near-dup: corpus broadcast as primitive arrays, a
    * tight per-partition loop emits ONLY surviving pairs — a join would
    * materialize all n²/2 rows to keep 10s of survivors. Exact mode is
    * for probe-scale corpora (the broadcast holds the vectors, same as
    * a broadcast join would); at data scale use SRP buckets. Arithmetic
    * matches the oracle exactly: sequential double dot, dot/(na*nb),
    * round 6. */
  private def exactNearDuplicates(df: DataFrame, threshold: Double,
                                  idCol: String, embCol: String,
                                  rowLimit: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
    // the broadcast-then-loop shape is O(n²) work and O(n·dims) driver +
    // executor memory — probe the size BEFORE collecting the corpus so
    // an oversized frame fails fast instead of OOMing the driver
    val probe = rows.limit(rowLimit + 1).collect()
    require(probe.length <= rowLimit,
      s"nearDuplicates exact mode (planes <= 0) broadcasts the whole corpus " +
        s"to every task and compares all pairs; input exceeds exactRowLimit=$rowLimit " +
        s"rows. Use SRP buckets (planes >= 1) at data scale, or raise exactRowLimit " +
        s"explicitly if the corpus genuinely fits on the driver.")
    val corpus = spark.sparkContext.broadcast(probe.sortBy(_._1))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    rows.mapPartitions { it =>
      val all = corpus.value
      val norms = all.map { case (_, v) => math.sqrt(dot(v, v)) }
      it.flatMap { case (idA, embA) =>
        val normA = math.sqrt(dot(embA, embA))
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < all.length) {
          val (idB, embB) = all(j)
          if (idA < idB) {
            val cos = dot(embA, embB) / (normA * norms(j))
            if (cos >= threshold)
              out += ((idA, idB, BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("id_a", "id_b", "cosine")
  }
}
