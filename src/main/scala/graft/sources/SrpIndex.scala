package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The PUBLISHED embedding index as SPLIT bucketed tables — the
  * SEMANTIC member of the ingestion-gate family (text MinHash:
  * [[SplitBandIndexStore]], 64-bit perceptual: [[HashIndexStore]],
  * frame/window sets: [[FrameSetIndexStore]]): tomorrow's batch of
  * embeddings screens against yesterday's corpus for NEAR-DUPLICATE
  * MEANING — paraphrases, re-encodes and translations that no lexical
  * or perceptual hash sees — with one bucket pass over the batch plus
  * co-located joins. History is never re-embedded or re-scanned.
  *
  * Layout (the [[SplitBandIndexStore]] doctrine — skinny probe rows,
  * payloads joined by id exactly once):
  *  - `bucketsTable` (vec_id, t, bucket), bucketed by (t, bucket):
  *    `tables` independent SRP plane families of `planes` sign bits
  *    ([[graft.ops.Similarity.srpBucket]] — md5-portable planes, so
  *    the construction is engine-reproducible); the screen's candidate
  *    join consumes this bucketing Exchange-free. Embeddings never
  *    ride the ×tables explosion.
  *  - `vecsTable` (vec_id, emb [, ts]), bucketed by vec_id: the
  *    verification payloads; candidates re-join them by id for EXACT
  *    cosine — a gate verdict is never "same bucket", always a real
  *    similarity ≥ `threshold`.
  *
  * CONSTRUCTION VERSIONING is built in, not optional: the bucket
  * derivation is pinned by (planes, tables), and screening across
  * constructions fails OPEN (different plane families bucket the same
  * vector differently — re-submitted copies pass as novel). Every
  * publish/screen verifies the store's recorded [[contentTag]]
  * ([[Bucketed.requireTag]] on the buckets table; the vecs table is
  * construction-independent).
  *
  * Torn-publish ordering: vecs are written FIRST. A vector without
  * bucket rows is INERT (nothing probes it — the screen reaches
  * vectors only through bucket candidates), while a bucket row
  * without its vector would silently DROP a real near-dup at the
  * embedding join. [[compact]] verifies/repairs the buckets⊆vecs
  * invariant like the band store does.
  *
  * Scale shape per gate round: one native-SRP projection over the
  * batch (tables × batch skinny rows), ONE co-located join on
  * (t, bucket), candidate-bounded embedding joins, one aggregation to
  * verdicts. Nothing corpus-quadratic; the driver sees nothing.
  *
  * DEFAULT CONSTRUCTION (planes=8, tables=4) is the MEASURED choice,
  * not folklore: the q151 recall audit ([[graft.ops.Similarity
  * .gateRecallAudit]], NOTES_r14 §6 table) puts (8,2) at 0.851 recall
  * against exact all-pairs truth at the gate's own 0.9 threshold — a
  * gate that silently misses ~1 in 7 true near-dups — while (8,4)
  * measures 0.937 at 2× candidate cost and (4,2) needs 13× the
  * candidates for the same recall. r14 shipped (8,2); r15 raised the
  * default to the ≥0.93 row. Existing (8,2) indexes are SAFE from the
  * bump: the recorded contentTag makes a default-construction handle
  * REFUSE them loudly (screen and publish) — reopen with explicit
  * (planes=8, tables=2) to keep screening at the old construction, or
  * re-publish to migrate.
  *
  * The trade the default buys: recall comes from FEW planes x MANY
  * tables, selectivity from many planes (random-pair collision rate
  * 2^-planes per table — the candidate join's growth term as the
  * index fills). (8,4) is sized for gate-scale indexes; past ~1M
  * vectors raise `planes` (and re-run the q151 audit at the new
  * construction — StreamProbe's sustained stage measures the
  * candidate-load trend at the default). The tag machinery makes the
  * re-size an explicit migration, never a silent drift. */
class SrpIndexStore(spark: SparkSession,
                    val bucketsTable: String = "graft_srp_buckets",
                    val vecsTable: String = "graft_srp_vecs",
                    buckets: Int = 32,
                    planes: Int = 8,
                    tables: Int = 4,
                    threshold: Double = 0.9) {
  import org.apache.spark.sql.functions._

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
  require(tables >= 1, s"at least one hash table, got $tables")

  /** The construction identity recorded on the buckets table: plane
    * count and table count pin the bucket derivation (the md5 plane
    * family itself is engine-constant). */
  def contentTag: String = s"srp:p$planes:t$tables"

  def exists: Boolean =
    spark.catalog.tableExists(bucketsTable) && spark.catalog.tableExists(vecsTable)

  private def checkTag(who: String): Unit =
    Bucketed.requireTag(spark, bucketsTable, FrameSetIndexStore.TagKey,
      contentTag, who)

  private def stampTagIfFresh(): Unit =
    if (spark.catalog.tableExists(bucketsTable) &&
        Bucketed.getTag(spark, bucketsTable, FrameSetIndexStore.TagKey).isEmpty)
      Bucketed.setTag(spark, bucketsTable, FrameSetIndexStore.TagKey, contentTag)

  /** Current bucket rows; empty before the first publish. */
  def loadBuckets(): DataFrame =
    if (spark.catalog.tableExists(bucketsTable)) spark.table(bucketsTable)
    else SrpIndexStore.emptyBuckets(spark)

  /** Current vector rows; empty before the first publish. */
  def loadVecs(): DataFrame =
    if (spark.catalog.tableExists(vecsTable)) spark.table(vecsTable)
    else SrpIndexStore.emptyVecs(spark)

  /** The batch's (vec_id, t, bucket) rows — one native SRP projection,
    * `tables` rows per vector, embeddings left behind. */
  private def bucketRows(vecs: DataFrame, idCol: String,
                         embCol: String): DataFrame =
    graft.ops.Similarity.srpBucketRows(vecs, idCol, embCol, planes, tables)

  /** Index a (id, emb [, ts]) batch — the "admit the batch" half of
    * the gate. Vecs write first (see the class doc's torn-publish
    * argument); with `tsCol` set the VECTOR rows carry the retention
    * stamp, the skinny bucket rows stay unstamped (expiry reaches
    * them through the buckets⊆vecs invariant at [[compact]]). */
  def publish(vecs: DataFrame, idCol: String, embCol: String,
              tsCol: Option[String] = None): Unit = {
    checkTag(s"publish to '$bucketsTable'")
    // ONE evaluation of the caller's (possibly expensive) embedding
    // pipeline: the selected frame checkpoints, and both writes plus
    // the bucket derivation read the materialized rows — the
    // SplitBandIndexStore.publishSigs discipline ("the two writes
    // must not recompute"); without it a nondeterministic upstream
    // could store payloads that DISAGREE with their bucket rows,
    // silently breaking the exact-cosine verification.
    val v = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(embCol).as("emb"),
      tsCol.map(t => BandIndexStore.epochMillis(vecs, t))
        .getOrElse(lit(null).cast("long")).as("ts"))
      .localCheckpoint(true)
    Bucketed.appendAligned(spark, v, vecsTable, Seq("vec_id"), buckets,
      sortCols = Seq("vec_id"))
    // the skinny bucket rows NEVER carry ts (the class doc's
    // unstamped contract — appendAligned would stamp a fresh table
    // with a dead 8-byte column riding the x-tables explosion, the
    // exact weight the split layout exists to shed); written like the
    // band store's bands table. Tables published by the r14-era code
    // DO carry a null ts column — align to them so appends stay loud
    // schema matches, not silent failures.
    val skinny = bucketRows(v, "vec_id", "emb")
      .select(col("vec_id"), col("t"), col("bucket"))
    val aligned =
      if (spark.catalog.tableExists(bucketsTable) &&
          spark.table(bucketsTable).columns.contains("ts"))
        skinny.withColumn("ts", lit(null).cast("long"))
      else skinny
    Bucketed.writeKeys(
      aligned.repartition(buckets, col("t"), col("bucket")),
      bucketsTable, Seq("t", "bucket"), buckets,
      sortCols = Seq("t", "bucket"), mode = "append")
    stampTagIfFresh()
  }

  /** Screen a new (id, emb) batch against the published index: SRP
    * candidates from any shared (t, bucket), EXACT cosine verification
    * on the candidate pairs, one verdict row per batch vector —
    * (new_id, n_dup_matches, dup_of = smallest matching old id,
    * best_cosine, is_dup). The index side of the candidate join and
    * the old-embedding join both consume their tables' bucketing. */
  def screen(newVecs: DataFrame, idCol: String, embCol: String): DataFrame = {
    checkTag(s"screen against '$bucketsTable'")
    graft.ops.Similarity.embeddingDedupAgainstIndex(newVecs, loadBuckets(),
      loadVecs().select(col("vec_id"), col("emb")), idCol, embCol,
      planes, tables, threshold)
  }

  /** The full gate round: screen the batch against history, then admit
    * it. Verdicts materialize BEFORE the admit — the family's
    * crash-replay contract. */
  def ingest(newVecs: DataFrame, idCol: String, embCol: String,
             tsCol: Option[String] = None): DataFrame = {
    // one evaluation of the caller's pipeline for the WHOLE round:
    // screen and publish both read the materialized batch
    val batch = newVecs.localCheckpoint(true)
    val verdicts = screen(batch, idCol, embCol).localCheckpoint(true)
    publish(batch, idCol, embCol, tsCol)
    verdicts
  }

  /** Rewrite both append logs distinct and verify/repair the
    * buckets⊆vecs invariant (orphan bucket rows — a torn publish under
    * an external writer — would silently lose candidates at the
    * embedding join: detected, logged, dropped). Returns orphans
    * removed. */
  def compact(): Long = if (exists) {
    val vecIds = spark.table(vecsTable).select(col("vec_id")).distinct()
    val all = spark.table(bucketsTable).distinct().localCheckpoint(true)
    val kept = all.join(vecIds, Seq("vec_id"), "left_semi").localCheckpoint(true)
    val orphans = all.count() - kept.count()
    if (orphans > 0)
      System.err.println(s"[SrpIndexStore] compact: dropped $orphans bucket " +
        s"rows with no vector in $vecsTable (torn publish) — re-publish " +
        "the affected batch to restore their coverage")
    val tags = Bucketed.graftTags(spark, bucketsTable)
    Bucketed.writeKeys(kept.repartition(buckets, col("t"), col("bucket")),
      bucketsTable, Seq("t", "bucket"), buckets, sortCols = Seq("t", "bucket"))
    tags.foreach { case (k, v) => Bucketed.setTag(spark, bucketsTable, k, v) }
    Bucketed.compactRewrite(spark, vecsTable, Seq("vec_id"), buckets,
      sortCols = Seq("vec_id"))
    orphans
  } else 0L

  /** RETENTION: drop vectors whose event time fell before
    * `cutoffMillis` (null-ts rows exempt), then repair the
    * buckets⊆vecs invariant so their bucket rows age out with them.
    * Returns vector rows dropped. */
  def expireBefore(cutoffMillis: Long): Long = {
    val dropped = Bucketed.compactRewrite(spark, vecsTable, Seq("vec_id"),
      buckets, sortCols = Seq("vec_id"), horizonMillis = cutoffMillis)
    if (dropped > 0) compact()
    dropped
  }
}

object SrpIndexStore {

  /** The q151-audited construction table: measured recall of each
    * (planes, tables) against exact all-pairs truth at the gate's 0.9
    * threshold on the graded-planting corpus (NOTES_r14 §6; q151
    * re-measures every round). Ordered by candidate cost. */
  val AuditedConstructions: Seq[(Int, Int, Double)] = Seq(
    (8, 1, 0.788), // cheapest; misses ~1 in 5
    (8, 2, 0.851), // the pre-r15 default
    (8, 4, 0.937), // the shipped default
    (4, 2, 0.933)) // same recall as (8,4) at ~13x the candidates

  /** Recall-targeted construction: the CHEAPEST audited
    * (planes, tables) whose measured recall meets `target` — the
    * constructor-level alternative to hand-picking plane counts.
    * Refuses a target the audited table can't meet rather than
    * silently shipping a weaker gate; re-run the q151 audit (and
    * extend [[AuditedConstructions]]) to certify stronger
    * constructions. */
  def forRecall(spark: SparkSession, target: Double,
                bucketsTable: String = "graft_srp_buckets",
                vecsTable: String = "graft_srp_vecs",
                buckets: Int = 32,
                threshold: Double = 0.9): SrpIndexStore = {
    val pick = AuditedConstructions.find(_._3 >= target).getOrElse(
      throw new IllegalArgumentException(
        s"no audited SRP construction reaches recall $target " +
          s"(best: ${AuditedConstructions.map(_._3).max} — run the " +
          "gateRecallAudit on stronger constructions and extend " +
          "AuditedConstructions)"))
    new SrpIndexStore(spark, bucketsTable, vecsTable, buckets,
      planes = pick._1, tables = pick._2, threshold = threshold)
  }

  def emptyBuckets(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("t", IntegerType), StructField("bucket", LongType))))
  }

  def emptyVecs(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(FloatType)),
        StructField("ts", LongType))))
  }
}
