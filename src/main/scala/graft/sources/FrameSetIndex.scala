package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PUBLISHED frame-hash index as an (fhash)-BUCKETED table — the
  * q135 ingestion-gate artifact for FRAME-SET identities (video
  * per-frame dHashes, windowed audio fingerprints): tomorrow's batch
  * screens against yesterday's corpus with one decode pass over the
  * batch plus one co-located probe join
  * ([[graft.ops.Dedup.frameSetDedupAgainstIndex]]) — history is never
  * re-decoded, and the per-video set size `n` riding every row makes
  * exact set Jaccard computable inside the probe join (no second
  * sizes table).
  *
  * Storage contract: the EXACT table layout of the streaming
  * [[graft.streaming.Streaming.FrameSetStore]] — (id, fhash, n [, ts])
  * bucketed by fhash — so a corpus built by the streaming sink screens
  * batches through this store and vice versa (BucketedSpec pins the
  * parity). `publish` APPENDS batch-sized rows (optionally
  * event-time-stamped); `compact()` rewrites distinct; `expireBefore`
  * is the retention valve — rows of a video share its stamp, so whole
  * videos age out atomically (null-ts rows exempt, the family rule).
  *
  * CONSTRUCTION VERSIONING: pass `contentTag` (e.g.
  * [[graft.ops.AudioHash.windowFramingTag]] for windowed-audio
  * stores) and every publish/screen verifies the store was built
  * under the SAME fingerprint construction
  * ([[Bucketed.requireTag]]) — a gate run against an index hashed
  * under a different framing fails OPEN (re-submitted copies pass as
  * novel), which is precisely the silent miss this refuses loudly.
  * The first publish stamps a fresh table; a verified legacy store
  * adopts its tag once via [[adoptTag]]. `None` keeps the untagged
  * legacy behavior (no checks, no stamps). */
class FrameSetIndexStore(spark: SparkSession,
                         val table: String = "graft_frame_sets",
                         buckets: Int = 32,
                         threshold: Double = 0.8,
                         maxHashFreq: Int = 1000,
                         contentTag: Option[String] = None) {
  import org.apache.spark.sql.functions._

  def exists: Boolean = spark.catalog.tableExists(table)

  /** The table-property key construction tags live under. */
  def tagKey: String = FrameSetIndexStore.TagKey

  private def checkTag(who: String): Unit =
    contentTag.foreach(t =>
      Bucketed.requireTag(spark, table, tagKey, t, who))

  private def stampTagIfFresh(): Unit =
    contentTag.foreach { t =>
      if (exists && Bucketed.getTag(spark, table, tagKey).isEmpty)
        Bucketed.setTag(spark, table, tagKey, t)
    }

  /** ONE-TIME migration for a store published before construction
    * tags existed: after verifying (out of band) that its rows were
    * produced under this handle's `contentTag`, record that fact so
    * gates stop refusing. Throws when the handle carries no tag. */
  def adoptTag(): Unit = {
    val t = contentTag.getOrElse(throw new IllegalStateException(
      s"adoptTag on '$table': this handle has no contentTag to adopt"))
    require(exists, s"adoptTag on '$table': no table published yet")
    Bucketed.setTag(spark, table, tagKey, t)
  }

  /** Current frame rows; empty before the first publish (day one
    * screens clean). */
  def load(): DataFrame =
    if (exists) spark.table(table)
    else graft.streaming.Streaming.emptyFrameSetTable(spark)

  /** Distinct (id, fhash, n [, ts]) rows of a frame-hash batch — the
    * store row shape, sizes via a window (a self-join would run the
    * upstream decode twice, the streaming sink's lesson). */
  private def frameRows(frames: DataFrame, idCol: String, hashCol: String,
                        tsCol: Option[String]): DataFrame = {
    val rows0 = frames.select(col(idCol).cast("long").as("id"),
        col(hashCol).cast("long").as("fhash"),
        tsCol.map(t => BandIndexStore.epochMillis(frames, t))
          .getOrElse(lit(null).cast("long")).as("ts"))
      .filter(col("fhash").isNotNull)
      .groupBy(col("id"), col("fhash"))
      .agg(max(col("ts")).as("ts"))
    val sized = rows0.withColumn("n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))))
    if (tsCol.isDefined)
      sized.select(col("id"), col("fhash"), col("n"), col("ts"))
    else sized.select(col("id"), col("fhash"), col("n"))
  }

  /** Index a (id, fhash [, ts]) batch — the "admit the batch" half of
    * the gate. */
  def publish(frames: DataFrame, idCol: String, hashCol: String,
              tsCol: Option[String] = None): Unit = {
    checkTag(s"publish to '$table'")
    Bucketed.appendAligned(spark, frameRows(frames, idCol, hashCol, tsCol),
      table, Seq("fhash"), buckets, sortCols = Seq("fhash"))
    stampTagIfFresh()
  }

  /** Screen a new (id, fhash) batch against the published index —
    * verdict frame of [[graft.ops.Dedup.frameSetDedupAgainstIndex]];
    * the index side of the probe consumes the bucketing. */
  def screen(newFrames: DataFrame, idCol: String, hashCol: String): DataFrame = {
    checkTag(s"screen against '$table'")
    graft.ops.Dedup.frameSetDedupAgainstIndex(newFrames, load(),
      idCol, hashCol, threshold, maxHashFreq)
  }

  /** The full gate round: screen the batch against history, then
    * admit it. Verdicts materialize BEFORE the admit (and the screen
    * drops old == new candidates), so a crash-replay re-emits the
    * original verdicts — the [[HashIndexStore.ingest]] contract. */
  def ingest(newFrames: DataFrame, idCol: String, hashCol: String,
             tsCol: Option[String] = None): DataFrame = {
    val verdicts = screen(newFrames, idCol, hashCol).localCheckpoint(true)
    publish(newFrames, idCol, hashCol, tsCol)
    verdicts
  }

  /** Rewrite the append log distinct, restoring one sorted file per
    * bucket. */
  def compact(): Unit = {
    Bucketed.compactRewrite(spark, table, Seq("fhash"), buckets,
      sortCols = Seq("fhash"))
    ()
  }

  /** RETENTION: drop rows whose event time fell before `cutoffMillis`
    * (null-ts rows exempt); returns rows dropped. */
  def expireBefore(cutoffMillis: Long): Long =
    Bucketed.compactRewrite(spark, table, Seq("fhash"), buckets,
      sortCols = Seq("fhash"), horizonMillis = cutoffMillis)
}

object FrameSetIndexStore {
  /** Table-property key recording which fingerprint construction
    * produced a frame-set store's rows (shared with the streaming
    * [[graft.streaming.Streaming.FrameSetStore]] so batch and
    * streaming handles verify the SAME stamp). */
  val TagKey = "graft.content_tag"
}
