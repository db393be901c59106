package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The PUBLISHED perceptual-hash index as a (blk, key)-BUCKETED table —
  * the q117 ingestion-gate artifact for MEDIA dedup
  * ([[graft.ops.Dedup.hashBlockRows]] rows: id, sim, blk, key [, ts]):
  * tomorrow's image/audio batch screens against yesterday's corpus
  * with one hash pass + one co-located join
  * ([[graft.ops.Dedup.hammingDedupAgainstIndex]]) — history is never
  * re-decoded, and the 8-byte hashes riding the block rows make the
  * screen's verification exact in-join (no second lookup; contrast the
  * split MinHash layout, whose k-hash signatures are too wide to
  * ride).
  *
  * Storage contract mirrors every store here: bucketed by (blk, key)
  * so the screen's probe join consumes the on-disk layout
  * Exchange-free; `publish` APPENDS batch-sized block rows (optionally
  * event-time-stamped); `compact()` rewrites distinct; `expireBefore`
  * is the retention valve ([[BandIndexStore.expireBefore]] semantics —
  * unstamped rows exempt). The streaming twin is
  * [[graft.streaming.Streaming.HashBlockStore]], whose table this
  * class can read directly (same schema, same bucketing). */
class HashIndexStore(spark: SparkSession,
                     val table: String = "graft_hash_index",
                     buckets: Int = 32,
                     maxDistance: Int = 3,
                     contentTag: Option[String] = None) {
  import org.apache.spark.sql.functions._

  def exists: Boolean = spark.catalog.tableExists(table)

  /** Cross-FAMILY screens fail open exactly like cross-construction
    * ones (a dhash batch probed against an audio-fingerprint index
    * matches nothing and every dup passes as novel), and the hash
    * family is the CALLER's knowledge — so the tag is caller-supplied,
    * the [[FrameSetIndexStore]] contract: Some(tag) refuses mismatched
    * publishes/screens loudly and stamps fresh tables; None keeps the
    * untagged legacy behavior. The block layout itself (4 × 16-bit)
    * is construction-constant, and `maxDistance` is screen-time
    * strictness, not table identity. */
  private def checkTag(who: String): Unit =
    contentTag.foreach(t =>
      Bucketed.requireTag(spark, table, FrameSetIndexStore.TagKey, t, who))

  private def stampTagIfFresh(): Unit =
    contentTag.foreach { t =>
      if (exists && Bucketed.getTag(spark, table, FrameSetIndexStore.TagKey).isEmpty)
        Bucketed.setTag(spark, table, FrameSetIndexStore.TagKey, t)
    }

  /** ONE-TIME migration for a store published before tags: see
    * [[FrameSetIndexStore.adoptTag]]. */
  def adoptTag(): Unit = {
    val t = contentTag.getOrElse(throw new IllegalStateException(
      s"adoptTag on '$table': this handle has no contentTag to adopt"))
    require(exists, s"adoptTag on '$table': no table published yet")
    Bucketed.setTag(spark, table, FrameSetIndexStore.TagKey, t)
  }

  /** Current block rows; empty before the first publish (day one
    * screens clean). */
  def load(): DataFrame =
    if (exists) spark.table(table) else HashIndexStore.emptyIndex(spark)

  /** Append pre-derived block rows (schema of
    * [[graft.ops.Dedup.hashBlockRows]], optional ts — alignment with
    * the table's schema is [[Bucketed.appendAligned]]'s contract). */
  def append(blockRows: DataFrame): Unit = {
    checkTag(s"append to '$table'")
    Bucketed.appendAligned(spark, blockRows, table,
      Seq("blk", "key"), buckets, sortCols = Seq("blk", "key"))
    stampTagIfFresh()
  }

  /** Index a (id, hash [, ts]) frame — the "admit the batch" half of
    * the gate. With `tsCol` set, rows are stamped with epoch millis
    * for [[expireBefore]]. */
  def publish(hashes: DataFrame, idCol: String, hashCol: String,
              tsCol: Option[String] = None): Unit = {
    val rows = graft.ops.Dedup.hashBlockRows(
      hashes.filter(col(hashCol).isNotNull), idCol, hashCol)
    append(tsCol match {
      case Some(t) => rows.join(
        hashes.select(col(idCol).cast("long").as("id"),
          BandIndexStore.epochMillis(hashes, t).as("ts")).distinct(), Seq("id"))
      case None => rows
    })
  }

  /** Screen a new (id, hash) batch against the published index —
    * verdict frame of [[graft.ops.Dedup.hammingDedupAgainstIndex]];
    * the index side of the (blk, key) join consumes the bucketing. */
  def screen(newHashes: DataFrame, idCol: String, hashCol: String): DataFrame = {
    checkTag(s"screen against '$table'")
    graft.ops.Dedup.hammingDedupAgainstIndex(newHashes, load(),
      idCol, hashCol, maxDistance)
  }

  /** The full gate round: screen the batch against history, then admit
    * it. Verdicts are materialized BEFORE the admit (and the screen
    * drops old == new candidates), so a crash-replay re-emits original
    * verdicts — the [[SplitBandIndexStore.ingest]] contract. */
  def ingest(newHashes: DataFrame, idCol: String, hashCol: String,
             tsCol: Option[String] = None): DataFrame = {
    val verdicts = screen(newHashes, idCol, hashCol).localCheckpoint(true)
    publish(newHashes, idCol, hashCol, tsCol)
    verdicts
  }

  /** Rewrite the append log distinct, restoring one sorted file per
    * bucket. */
  def compact(): Unit = {
    Bucketed.compactRewrite(spark, table, Seq("blk", "key"), buckets,
      sortCols = Seq("blk", "key"))
    ()
  }

  /** RETENTION: drop rows whose event time fell before `cutoffMillis`
    * (null-ts rows exempt); returns rows dropped. */
  def expireBefore(cutoffMillis: Long): Long =
    Bucketed.compactRewrite(spark, table, Seq("blk", "key"), buckets,
      sortCols = Seq("blk", "key"), horizonMillis = cutoffMillis)
}

object HashIndexStore {
  /** Empty block-row frame matching [[graft.ops.Dedup.hashBlockRows]]
    * plus the nullable retention stamp. */
  def emptyIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("id", LongType),
        StructField("sim", LongType), StructField("blk", IntegerType),
        StructField("key", LongType), StructField("ts", LongType))))
  }
}
