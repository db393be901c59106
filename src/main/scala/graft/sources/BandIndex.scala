package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The PUBLISHED batch MinHash index as a (band, bucket)-BUCKETED
  * table — the storage layout for the q117 incremental-dedup artifact
  * ([[graft.ops.Dedup.minhashBandIndex]] rows: doc_id, sig, band,
  * bucket).
  *
  * Why bucketed: screening a new batch
  * ([[graft.ops.Dedup.dedupAgainstIndex]]) joins batch band rows
  * against the index on exactly (band, bucket). With the index in a
  * plain file, every screen re-shuffles the ENTIRE signature-carrying
  * index (bands × corpus rows, each dragging a k-hash signature) —
  * the measured bottleneck of the r8 IndexProbe (54 s for a 200k-doc
  * batch against 1.8M indexed docs, dominated by the index-side
  * exchange). Bucketed by (band, bucket), the index side of that join
  * is Exchange-FREE: the shuffle happened once at publish time, and
  * each daily screen shuffles only the BATCH side (batch-sized) into
  * the table's bucket count. This is the batch twin of the streaming
  * [[graft.streaming.Streaming]] BandStore, which proved the layout
  * for the candidate band table.
  *
  * Write model mirrors every store here: `append` adds bucket-tagged
  * files (O(batch) per ingestion round — co-location survives
  * appends), `compact()` rewrites the log distinct when re-ingestion
  * duplicates grow it. Duplicate index rows are harmless in the
  * meantime (dedupAgainstIndex groups per (new, old) pair). */
class BandIndexStore(spark: SparkSession,
                     val table: String = "graft_minhash_index",
                     buckets: Int = 32,
                     k: Int = 16, bands: Int = 4, shingleSize: Int = 3) {

  def exists: Boolean = spark.catalog.tableExists(table)

  /** The construction identity recorded on the table: hash count, band
    * count, and shingle size pin the band-key derivation. A screen
    * under a DIFFERENT construction fails OPEN — batch band keys cut
    * from a k'-hash signature match nothing in a k-hash index, every
    * true near-dup passes as novel, and nothing reports it — so the
    * mismatch refuses loudly instead (the [[FrameSetIndexStore]] /
    * [[SrpIndexStore]] contract). A verified legacy table adopts its
    * tag once via [[Bucketed.setTag]] (the requireTag message carries
    * the exact call). */
  def contentTag: String = s"minhash:k$k:b$bands:s$shingleSize"

  private def checkTag(who: String): Unit =
    Bucketed.requireTag(spark, table, FrameSetIndexStore.TagKey,
      contentTag, who)

  private def stampTagIfFresh(): Unit =
    if (exists && Bucketed.getTag(spark, table, FrameSetIndexStore.TagKey).isEmpty)
      Bucketed.setTag(spark, table, FrameSetIndexStore.TagKey, contentTag)

  /** Current index rows; the empty [[graft.ops.Dedup.minhashBandIndex]]
    * frame before the first publish. */
  def load(): DataFrame =
    if (exists) spark.table(table) else BandIndexStore.emptyIndex(spark)

  /** Append pre-built index rows (schema of
    * [[graft.ops.Dedup.minhashBandIndex]]). The write repartitions on
    * the bucket columns first — repartition and bucketBy share the
    * same Murmur3 `pmod(hash, n)` assignment, so each task holds
    * exactly one bucket and each append lands ONE file per bucket,
    * sorted by (band, bucket): a fresh/compacted table serves the
    * probe join sort-free (Spark honors sortBy metadata only at one
    * file per bucket). Repeated appends accumulate files per bucket —
    * co-location still holds (no Exchange), the reader just re-sorts —
    * until [[compact]] restores the one-file layout. */
  def append(indexRows: DataFrame): Unit = {
    checkTag(s"append to '$table'")
    // ts alignment (fresh tables expiry-ready, legacy ts-less tables
    // still appendable, stamped-into-legacy refused loudly) is the
    // shared [[Bucketed.appendAligned]] contract
    Bucketed.appendAligned(spark, indexRows, table,
      Seq("band", "bucket"), buckets, sortCols = Seq("band", "bucket"))
    stampTagIfFresh()
  }

  /** Index a document frame and append its band rows — the "admit the
    * batch" half of the ingestion gate. With `tsCol` set, every index
    * row is stamped with its document's event time (epoch millis), the
    * retention hook [[expireBefore]] consumes. */
  def publish(docs: DataFrame, idCol: String, textCol: String,
              tsCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.Dedup.minhashBandIndex(docs, idCol, textCol,
      k, bands, shingleSize)
    append(tsCol match {
      case Some(t) =>
        rows.join(docs.select(col(idCol).as("doc_id"),
          BandIndexStore.epochMillis(docs, t).as("ts")), Seq("doc_id"))
      case None => rows
    })
  }

  /** RETENTION: rewrite the index dropping rows whose event time fell
    * before `cutoffMillis` — the release valve that keeps a year of
    * daily appends from scanning dead docs on every screen forever.
    * Rows published without a timestamp (ts null) are exempt, same as
    * the streaming [[graft.streaming.Streaming]] BandStore horizon.
    * Returns the number of rows dropped. Near-dups against expired
    * history are the accepted miss — that tail belongs to the periodic
    * full-corpus compaction pass (q23/q50), exactly like the streaming
    * retention contract. */
  def expireBefore(cutoffMillis: Long): Long =
    Bucketed.compactRewrite(spark, table, Seq("band", "bucket"), buckets,
      sortCols = Seq("band", "bucket"), horizonMillis = cutoffMillis)

  /** Screen a new batch against the published index — verdict frame of
    * [[graft.ops.Dedup.dedupAgainstIndex]]; the index side of its
    * (band, bucket) join consumes the on-disk bucketing, no Exchange. */
  def screen(newBatch: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.5): DataFrame = {
    checkTag(s"screen against '$table'")
    graft.ops.Dedup.dedupAgainstIndex(newBatch, load(), idCol, textCol,
      k, bands, shingleSize, threshold)
  }

  /** Rewrite the append log distinct, restoring the one-file-per-bucket
    * sorted layout. */
  def compact(): Unit = {
    Bucketed.compactRewrite(spark, table, Seq("band", "bucket"), buckets,
      sortCols = Seq("band", "bucket"))
    ()
  }
}

/** The SPLIT published-index layout
  * ([[graft.ops.Dedup.dedupAgainstIndexSplit]]): band rows WITHOUT
  * signatures in a (band, bucket)-bucketed table, signatures once per
  * doc in a (doc_id)-bucketed table. The screen's probe join scans
  * skinny band rows (no bands×-duplicated signature payload — the
  * decode cost IndexProbe measured dominating the combined layout) and
  * the signature lookup runs only for CANDIDATE pairs; both index
  * sides join Exchange-free off their bucketing. */
class SplitBandIndexStore(spark: SparkSession,
                          val bandsTable: String = "graft_minhash_bands",
                          val sigsTable: String = "graft_minhash_sigs",
                          buckets: Int = 32,
                          k: Int = 16, bands: Int = 4, shingleSize: Int = 3) {
  import org.apache.spark.sql.functions._

  def exists: Boolean =
    spark.catalog.tableExists(bandsTable) && spark.catalog.tableExists(sigsTable)

  /** Construction identity, recorded on the BANDS table (the probe
    * side both halves publish through) — see
    * [[BandIndexStore.contentTag]] for the fail-open hazard a
    * cross-construction screen would be. */
  def contentTag: String = s"minhash:k$k:b$bands:s$shingleSize"

  private def checkTag(who: String): Unit =
    Bucketed.requireTag(spark, bandsTable, FrameSetIndexStore.TagKey,
      contentTag, who)

  private def stampTagIfFresh(): Unit =
    if (spark.catalog.tableExists(bandsTable) &&
        Bucketed.getTag(spark, bandsTable, FrameSetIndexStore.TagKey).isEmpty)
      Bucketed.setTag(spark, bandsTable, FrameSetIndexStore.TagKey, contentTag)

  /** Current band rows; empty before the first publish (day one of the
    * ingestion gate screens clean, same as [[BandIndexStore.load]]). */
  def loadBands(): DataFrame =
    if (spark.catalog.tableExists(bandsTable)) spark.table(bandsTable)
    else BandIndexStore.emptyIndex(spark)
      .select(col("doc_id"), col("band"), col("bucket"))

  /** Current signature rows; empty before the first publish. */
  def loadSigs(): DataFrame =
    if (spark.catalog.tableExists(sigsTable)) spark.table(sigsTable)
    else BandIndexStore.emptyIndex(spark).select(col("doc_id"), col("sig"))

  /** Index a document frame and append its band + signature rows. With
    * `tsCol` set, each doc's SIGNATURE row is stamped with its event
    * time (epoch millis) — the skinny band rows stay unstamped; expiry
    * reaches them through the bands⊆sigs invariant ([[expireBefore]]). */
  def publish(docs: DataFrame, idCol: String, textCol: String,
              tsCol: Option[String] = None): Unit = {
    val sigs = graft.ops.Dedup
      .minhashSignatures(docs, idCol, textCol, k, shingleSize)
      .select(col("id").as("doc_id"), col("sig"))
    publishSigs((tsCol match {
      case Some(t) => sigs.join(docs.select(col(idCol).as("doc_id"),
        BandIndexStore.epochMillis(docs, t).as("ts")), Seq("doc_id"))
      case None => sigs
    }).localCheckpoint(true))
  }

  /** Append PRECOMPUTED (doc_id, sig) rows — one signature pass feeds
    * both tables (the caller must have materialized the frame; the
    * two writes must not recompute a corpus minhash).
    *
    * Torn-publish ordering: the two appends are not atomic, so the
    * SIGS table is written FIRST. A signature without band rows is
    * INERT (nothing probes it — the screen reaches sigs only through
    * band-row candidates), while a band row without its signature
    * would silently DROP real near-dup candidates at the sig join
    * (clean verdicts for true duplicates — a recall loss nothing
    * reports). A crash between the writes therefore leaves dead
    * weight, never lost matches; re-publishing the batch repairs it
    * (duplicate rows collapse in the screen's pair groupBy and at
    * [[compact]]), and [[compact]] additionally verifies the
    * bands⊆sigs invariant. */
  def publishSigs(sigs: DataFrame): Unit = {
    checkTag(s"publish to '$bandsTable'")
    // sigs carry the (aligned) retention stamp — unstamped rows ts =
    // null, legacy ts-less tables handled by appendAligned; the bands
    // table never carries ts — expiry reaches it through the
    // bands⊆sigs semi-join
    Bucketed.appendAligned(spark, sigs, sigsTable,
      Seq("doc_id"), buckets, sortCols = Seq("doc_id"))
    Bucketed.writeKeys(
      graft.ops.Dedup.bandRowsFromSigs(
          sigs.select(col("doc_id"), col("sig")), bands, k / bands)
        .repartition(buckets, col("band"), col("bucket")),
      bandsTable, Seq("band", "bucket"), buckets,
      sortCols = Seq("band", "bucket"), mode = "append")
    stampTagIfFresh()
  }

  /** RETENTION, split layout: drop signatures whose event time fell
    * before `cutoffMillis` (null-ts rows exempt), then drop the band
    * rows orphaned by the expiry through the same bands⊆sigs semi-join
    * [[compact]] uses for torn-publish repair — one mechanism, two
    * callers. Returns the number of signature rows dropped. */
  def expireBefore(cutoffMillis: Long): Long = {
    if (!exists) return 0L
    val dropped = Bucketed.compactRewrite(spark, sigsTable, Seq("doc_id"),
      buckets, sortCols = Seq("doc_id"), horizonMillis = cutoffMillis)
    if (dropped > 0) {
      // direct writeKeys OVERWRITE drops table properties — preserve
      // the construction tag across the rewrite (the compactRewrite
      // discipline; losing it would turn the next screen into the
      // untagged-legacy refusal)
      val tags = Bucketed.graftTags(spark, bandsTable)
      val bandsKept = spark.table(bandsTable)
        .join(spark.table(sigsTable).select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
        .distinct().localCheckpoint(true)
      Bucketed.writeKeys(bandsKept.repartition(buckets, col("band"), col("bucket")),
        bandsTable, Seq("band", "bucket"), buckets,
        sortCols = Seq("band", "bucket"))
      tags.foreach { case (k, v) => Bucketed.setTag(spark, bandsTable, k, v) }
    }
    dropped
  }

  /** Screen a new batch against the split index — verdicts identical
    * to [[BandIndexStore.screen]] / the in-memory operator. Before the
    * first publish every doc screens clean. */
  def screen(newBatch: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.5): DataFrame = {
    checkTag(s"screen against '$bandsTable'")
    graft.ops.Dedup.dedupAgainstIndexSplit(newBatch,
      loadBands(), loadSigs(),
      idCol, textCol, k, bands, shingleSize, threshold)
  }

  /** The full ingestion-gate round in ONE signature pass: screen the
    * batch against history, then admit it (publish its sigs + bands).
    * Returns the verdict frame (already materialized — the publish
    * checkpoints the shared signature pass). With `tsCol` set, the
    * admitted signatures carry their documents' event time — without
    * it, gate-admitted docs are ts-null and PERMANENTLY exempt from
    * [[expireBefore]] (the retention valve the class doc promises
    * would silently never apply to gate users). */
  def ingest(newBatch: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.5,
             tsCol: Option[String] = None): DataFrame = {
    checkTag(s"screen against '$bandsTable'")
    val sigs0 = graft.ops.Dedup
      .minhashSignatures(newBatch, idCol, textCol, k, shingleSize)
      .select(col("id").as("doc_id"), col("sig"))
    val sigs = (tsCol match {
      case Some(t) => sigs0.join(newBatch.select(col(idCol).as("doc_id"),
        BandIndexStore.epochMillis(newBatch, t).as("ts")), Seq("doc_id"))
      case None => sigs0
    }).localCheckpoint(true)
    val verdicts = graft.ops.Dedup.dedupAgainstIndexSplitFromSigs(
        newBatch.select(col(idCol).as("new_id")),
        sigs.select(col("doc_id"), col("sig")),
        loadBands(), loadSigs(), k, bands, threshold)
      .localCheckpoint(true) // screened strictly BEFORE its own admit
    publishSigs(sigs)
    verdicts
  }

  /** Rewrite both append logs distinct, restoring one sorted file per
    * bucket — and verify/repair the bands⊆sigs invariant: band rows
    * whose doc_id has no signature (a torn publish under the OLD
    * bands-first write order, or a partial external write) would
    * silently lose candidates at the sig join, so they are detected
    * here, logged, and dropped. Returns the number of orphan band rows
    * removed (0 on a healthy store). */
  def compact(): Long = if (exists) {
    // direct writeKeys OVERWRITE drops table properties — preserve the
    // construction tag (the compactRewrite discipline)
    val tags = Bucketed.graftTags(spark, bandsTable)
    val sigDocs = spark.table(sigsTable).select(col("doc_id")).distinct()
    val bandsAll = spark.table(bandsTable).distinct().localCheckpoint(true)
    val b = bandsAll.join(sigDocs, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val orphans = bandsAll.count() - b.count()
    if (orphans > 0)
      System.err.println(s"[SplitBandIndexStore] compact: dropped $orphans " +
        s"band rows with no signature in $sigsTable (torn publish) — " +
        "re-publish the affected batch to restore their coverage")
    Bucketed.writeKeys(b.repartition(buckets, col("band"), col("bucket")),
      bandsTable, Seq("band", "bucket"), buckets, sortCols = Seq("band", "bucket"))
    tags.foreach { case (k, v) => Bucketed.setTag(spark, bandsTable, k, v) }
    val s = spark.table(sigsTable).distinct().localCheckpoint(true)
    Bucketed.writeKeys(s.repartition(buckets, col("doc_id")),
      sigsTable, Seq("doc_id"), buckets, sortCols = Seq("doc_id"))
    orphans
  } else 0L
}

object BandIndexStore {
  /** Event-time column as epoch millis: timestamps through
    * `unix_millis`, numeric columns by cast (callers already carrying
    * millis), dates through a midnight-UTC timestamp. */
  def epochMillis(df: DataFrame, tsCol: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    import org.apache.spark.sql.types.{TimestampType, DateType}
    df.schema(tsCol).dataType match {
      case TimestampType => unix_millis(col(tsCol))
      case DateType => unix_millis(col(tsCol).cast(TimestampType))
      case _ => col(tsCol).cast("long")
    }
  }

  /** Empty index frame matching [[graft.ops.Dedup.minhashBandIndex]]
    * (long ids — the engine-wide document id convention). */
  def emptyIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("sig", ArrayType(StringType)),
        StructField("band", IntegerType), StructField("bucket", StringType))))
  }
}
