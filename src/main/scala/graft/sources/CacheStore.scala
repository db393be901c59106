package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The durable-resource-cache contract both storage layouts satisfy —
  * what the growth pipeline programs against
  * ([[graft.pipeline.Growth.growWith]] /
  * [[graft.pipeline.DatasetRunner]]): read the current cache, fetch a
  * request frame through it (exactly-once semantics are the STORE's
  * job — implementations checkpoint the fetch before appending),
  * append the round's new rows, compact the log. */
trait ResourceCache {
  /** Current cache contents, newest row per (uri, data_hash). */
  def read(): DataFrame
  /** Append newly fetched rows (from_cache=false) from a fetch round. */
  def append(resources: DataFrame): Unit
  /** Fetch through this store: read → fetchWithCache → checkpoint →
    * append misses. The returned frame is already materialized — a
    * caller action never re-runs the live fetch. */
  def fetch(requests: DataFrame, fetcher: Fetcher,
            cacheOnly: Boolean = false, maxConcurrency: Int = 32,
            auth: AuthConfig = AuthConfig.none): DataFrame
  /** Rewrite the append log into one row per key. */
  def compact(): Unit
  /** Retention/takedown by key namespace: drop every row whose `uri`
    * starts with `uriPrefix`, rewriting the log like [[compact]] (one
    * row per surviving key). The scoring path's per-signature purge
    * ([[graft.ops.ModelScoring.purgeScores]]) rides this — a retrained
    * model's predecessor rows (`scorer://old-sig/...`) are dead weight
    * forever without it — and any URL-prefixed fetch namespace can be
    * evicted the same way. */
  def purgePrefix(uriPrefix: String): Unit
}

object ResourceCache {
  /** Layout selection for the pipeline wiring: a configured TABLE name
    * picks the bucketed store (the at-scale default — the cache side
    * of every fetch round joins Exchange-free and is never broadcast);
    * a path alone picks the plain parquet log (small caches, ad-hoc
    * dirs); neither → None (the caller runs cache-less, e.g. pure
    * replay tests). */
  def configured(spark: SparkSession, path: Option[String] = None,
                 table: Option[String] = None,
                 buckets: Int = 32): Option[ResourceCache] =
    table.map(t => new BucketedCacheStore(spark, t, buckets): ResourceCache)
      .orElse(path.map(p => new CacheStore(p, spark): ResourceCache))
}

/** Durable resource cache: the reference's Resource table persisted as
  * Parquet, shared across runs — response memoization is the engine's
  * core optimization AND its test-isolation mechanism (SURVEY §4;
  * reference generic.py:117, storage/file_system.py:52-83).
  *
  * Write model: fetch rounds APPEND their new rows (cheap, no
  * read-modify-write); reads dedupe to the latest row per
  * `(uri, data_hash)`; `compact()` rewrites the log into one row per
  * key when the append log grows. Append + latest-wins means concurrent
  * writers never corrupt the cache — at worst a key is fetched twice.
  */
class CacheStore(val path: String, spark: SparkSession) extends ResourceCache {

  private def exists: Boolean = Files.exists(Paths.get(path))

  /** Current cache contents, newest row per key. */
  def read(): DataFrame =
    if (!exists) Resources.emptyCache(spark)
    else {
      val raw = spark.read.parquet(path)
      // latest-wins per key without a full shuffle of the payload: max
      // created_at per key is resolved with a semi-join-shaped window.
      // SUCCESS-first, then newest: the log also persists failed rows
      // (0/404/597 — append keeps any from_cache=false row), and the
      // fetch path serves only successes (liveCacheView) while
      // retrying failures — so a concurrent writer's failure row
      // landing after another's success must not become "the" row for
      // the key: a created_at-only window would let it shadow the
      // success, and the next compact()/purgePrefix() would then
      // rewrite the log WITHOUT it, destroying the servable response
      // permanently (the documented concurrent-writer invariant is
      // "at worst a key is fetched twice", never data loss).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("uri"), col("data_hash"))
        .orderBy(Resources.successCol(col("status")).desc, col("created_at").desc)
      raw.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** Append newly fetched rows (from_cache=false) from a fetch round. */
  def append(resources: DataFrame): Unit = {
    val fresh = resources.filter(!col("from_cache"))
      .select(Resources.schema.fieldNames.map(col): _*)
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(path)
  }

  /** Fetch through this store: read → fetchWithCache → append misses. */
  def fetch(requests: DataFrame, fetcher: Fetcher,
            cacheOnly: Boolean = false, maxConcurrency: Int = 32,
            auth: AuthConfig = AuthConfig.none): DataFrame = {
    val out = Resources.fetchWithCache(requests, read(), fetcher, cacheOnly,
        maxConcurrency, auth)
      .localCheckpoint(true) // fetch exactly once, before the append re-reads
    append(out)
    out
  }

  /** Rewrite the append log into one row per key. */
  def compact(): Unit = {
    if (!exists) return
    val compacted = read().localCheckpoint(true)
    compacted.write.mode("overwrite").parquet(path)
  }

  /** Drop the `uriPrefix` namespace; the survivors rewrite compacted. */
  def purgePrefix(uriPrefix: String): Unit = {
    if (!exists) return
    val kept = read().filter(!col("uri").startsWith(uriPrefix))
      .localCheckpoint(true)
    kept.write.mode("overwrite").parquet(path)
  }
}

/** [[CacheStore]] with the append log in a (uri, data_hash)-BUCKETED
  * table: both per-round cache operations lose their shuffle. The
  * latest-wins read window and the fetch join both cluster on exactly
  * the bucket keys, so they consume the on-disk bucketing directly —
  * the cache side of every fetch runs WITHOUT an Exchange (the
  * requests side shuffles into the table's bucket count), and no
  * broadcast of the cache is needed. That is the shape the reference's
  * memoization (the engine's core optimization, SURVEY §4) wants once
  * the cache outgrows broadcast size: plain [[CacheStore]] reshuffles
  * the whole log per fetch round. Same append + latest-wins write
  * model: appends add bucket-tagged files, `compact()` rewrites the
  * log one-row-per-key and keeps the bucketing. */
class BucketedCacheStore(spark: SparkSession, val table: String = "graft_resource_cache",
                         buckets: Int = 32) extends ResourceCache {

  private def exists: Boolean = spark.catalog.tableExists(table)

  /** Current cache contents, newest row per key. The window's required
    * clustering IS the bucketing — no Exchange. */
  def read(): DataFrame =
    if (!exists) Resources.emptyCache(spark)
    else {
      import org.apache.spark.sql.expressions.Window
      // success-first then newest — the [[CacheStore.read]] rationale
      // (a late failure row must not shadow a concurrent success into
      // destruction at compact); the extra sort key changes nothing
      // about the window's clustering, so the read stays Exchange-free
      val w = Window.partitionBy(col("uri"), col("data_hash"))
        .orderBy(Resources.successCol(col("status")).desc, col("created_at").desc)
      spark.table(table).withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** Append newly fetched rows (from_cache=false) from a fetch round.
    * Repartitioned onto the bucket keys first (repartition and
    * bucketBy share the Murmur3 assignment) so each round lands ONE
    * file per touched bucket — without it the fetch round's
    * maxConcurrency partitions each write a file per bucket they hold
    * (parts × buckets small files per round, the
    * [[Bucketed.appendAligned]] lesson). */
  def append(resources: DataFrame): Unit = {
    val fresh = resources.filter(!col("from_cache"))
      .select(Resources.schema.fieldNames.map(col): _*)
    if (!fresh.isEmpty)
      Bucketed.writeKeys(
        fresh.repartition(buckets, col("uri"), col("data_hash")),
        table, Seq("uri", "data_hash"), buckets, mode = "append")
  }

  /** Fetch through this store — co-located join, no cache broadcast. */
  def fetch(requests: DataFrame, fetcher: Fetcher,
            cacheOnly: Boolean = false, maxConcurrency: Int = 32,
            auth: AuthConfig = AuthConfig.none): DataFrame = {
    val out = Resources.fetchWithCache(requests, read(), fetcher, cacheOnly,
        maxConcurrency, auth, broadcastCache = false)
      .localCheckpoint(true) // fetch exactly once, before the append re-reads
    append(out)
    out
  }

  /** Rewrite the append log into one row per key, keeping the bucketing. */
  def compact(): Unit = if (exists) {
    val compacted = read().localCheckpoint(true)
    Bucketed.writeKeys(compacted, table, Seq("uri", "data_hash"), buckets)
  }

  /** Drop the `uriPrefix` namespace; survivors rewrite compacted,
    * keeping the bucketing. */
  def purgePrefix(uriPrefix: String): Unit = if (exists) {
    val kept = read().filter(!col("uri").startsWith(uriPrefix))
      .localCheckpoint(true)
    Bucketed.writeKeys(kept, table, Seq("uri", "data_hash"), buckets)
  }
}
