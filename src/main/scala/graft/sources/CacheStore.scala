package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
class CacheStore(val path: String, spark: SparkSession) {

  private def exists: Boolean = Files.exists(Paths.get(path))

  /** Current cache contents, newest row per key. */
  def read(): DataFrame =
    if (!exists) Resources.emptyCache(spark)
    else {
      val raw = spark.read.parquet(path)
      // latest-wins per key without a full shuffle of the payload: max
      // created_at per key is resolved with a semi-join-shaped window.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("uri"), col("data_hash"))
        .orderBy(col("created_at").desc)
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
            cacheOnly: Boolean = false, maxConcurrency: Int = 32): DataFrame = {
    val out = Resources.fetchWithCache(requests, read(), fetcher, cacheOnly, maxConcurrency)
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
}
