package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical testdata loader. The driver-generated `events.parquet`
  * stores `ts` as Parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`
  * (then it surfaces as a LongType of nanoseconds). We normalize it to a
  * proper TimestampType (microsecond precision — Spark's native unit).
  */
object Tables {

  /** Session config every graft entry point applies (nanos handling +
    * graft function registration). Idempotent. */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  // Base-frame memo per (session, path): schema inference and file
  // listing run once per table per session instead of once per query
  // (the catalog-metadata cache any warehouse keeps). Data is still
  // scanned per query — only the resolved plan is reused.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    prepare(spark)
    loaded.computeIfAbsent((spark, s"$sfDir/$name.parquet"), { case (s, path) =>
      val df = s.read.parquet(path)
      // `ts div 1000`, NOT `ts / 1000`: `/` is double division, and
      // epoch NANOseconds (~1.7e18) are far above 2^53 — the double
      // round-trip drifts ±1 µs on about half the rows (caught by the
      // q58 as-of oracle, where the matched timestamp is an output).
      if (name == "events" && df.schema("ts").dataType.simpleString == "bigint")
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })
  }
}
