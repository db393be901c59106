package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-bucketed tables — the co-located-join lever at 100 TB: a
  * frame written `bucketBy(n, key)` is hash-partitioned ON DISK and the
  * bucketing rides the table catalog, so every subsequent join or
  * aggregation keyed on `key` skips its Exchange entirely — the shuffle
  * happens ONCE, at write time, instead of per query. Use for the fact
  * tables that join repeatedly on one key: documents by doc_id between
  * curation stages, the streaming band table by (band, bucket), IVF
  * inverted lists by cluster id. `sortBy` additionally pre-sorts within
  * buckets so sort-merge joins skip their Sort.
  *
  * Sizing: pick `buckets` so one bucket ≈ one task's worth of data at
  * the target SF (≈ 128-512 MB of parquet); both sides of a co-located
  * join must use the SAME bucket count (Spark reads mismatched counts
  * through a shuffle on one side).
  */
object Bucketed {

  def write(df: DataFrame, table: String, key: String, buckets: Int,
            sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit =
    writeKeys(df, table, Seq(key), buckets, sortCols, mode)

  /** Multi-column bucketing — e.g. the streaming band table by
    * (band, bucket). `mode = "append"` adds files into the existing
    * buckets (the bucketing spec must match the table's); each appended
    * file is bucket-tagged, so co-location survives appends. */
  def writeKeys(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
                sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(buckets > 0, "bucket count must be positive")
    require(keys.nonEmpty, "at least one bucket key")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
