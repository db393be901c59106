package graft.model

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions

/** The document DataFrame schema — the Spark shape of the reference's
  * `Document` rows (reference: datagrowth/datatypes/documents/db/
  * document.py:15-23 + datatypes/storage.py:18-25).
  *
  * The schemaless `properties` dict is kept as a canonical JSON string
  * column (full fidelity, accessed through graft_reach); `tasks`,
  * `task_results` and `derivatives` are JSON strings as well so every
  * mutation is a pure scalar function. Lifecycle timestamps follow the
  * reference's DataStorage columns.
  */
object Documents {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("identity", StringType, nullable = true),
    StructField("reference", StringType, nullable = true),
    StructField("properties", StringType, nullable = false),
    StructField("tasks", StringType, nullable = true),
    StructField("task_results", StringType, nullable = true),
    StructField("derivatives", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("modified_at", TimestampType, nullable = true),
    StructField("pending_at", TimestampType, nullable = true),
    StructField("finished_at", TimestampType, nullable = true)))

  val columns: Seq[String] = schema.fieldNames.toSeq

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Lift a DataFrame that has at least a `properties` JSON column into
    * the full document schema (missing system columns filled with
    * defaults; `pending_at` = now, mirroring DataStorage defaults).
    */
  def fromProperties(df: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    var out = df
    val has = df.columns.toSet
    require(keep.forall(has),
      s"fromProperties keep columns ${keep.filterNot(has)} missing from input")
    if (!has("id")) out = out.withColumn("id", lit(null).cast(LongType))
    if (!has("identity")) out = out.withColumn("identity", lit(null).cast(StringType))
    if (!has("reference")) out = out.withColumn("reference", lit(null).cast(StringType))
    if (!has("tasks")) out = out.withColumn("tasks", lit(null).cast(StringType))
    if (!has("task_results")) out = out.withColumn("task_results", lit("{}"))
    if (!has("derivatives")) out = out.withColumn("derivatives", lit("{}"))
    if (!has("created_at")) out = out.withColumn("created_at", current_timestamp())
    if (!has("modified_at")) out = out.withColumn("modified_at", current_timestamp())
    if (!has("pending_at")) out = out.withColumn("pending_at", current_timestamp())
    if (!has("finished_at")) out = out.withColumn("finished_at", lit(null).cast(TimestampType))
    out.select((columns ++ keep).map(col): _*)
  }

  /** Build a documents DataFrame from raw JSON property strings. */
  def fromJsonSeq(spark: SparkSession, props: Seq[String]): DataFrame = {
    import spark.implicits._
    fromProperties(props.toDF("properties"))
  }

  /** The `content` column (document.py:113-126). */
  def contentCol(df: DataFrame): Column =
    GraftFunctions.docContent(col("properties"), col("derivatives"), col("id"))

  /** Assign ids `offset+1 .. offset+n` in the frame's current row order.
    * Distributed (RDD zipWithIndex — one extra count job, no shuffle, no
    * driver collect), used at ingest where the reference's autoincrement
    * ids are observable. Rows that already have an id keep it.
    */
  def assignIds(df: DataFrame, offset: Long): DataFrame = {
    val spark = df.sparkSession
    val idIx = df.schema.fieldIndex("id")
    val indexed = df.rdd.zipWithIndex.map { case (row, ix) =>
      if (!row.isNullAt(idIx)) row
      else Row.fromSeq(row.toSeq.updated(idIx, offset + ix + 1))
    }
    spark.createDataFrame(indexed, df.schema)
  }
}
