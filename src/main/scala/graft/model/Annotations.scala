package graft.model

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Human annotations keyed by document `reference` + `name`, value float
  * OR string (reference: datagrowth/datatypes/annotations/base.py:6-22 +
  * views.py:100-140). */
object Annotations {

  val schema: StructType = StructType(Seq(
    StructField("user", StringType, nullable = true),
    StructField("reference", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("string", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true)))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** `Collection.annotations` (collection.py:34-37): annotations whose
    * reference occurs in the collection — a LEFT SEMI join. */
  def forCollection(annotations: DataFrame, documents: DataFrame): DataFrame =
    annotations.join(documents.select(col("reference")).distinct(),
      Seq("reference"), "left_semi")

  /** Annotation candidates (annotations/views.py:122-131): documents NOT
    * yet annotated with `name` (LEFT ANTI join) in random order, one
    * page. `seed` makes sampling reproducible (the reference uses DB
    * random order). */
  def candidates(documents: DataFrame, annotations: DataFrame, name: String,
                 pageSize: Int = 20, seed: Long = 42L): DataFrame =
    documents.join(
        annotations.filter(col("name") === name).select(col("reference")).distinct(),
        Seq("reference"), "left_anti")
      .orderBy(rand(seed))
      .limit(pageSize)

  /** Annotate: upsert one (user, reference, name) annotation; numeric
    * values go to `value`, everything else to `string`
    * (annotations/views.py:100-120). */
  def annotate(annotations: DataFrame, user: String, reference: String,
               name: String, value: Any): DataFrame = {
    val spark = annotations.sparkSession
    // the reference gate is `isinstance(value, (int, float))` — ANY
    // numeric width goes to `value` (a Float or BigDecimal landing in
    // `string` would silently vanish from every aggregation over the
    // numeric column)
    val (num, str) = value match {
      case n: java.lang.Number => (java.lang.Double.valueOf(n.doubleValue()), null)
      case other => (null, if (other == null) null else other.toString)
    }
    val row = spark.createDataFrame(
      java.util.List.of(Row(user, reference, name, num, str,
        new java.sql.Timestamp(System.currentTimeMillis()))), schema)
    annotations.filter(!(col("user") <=> user && col("reference") === reference &&
        col("name") === name))
      .unionByName(row)
  }
}
