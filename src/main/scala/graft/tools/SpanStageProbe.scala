package graft.tools

/** Scratch stage-cost probe for duplicateSpansBytes (dev tool). */
object SpanStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val docs0 = graft.Tables.load(spark, dir, "documents")
    val P = "prelude words for the planted license block "
    val Q = "creative commons attribution share alike four point zero " +
      "international license applies to this content"
    val R = " with an appended suffix naming the original author"
    val aug = docs0.select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + P + Q)))
      .when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + Q + R)))
      .when(col("doc_id") % 7 === 5, concat(lit("zz"), col("doc_id"),
        lit(" " + Q + " yy"), col("doc_id")))
      .otherwise(col("text")).as("text")).localCheckpoint(true)

    def tm(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[stage] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    val winnowUdf = udf((text: String) => Dedup.winnowAnchors(text, 40, 11))
    val docs = aug.select(col("doc_id"), col("text").as("__text"))
    tm("anchors explode+count") {
      docs.select(col("doc_id"), explode(winnowUdf(col("__text"))).as("a")).count()
    }
    val anchors = docs.select(col("doc_id"), explode(winnowUdf(col("__text"))).as("a"))
      .select(col("doc_id"), col("a._1").as("pos"), col("a._2").as("h"))
      .localCheckpoint(true)
    tm("hot anchor agg") {
      anchors.groupBy(col("h")).agg(count_distinct(col("doc_id")).as("adf"))
        .filter(col("adf") >= 2).count()
    }
    tm("hotByteWindowStarts only") {
      graft.ops.Dedup.hotStartsProbe(aug, "doc_id", "text", 50, 32, 2).count()
    }
    tm("full q147 operator (noop)") {
      val df = Dedup.duplicateSpansBytes(aug, "doc_id", "text", minRun = 50, k = 32)
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    spark.stop()
  }
}
