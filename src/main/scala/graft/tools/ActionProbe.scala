package graft.tools

/** Scratch action-cost probe (dev tool): measures a registered query
  * under `.count()` vs a full-materialization noop write — the
  * difference is whatever Catalyst PRUNES under count (projections,
  * sorts), i.e. work the DuckDB oracle side always pays. */
object ActionProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q146_main_content")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to 2).foreach { _ =>
      var t0 = System.nanoTime(); fn(spark, dir).count()
      println(f"[action] $name count:      ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[action] $name noop-write: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
