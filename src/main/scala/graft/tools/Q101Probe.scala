package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Scratch timing probe for the q101 chain (dev tool). */
object Q101Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("n_chars"))
    // warm
    docs.groupBy("source", "n_chars").count().count()
    (1 to 3).foreach { i =>
      val sv = tm(s"run$i corpus (source,value) agg + checkpoint") {
        docs.filter(col("n_chars").isNotNull)
          .groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("w"))
          .localCheckpoint(true)
      }
      val merged = Stats.histogramMergeSketches(
        Stats.histogramSketchGrouped(sv, "source", "n_chars", 64L, Some("w")))
      val brackets = Stats.histogramQuantiles(merged, Seq(0.5, 0.9, 0.99), 64L)
      tm(s"run$i brackets") { brackets.count() }
      val exact = Stats.exactQuantilesDiscrete(sv, "n_chars",
        Seq(0.5, 0.9, 0.99), Some("w"))
      tm(s"run$i exact") { exact.count() }
      val joined = brackets.join(
        exact.select(col("q"), col("value").cast("long").as("exact")), Seq("q"))
      tm(s"run$i full join") { joined.count() }
      sv.unpersist(false)
    }
    spark.stop()
  }
}
