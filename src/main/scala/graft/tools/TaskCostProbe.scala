package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe: fixed per-task CPU cost of trivial shuffled
  * stages on this host (local[32]) — separates scheduler/task
  * overhead from real operator work when reading SubstrProbe. */
object TaskCostProbe {
  def main(args: Array[String]): Unit = {
    val builder0 = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
    // A/B knobs from args: e.g. spark.io.compression.codec=lz4
    args.foreach { kv =>
      if (kv.contains('=')) {
        val Array(k, v) = kv.split("=", 2)
        builder0.config(k, v)
      }
    }
    val spark = builder0
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val tm = info.taskMetrics
        for (s <- info.submissionTime; e <- info.completionTime)
          println(f"[tc] stage ${info.stageId}%4d ${e - s}%6d ms tasks ${info.numTasks}%3d " +
            f"cpu ${tm.executorCpuTime / 1000000}%6d ms deser ${tm.executorDeserializeTime}%5d " +
            f"gc ${tm.jvmGCTime}%5d res ${tm.resultSerializationTime}%4d")
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val base = spark.range(100000).select(col("id"),
      (col("id") % 1000).as("k"), (rand(7) * 100).as("v"))
    // warm
    noop(base.repartition(32, col("k")).groupBy("k").agg(sum("v")))
    Thread.sleep(300)
    println("[tc] --- A: repartition(32,k) + agg, 100k rows ---")
    noop(base.repartition(32, col("k")).groupBy("k").agg(sum("v")))
    Thread.sleep(300)
    println("[tc] --- B: repartition(32,k) + window min/max, 100k rows ---")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
    noop(base.repartition(32, col("k"))
      .withColumn("m", min(col("v")).over(w) =!= max(col("v")).over(w))
      .filter(col("m")))
    Thread.sleep(300)
    println("[tc] --- C: same window, 8 partitions ---")
    noop(base.repartition(8, col("k"))
      .withColumn("m", min(col("v")).over(w) =!= max(col("v")).over(w))
      .filter(col("m")))
    Thread.sleep(300)
    spark.stop()
  }
}
