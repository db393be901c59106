package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch per-stage budget probe for the byte-grain ExactSubstr
  * family (q147/q148) — times each sub-plan of
  * [[graft.ops.Dedup.hotByteWindowStarts]] under a full
  * materialization, and counts physical stages of the end-to-end
  * queries via a listener. The VERDICT_r14 #1 mandate: shrink the
  * exchange floor below 2x of the single-node oracle, or publish this
  * budget proving each remaining exchange load-bearing. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val aqe = args.lift(1).getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup

    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val stageMs = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet()
        val info = sc.stageInfo
        for (s <- info.submissionTime; e <- info.completionTime) {
          stageMs.addAndGet(e - s)
          if (verbose) {
            val tm = info.taskMetrics
            println(f"[stage] ${info.stageId}%4d ${e - s}%6d ms " +
              f"tasks ${info.numTasks}%3d  in ${tm.inputMetrics.recordsRead}%8d " +
              f"shRead ${tm.shuffleReadMetrics.recordsRead}%8d " +
              f"shWrite ${tm.shuffleWriteMetrics.recordsWritten}%8d " +
              f"cpu ${tm.executorCpuTime / 1000000}%6d ms " +
              f"deser ${tm.executorDeserializeTime}%5d ms")
          }
        }
      }
    })

    // the same planted corpus the q147/q148 queries build
    val P = graft.queries.TrainingDedup.ExactSubstrP
    val Q = graft.queries.TrainingDedup.ExactSubstrQ
    val R = graft.queries.TrainingDedup.ExactSubstrR
    val docsRaw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + P + Q)))
          .when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + Q + R)))
          .when(col("doc_id") % 7 === 5,
            concat(lit("zz"), col("doc_id"), lit(" " + Q + " yy"), col("doc_id")))
          .otherwise(col("text")).as("text"))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def timed(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val times = (1 to reps).map { _ =>
        val c0 = stageCount.get()
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, stageCount.get() - c0)
      }
      val best = times.map(_._1).min
      println(f"[substr] $label%-28s best ${best}%.3f s  stages ${times.head._2}")
    }

    // warm the session on the smallest SF (arg 3 overrides)
    val warmDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries("q147_exactsubstr_bytes")(spark, warmDir)
      .write.mode("overwrite").format("noop").save()
    graft.SparkEntry.queries("q148_remove_exactsubstr")(spark, warmDir)
      .write.mode("overwrite").format("noop").save()

    val (docs, hotStarts) = Dedup.hotByteWindowStarts(docsRaw, "doc_id", "text", 50, 32, 2)
    timed("docs checkpoint+noop") { noop(docs) }
    timed("hotStarts end-to-end") { noop(hotStarts) }
    timed("q147 full") {
      noop(graft.SparkEntry.queries("q147_exactsubstr_bytes")(spark, dir))
    }
    timed("q148 full") {
      noop(graft.SparkEntry.queries("q148_remove_exactsubstr")(spark, dir))
    }
    verbose = true
    println("[substr] --- q147 stage-by-stage (one verbose run) ---")
    noop(graft.SparkEntry.queries("q147_exactsubstr_bytes")(spark, dir))
    Thread.sleep(500)
    verbose = false
    println(s"[substr] total stages this run: ${stageCount.get()}, " +
      f"summed stage wall ${stageMs.get() / 1e3}%.1f s")
    spark.stop()
  }
}
