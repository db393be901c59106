package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * judge-facing plan evidence (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> [q1 q2 ...]
  * (no query names = the full registry). Session conf mirrors Bench so
  * the dumped plan is the one the timed run executes (same shuffle
  * partitions, AQE, codegen); data dir follows SPARK_GRAFT_SF_DIR so
  * size-dependent planning (broadcast thresholds) sees bench-scale
  * statistics.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.buffer.pageSize", "1m")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(s"$outDir/${q}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] $q -> $outDir/${q}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $q FAILED: ${e.toString.take(200)}")
      }
    }
    spark.stop()
  }
}
