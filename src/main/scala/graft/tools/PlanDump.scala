package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // compact: exchanges, joins, scans only
      plan.split("\n").filter(l => l.contains("Exchange") || l.contains("Join")
        || l.contains("Scan") || l.contains("Broadcast") || l.contains("Generate")
        || l.contains("Window") || l.contains("HashAggregate")).foreach(println)
    }
    spark.stop()
  }
}
