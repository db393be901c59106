package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bucketed-table specs: the co-located join/aggregation shapes the
  * 100 TB design leans on must actually skip their Exchange. */
class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  test("joins and aggregations on the bucket key run without an Exchange") {
    val docs = (0L until 256L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val scores = (0L until 256L).map(i => (i, i * 2.0)).toDF("doc_id", "score")
    Bucketed.write(docs, "bspec_docs", "doc_id", buckets = 4, sortCols = Seq("doc_id"))
    Bucketed.write(scores, "bspec_scores", "doc_id", buckets = 4, sortCols = Seq("doc_id"))

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.table(spark, "bspec_docs")
        .join(Bucketed.table(spark, "bspec_scores"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 256)

      val agg = Bucketed.table(spark, "bspec_docs").groupBy("doc_id").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucket-keyed agg must not shuffle:\n$aggPlan")
      assert(agg.count() === 256)

      // a join keyed off the bucket column DOES shuffle — the pin is
      // meaningful, not vacuous
      val off = Bucketed.table(spark, "bspec_docs").withColumnRenamed("doc_id", "k")
        .join(Bucketed.table(spark, "bspec_scores")
          .withColumn("k", col("doc_id") + 1).drop("doc_id"), "k")
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
