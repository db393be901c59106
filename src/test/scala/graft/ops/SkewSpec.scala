package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows, 90% on one hot key.
  def skewed() = (0 until 10000)
    .map(i => (if (i % 10 == 0) s"key${i % 100}" else "HOT", i.toLong))
    .toDF("k", "v")

  test("saltedAggregate equals plain aggregation") {
    val out = Skew.saltedAggregate(skewed(), Seq("k"), salts = 8,
      partials = Seq(count(lit(1)).as("cnt"), sum("v").as("s")),
      finals = Seq(sum("cnt").as("cnt"), sum("s").as("s")))
    val direct = skewed().groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    assert(out.orderBy("k").collect().toSeq === direct.orderBy("k").collect().toSeq)
    // partial phase actually split the hot key across salts
    val partialGroups = skewed()
      .withColumn("__salt", (rand(8L) * 8).cast("int"))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(partialGroups > 1)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("HOT", "hot-label"), ("key0", "k0"), ("key10", "k10")).toDF("k", "label")
    val out = Skew.saltedJoin(skewed(), dim, "k", salts = 8)
    val direct = skewed().join(dim, Seq("k"))
    assert(out.count() === direct.count())
    assert(out.agg(sum("v")).head.getLong(0) === direct.agg(sum("v")).head.getLong(0))
  }
}
