package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PyJson
import graft.functions.GraftExtensions

/** The Reach-fusion optimizer rule must (a) preserve values exactly and
  * (b) actually reduce per-row JSON parse counts. */
class CollapseReachSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val shared = graft.SparkTestBase.session
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[2]")
        .appName("graft-rule-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("k reaches into one JSON column fuse to one MultiReach parse per row") {
    withExtSession { spark =>
      import spark.implicits._
      val n = 500
      val df = (0 until n).map(i => s"""{"a":$i,"b":{"x":"v$i"},"c":[1,2,$i]}""")
        .toDF("json")
      df.cache().count() // materialize input outside the measured query

      val projected = df.selectExpr(
        "graft_reach(json, '$.a') AS a",
        "graft_reach(json, '$.b.x') AS bx",
        "graft_reach(json, '$.c.2') AS c2",
        "graft_reach(json, '$.missing') AS m")

      // Rule fired: optimized plan contains the fused expression.
      val optimized = projected.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_multi_reach"), optimized)

      PyJson.parseCount.reset()
      val rows = projected.collect()
      val parses = PyJson.parseCount.sum()
      // One parse per row (subexpression elimination shares the fused
      // subtree); without fusion this is 4n.
      assert(parses <= n * 2, s"expected ~$n parses, saw $parses")

      // Values identical to the unfused semantics.
      assert(rows(7).getString(0) === "7")
      assert(rows(7).getString(1) === "v7")
      assert(rows(7).getString(2) === "7")
      assert(rows(7).getString(3) == null)
    }
  }

  test("single reach or distinct columns left untouched") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq(("""{"a":1}""", """{"b":2}""")).toDF("j1", "j2")
      val single = df.selectExpr("graft_reach(j1, '$.a') AS a",
        "graft_reach(j2, '$.b') AS b")
      val plan = single.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_multi_reach"))
      val r = single.head
      assert(r.getString(0) === "1" && r.getString(1) === "2")
    }
  }
}
