package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must inject every native expression into a fresh
  * session built with withExtensions — no manual register() call. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) exposes all graft functions in SQL") {
    // Force a NEW SparkSession (reusing the shared SparkContext) so the
    // extensions actually apply; restore the shared session afterwards.
    val shared = graft.SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = spark.sql(
        """SELECT graft_reach('{"a":{"b":1}}', '$.a.b') AS r,
          |       graft_simhash('hello world') AS s,
          |       graft_float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                       array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       size(graft_shingles('a b c d', 3)) AS n""".stripMargin).head
      assert(row.getString(0) === "1")
      assert(row.getDouble(2) === 11.0)
      assert(row.getInt(3) === 2)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
