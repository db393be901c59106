package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.DocOps
import graft.model.{CollectionOps, CollectionSpec, Documents}

/** Task-state machine specs (reference: datagrowth/datatypes/storage.py:
  * 71-128 and documents/tasks/document.py). */
class TasksSpec extends SparkTestBase {

  val tasksCfg =
    """{"first":{"checks":["pending_at"],"depends_on":[]},
      |"second":{"checks":["pending_at"],"depends_on":["first"]},
      |"content_gated":{"checks":[],"depends_on":["$.state"]},
      |"negated":{"checks":["!pending_at"],"depends_on":[]}}""".stripMargin.replace("\n", "")

  test("pendingTasks: checks, negation, task deps, $-deps skipped, has-run excluded (storage.py:71-98)") {
    // pending doc, nothing run: first pending; second blocked by dep;
    // content_gated pending ($-dep skipped); negated blocked by !pending_at
    assert(Tasks.pendingTasks(tasksCfg, "{}", Map("pending_at" -> true)) ===
      Seq("first", "content_gated"))
    // first succeeded → second unlocks, first no longer pending
    val afterFirst = """{"first":{"success":true}}"""
    assert(Tasks.pendingTasks(tasksCfg, afterFirst, Map("pending_at" -> true)) ===
      Seq("second", "content_gated"))
    // failed dep does not unlock
    val failedFirst = """{"first":{"success":false}}"""
    assert(Tasks.pendingTasks(tasksCfg, failedFirst, Map("pending_at" -> true)) ===
      Seq("content_gated"))
    // finished doc (pending_at gone): negated now passes
    assert(Tasks.pendingTasks(tasksCfg, "{}", Map("pending_at" -> false)) ===
      Seq("content_gated", "negated"))
  }

  val spec = CollectionSpec("tasked", identifier = Some("id"))
  def docsWithTasks(): DataFrame = {
    val base = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, (0 until 4).map(i => s"""{"id":$i,"state":"open"}""")), spec)
    base.withColumn("tasks",
      lit("""{"first":{"checks":["pending_at"],"depends_on":[]},"second":{"checks":["pending_at"],"depends_on":["first"]}}"""))
  }

  test("dispatch runs tasks through dependency chain until drained (tasks/document.py:235-257)") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    val out = Tasks.dispatch(docsWithTasks(),
      Map("first" -> mark("first") _, "second" -> mark("second") _))
    val results = out.select("task_results").collect().map(_.getString(0))
    assert(results.length === 4)
    results.foreach { r =>
      assert(r.contains("\"first\":{\"success\":true}"))
      assert(r.contains("\"second\":{\"success\":true}"))
    }
  }

  test("hierarchical dispatch: document tasks drain, then collection tasks run (tasks/collection.py:40-102)") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    var collectionRan = false
    val out = Tasks.dispatchHierarchical(docsWithTasks(),
      Map("first" -> mark("first") _, "second" -> mark("second") _),
      Seq("collection_level" -> { df =>
        collectionRan = true
        // collection task sees the fully drained frame
        assert(df.filter(!col("task_results").contains("second")).count() === 0)
        mark("collection_level")(df)
      }))
    assert(collectionRan)
    assert(out.filter(col("task_results").contains("collection_level")).count() === 4)
  }

  test("cancelPending marks pending tasks canceled and finishes docs (tasks/document.py:260-277)") {
    val out = Tasks.cancelPending(docsWithTasks())
    val row = out.head
    assert(row.getAs[String]("task_results").contains("\"first\":{\"success\":false,\"canceled\":true}"))
    assert(row.getAs[java.sql.Timestamp]("pending_at") == null)
    assert(row.getAs[java.sql.Timestamp]("finished_at") != null)
  }
}
