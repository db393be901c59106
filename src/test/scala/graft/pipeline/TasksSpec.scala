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

  test("retry-with-countdown: a straggler task lands on a later attempt (collection.py:40-46)") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    // "first" outlasts the whole first dispatch (10 depth rounds = 10
    // calls) and lands on the retry — the async-child shape where a
    // dependency is not ready until a later dispatch attempt
    var firstCalls = 0
    def flakyFirst(df: DataFrame): DataFrame = {
      firstCalls += 1
      if (firstCalls <= 10) df else mark("first")(df)
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Tasks.dispatchWithRetry(docsWithTasks(),
      Map("first" -> flakyFirst _, "second" -> mark("second") _),
      Seq("collection_level" -> mark("collection_level") _),
      maxRetries = 5, countdownMillis = 300000L, sleep = sleeps += _)
    assert(sleeps.toSeq === Seq(300000L), "exactly one countdown before the task landed")
    assert(out.filter(!col("task_results").contains("\"second\":{\"success\":true}")).count() === 0)
    assert(out.filter(col("task_results").contains("collection_level")).count() === 4)
  }

  test("retry exhaustion cancels stragglers and still runs collection tasks (collection.py:25-37)") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Tasks.dispatchWithRetry(docsWithTasks(),
      Map("first" -> identity[DataFrame] _), // never completes
      Seq("collection_level" -> mark("collection_level") _),
      maxRetries = 3, countdownMillis = 1000L, sleep = sleeps += _)
    assert(sleeps.toSeq === Seq(1000L, 1000L, 1000L), "one countdown per retry")
    val rows = out.select("task_results", "finished_at").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getString(0).contains("\"first\":{\"success\":false,\"canceled\":true}"))
      assert(r.getString(0).contains("\"collection_level\":{\"success\":true}"))
      assert(r.get(1) != null, "canceled docs finish")
    }
  }

  test("retry exhaustion cancels NULL-id docs too (the split is per-row, never an id join)") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    // Documents.fromJsonSeq leaves id null — only CollectionOps.add
    // assigns ids. A null-unsafe semi/anti id split would route these
    // docs into `fine` UNcanceled, and collection tasks would then run
    // over a frame still holding pending docs (DGPendingDocuments).
    val docs = Documents.fromJsonSeq(spark,
        (0 until 3).map(i => s"""{"state":"s$i"}"""))
      .withColumn("tasks",
        lit("""{"first":{"checks":["pending_at"],"depends_on":[]}}"""))
    assert(docs.filter(col("id").isNull).count() === 3, "fixture: ids are null")
    val out = Tasks.dispatchWithRetry(docs,
      Map("first" -> identity[DataFrame] _), // never completes
      Seq("collection_level" -> mark("collection_level") _),
      maxRetries = 1, countdownMillis = 1L, sleep = _ => ())
    val rows = out.select("task_results", "finished_at").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getString(0).contains("\"first\":{\"success\":false,\"canceled\":true}"),
        s"null-id doc must be canceled: ${r.getString(0)}")
      assert(r.get(1) != null, "canceled docs finish")
    }
  }

  test("retry loop ignores pending tasks owned by OTHER dispatchers: no sleep, no cancel") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    // docs carry a pending task "foreign" that this dispatcher does not
    // own — it must neither burn countdowns nor be destructively
    // canceled out from under its real owner
    val docs = docsWithTasks().withColumn("tasks",
      lit("""{"first":{"checks":["pending_at"],"depends_on":[]},"foreign":{"checks":["pending_at"],"depends_on":[]}}"""))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Tasks.dispatchWithRetry(docs,
      Map("first" -> mark("first") _),
      Seq("collection_level" -> mark("collection_level") _),
      maxRetries = 5, countdownMillis = 1000L, sleep = sleeps += _)
    assert(sleeps.isEmpty, s"foreign pending task must not trigger retries, slept $sleeps")
    val rows = out.select("task_results").collect().map(_.getString(0))
    rows.foreach { r =>
      assert(r.contains("\"first\":{\"success\":true}"))
      assert(!r.contains("\"foreign\""), s"foreign task must stay untouched: $r")
    }
  }

  test("soft time limit cancels the slow attempt and the retry succeeds (growth.py:23-29)") {
    // attempt 1 sleeps past the budget inside its tasks; attempt 2 is
    // instant — the reference's SoftTimeLimitExceeded autoretry shape
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = Tasks.withSoftTimeLimit(spark, timeoutMillis = 3000, maxRetries = 2) {
      val slow = attempts.incrementAndGet() == 1
      spark.sparkContext.parallelize(1 to 8, 8).map { i =>
        if (slow) Thread.sleep(60000)
        i
      }.sum()
    }
    assert(out === 36.0 && attempts.get() === 2, s"retry must succeed, attempts=${attempts.get()}")
  }

  test("soft time limit throws after exhausting retries") {
    val e = intercept[Tasks.DGSoftTimeLimitExceeded] {
      Tasks.withSoftTimeLimit(spark, timeoutMillis = 1500, maxRetries = 1) {
        spark.sparkContext.parallelize(1 to 4, 4).map { i =>
          Thread.sleep(60000); i
        }.sum()
      }
    }
    assert(e.getMessage.contains("all 2 attempts"))
  }

  test("a non-cancellation failure that merely SAYS 'cancel' propagates even after the timer fires") {
    // a genuine error racing the timer must not be mistaken for the
    // job-group cancellation and silently retried — detection is by the
    // attempt's groupId in a SparkException chain, not message words
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Tasks.withSoftTimeLimit(spark, timeoutMillis = 100, maxRetries = 3) {
        attempts.incrementAndGet()
        Thread.sleep(500) // driver-side: the timer fires but nothing is cancellable
        throw new RuntimeException("upstream request was cancelled by the user")
      }
    }
    assert(e.getMessage.contains("cancelled by the user"), s"wrong error surfaced: $e")
    assert(attempts.get() === 1, "a real failure must not burn retries")
  }

  test("retry exhaustion cancels only OWNED tasks; docs with live foreign tasks stay unfinished") {
    def mark(name: String)(df: DataFrame): DataFrame =
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit(s"""{"$name":{"success":true}}""")))
    // "first" is owned here and never completes; "foreign" belongs to
    // another dispatcher — exhaustion must cancel first WITHOUT touching
    // foreign, and the doc must NOT finish while foreign is still live
    val docs = docsWithTasks().withColumn("tasks",
      lit("""{"first":{"checks":["pending_at"],"depends_on":[]},"foreign":{"checks":["pending_at"],"depends_on":[]}}"""))
    val out = Tasks.dispatchWithRetry(docs,
      Map("first" -> identity[DataFrame] _),
      Seq("collection_level" -> mark("collection_level") _),
      maxRetries = 1, countdownMillis = 1L, sleep = _ => ())
    val rows = out.select("task_results", "pending_at", "finished_at").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getString(0).contains("\"first\":{\"success\":false,\"canceled\":true}"))
      assert(!r.getString(0).contains("\"foreign\""), s"foreign task canceled: ${r.getString(0)}")
      assert(r.get(1) != null, "doc with a live foreign task must stay pending")
      assert(r.get(2) == null, "doc with a live foreign task must not finish")
    }
  }

  test("cancelPending marks pending tasks canceled and finishes docs (tasks/document.py:260-277)") {
    val out = Tasks.cancelPending(docsWithTasks())
    val row = out.head
    assert(row.getAs[String]("task_results").contains("\"first\":{\"success\":false,\"canceled\":true}"))
    assert(row.getAs[java.sql.Timestamp]("pending_at") == null)
    assert(row.getAs[java.sql.Timestamp]("finished_at") != null)
  }
}
