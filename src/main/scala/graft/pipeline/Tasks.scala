package graft.pipeline

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import graft.core.{DocOps, PyJson, Reach}
import graft.model.Documents

/** The declarative task-state machine (reference: datagrowth/datatypes/
  * storage.py:71-128 + documents/tasks). A document's `tasks` config is
  * `{name: {"checks": [attr...], "depends_on": [task-or-$path...]}}`;
  * a task is pending when it has not run, its checks pass (attribute
  * truthiness, `!`-negatable) and its task dependencies succeeded.
  * Dispatch = a driver loop running registered DataFrame transformations
  * for each pending task until drained (depth ≤ 10, tasks/document.py:
  * 235-257) — executors replace Celery workers, snapshots replace locks.
  */
object Tasks {

  /** Driver/executor-neutral pure evaluation of `get_pending_tasks`
    * (storage.py:71-98) over one document's JSON state. Checks evaluate
    * against the supplied attribute map (e.g. "pending_at" → truthy).
    */
  def pendingTasks(tasksJson: String, taskResultsJson: String,
                   attrs: Map[String, Boolean]): Seq[String] = {
    val tasks = PyJson.tryParse(if (tasksJson == null) "{}" else tasksJson)
      .collect { case o: ObjectNode => o }.getOrElse(return Nil)
    val results = PyJson.tryParse(if (taskResultsJson == null) "{}" else taskResultsJson)
      .collect { case o: ObjectNode => o }
    tasks.fields.asScala.flatMap { e =>
      val name = e.getKey
      val conditions = e.getValue
      val hasRun = results.exists(_.has(name))
      val checksPass = Option(conditions.get("checks")).filter(_.isArray)
        .forall(_.elements.asScala.forall { c =>
          val check = c.asText
          val negate = check.startsWith("!")
          val attr = attrs.getOrElse(if (negate) check.substring(1) else check, false)
          if (negate) !attr else attr
        })
      val depsMet = Option(conditions.get("depends_on")).filter(_.isArray)
        .forall(_.elements.asScala.forall { d =>
          val dep = d.asText
          dep.startsWith("$") || // content deps skipped at this level (storage.py:89-91)
            results.exists(r => Option(r.get(dep)).exists(n =>
              Option(n.get("success")).exists(_.asBoolean(false))))
        })
      if (!hasRun && checksPass && depsMet) Some(name) else None
    }.toSeq
  }

  /** `pending_tasks` as an array column over the documents frame; checks
    * supported: pending_at / finished_at (the attributes the reference's
    * document tasks use). */
  def pendingTasksCol: Column = {
    val f = udf { (tasks: String, results: String, pendingAt: java.sql.Timestamp,
                   finishedAt: java.sql.Timestamp) =>
      pendingTasks(tasks, results,
        Map("pending_at" -> (pendingAt != null), "finished_at" -> (finishedAt != null)))
    }
    f(col("tasks"), col("task_results"), col("pending_at"), col("finished_at"))
  }

  /** `cancel_document_tasks` (tasks/document.py:260-277): every pending
    * task gets `{success: false, canceled: true}` and the doc finishes. */
  def cancelPending(docs: DataFrame): DataFrame = {
    val cancelUdf = udf { (tasks: String, results: String, pendingAt: java.sql.Timestamp,
                           finishedAt: java.sql.Timestamp) =>
      val pend = pendingTasks(tasks, results,
        Map("pending_at" -> (pendingAt != null), "finished_at" -> (finishedAt != null)))
      pend.foldLeft(if (results == null) "{}" else results) { (acc, t) =>
        DocOps.mergeShallow(acc, s"""{"$t":{"success":false,"canceled":true}}""")
      }
    }
    docs.withColumn("task_results",
        cancelUdf(col("tasks"), col("task_results"), col("pending_at"), col("finished_at")))
      .withColumn("pending_at", lit(null).cast(TimestampType))
      .withColumn("finished_at", current_timestamp())
  }

  /** Scoped cancel: only pending tasks in `owned` (a dispatcher's
    * registry) are marked canceled — a pending task registered with some
    * OTHER dispatcher is left untouched, and the document only finishes
    * when nothing at all remains pending after the cancel (a doc with a
    * live foreign task is not done). This is the exhaustion-path
    * counterpart of the ownership guard the retry loop applies: the
    * unscoped [[cancelPending]] is the reference's document-level
    * `cancel_document_tasks`; this one is "cancel what *I* own". */
  def cancelPending(docs: DataFrame, owned: Set[String]): DataFrame = {
    val cancelUdf = udf { (tasks: String, results: String, pendingAt: java.sql.Timestamp,
                           finishedAt: java.sql.Timestamp) =>
      val attrs = Map("pending_at" -> (pendingAt != null), "finished_at" -> (finishedAt != null))
      val pend = pendingTasks(tasks, results, attrs)
      val merged = pend.filter(owned.contains).foldLeft(
        if (results == null) "{}" else results) { (acc, t) =>
        DocOps.mergeShallow(acc, s"""{"$t":{"success":false,"canceled":true}}""")
      }
      (merged, pendingTasks(tasks, merged, attrs).nonEmpty)
    }
    docs.withColumn("__cancel",
        cancelUdf(col("tasks"), col("task_results"), col("pending_at"), col("finished_at")))
      .withColumn("task_results", col("__cancel._1"))
      .withColumn("pending_at",
        when(col("__cancel._2"), col("pending_at")).otherwise(lit(null).cast(TimestampType)))
      .withColumn("finished_at",
        when(col("__cancel._2"), col("finished_at")).otherwise(current_timestamp()))
      .drop("__cancel")
  }

  /** `dispatch_document_tasks` (tasks/document.py:235-257): run each
    * registered task transformation over the docs that have it pending,
    * recurse until no task is pending or depth 10. A task function
    * receives its pending subset and returns those rows updated
    * (task_results[name] written by the function).
    */
  /** Hierarchical dispatch (tasks/collection.py:40-102 +
    * tasks/dataset_version.py:307-342): document tasks drain first (the
    * reference retries while children are pending — here the barrier is
    * synchronous), then collection-level transformations run over the
    * WHOLE frame, in order. Returns the frame after both levels.
    */
  def dispatchHierarchical(docs: DataFrame,
                           documentRegistry: Map[String, DataFrame => DataFrame],
                           collectionTasks: Seq[(String, DataFrame => DataFrame)],
                           maxDepth: Int = 10): DataFrame = {
    val drained = dispatch(docs, documentRegistry, maxDepth)
    // same "still pending HERE" predicate as dispatchWithRetry's
    // pendingHere — the two must stay identical (the UDF never
    // returns null, so no null-guard clause belongs in either)
    val stillPending = drained.withColumn("__pending", pendingTasksCol)
      .filter(size(col("__pending")) > 0)
      .filter(exprPendingRegistered(documentRegistry.keySet))
      .limit(1).count()
    require(stillPending == 0,
      "Pending document tasks remain — collection tasks blocked (DGPendingDocuments)")
    collectionTasks.foldLeft(drained) { case (df, (_, fn)) => fn(df).localCheckpoint(true) }
  }

  /** The reference's retry-with-countdown orchestration
    * (tasks/collection.py:40-46 — `autoretry_for=(DGPendingDocuments,)`,
    * `max_retries: 5, countdown: 5*60`, and the `on_retry` handler that
    * CANCELS still-pending document tasks once retries are exhausted,
    * collection.py:25-37): document tasks drain, and while any document
    * stays pending the dispatcher sleeps `countdownMillis` and drains
    * again, up to `maxRetries` times; documents still pending after the
    * last attempt get their tasks canceled (`{success:false,
    * canceled:true}`) so collection-level tasks can proceed — the
    * reference's behavior when a flaky child never lands. `sleep` is
    * injectable (tests pass a recorder; production defaults to
    * Thread.sleep — the Spark driver IS the Celery worker here).
    * Returns the frame after both levels. */
  def dispatchWithRetry(docs: DataFrame,
                        documentRegistry: Map[String, DataFrame => DataFrame],
                        collectionTasks: Seq[(String, DataFrame => DataFrame)],
                        maxRetries: Int = 5,
                        countdownMillis: Long = 5 * 60 * 1000L,
                        sleep: Long => Unit = Thread.sleep,
                        maxDepth: Int = 10): DataFrame = {
    // only tasks THIS dispatcher owns (the registry) gate the retry
    // loop and the exhaustion cancel — a pending task registered with
    // some other dispatcher must neither burn countdowns here nor be
    // destructively canceled out from under its owner (the same guard
    // dispatchHierarchical applies)
    def pendingHere(df: DataFrame): DataFrame =
      df.withColumn("__pending", pendingTasksCol)
        .filter(size(col("__pending")) > 0)
        .filter(exprPendingRegistered(documentRegistry.keySet))
    def hasPending(df: DataFrame): Boolean = pendingHere(df).limit(1).count() > 0
    var current = dispatch(docs, documentRegistry, maxDepth)
    var retries = 0
    while (hasPending(current) && retries < maxRetries) {
      sleep(countdownMillis)
      current = dispatch(current, documentRegistry, maxDepth)
      retries += 1
    }
    if (hasPending(current)) {
      // retries exhausted: cancel the stragglers WE own, keep the rest.
      // The split re-applies the pending PREDICATE per row — never an
      // id round-trip: ids are nullable (only CollectionOps.add
      // assigns them) and not guaranteed unique, so a null-id doc
      // would slip through a null-unsafe semi/anti join pair into
      // `fine` uncanceled, and collection tasks would then run over a
      // frame still holding pending docs — the exact
      // DGPendingDocuments condition this path exists to prevent
      // (duplicate ids conversely drag non-stuck twins into the
      // cancel).
      val flagged = current.withColumn("__pending", pendingTasksCol)
        .withColumn("__stuck", size(col("__pending")) > 0 &&
          exprPendingRegistered(documentRegistry.keySet))
        .localCheckpoint(true)
      val stuck = flagged.filter(col("__stuck"))
        .select(Documents.columns.map(col): _*)
      val fine = flagged.filter(!col("__stuck"))
        .select(Documents.columns.map(col): _*)
      current = fine.unionByName(cancelPending(stuck, documentRegistry.keySet))
        .localCheckpoint(true)
    }
    collectionTasks.foldLeft(current) { case (df, (_, fn)) => fn(df).localCheckpoint(true) }
  }

  /** Escape hatch of [[withSoftTimeLimit]]: the body exceeded its
    * wall-clock budget on every attempt. */
  class DGSoftTimeLimitExceeded(timeoutMillis: Long, attempts: Int)
    extends RuntimeException(
      s"soft time limit ${timeoutMillis} ms exceeded on all $attempts attempts")

  /** The reference's growth-task soft time limit (processors/growth.py:
    * 23-29 — `soft_time_limit=60*30`, `autoretry_for=
    * (SoftTimeLimitExceeded,)`, `max_retries: 3`): run `body` (a
    * driver-side Spark action sequence) under a wall-clock budget; on
    * timeout the attempt's job GROUP is cancelled (tasks interrupt) and
    * the body re-runs, up to `maxRetries` more times. Celery kills the
    * worker process; the Spark twin cancels the job group — same
    * contract, the retry sees a clean slate. Throws
    * [[DGSoftTimeLimitExceeded]] when every attempt times out. `body`
    * must be idempotent (it re-executes whole), which Spark
    * transformations + snapshot writes are by construction here.
    *
    * Contract boundary: the budget binds while Spark JOBS run (that is
    * where pipeline wall-clock lives — the cancel interrupts running
    * tasks and fails the triggering action, which aborts the body);
    * pure driver-side computation between jobs is not interruptible,
    * so a body that exceeds its budget outside any job only notices at
    * its next action. An exception that is NOT the cancellation (e.g.
    * an OOM racing the timer) propagates — only the cancelled attempt
    * retries. */
  def withSoftTimeLimit[T](spark: org.apache.spark.sql.SparkSession,
                           timeoutMillis: Long, maxRetries: Int = 3)
                          (body: => T): T = {
    val sc = spark.sparkContext
    // THIS attempt's cancellation, identified structurally: Spark fails
    // job-group-cancelled jobs with a SparkException whose message names
    // the cancelled group ("Job N cancelled part of cancelled job group
    // <groupId>"), so the attempt's unique groupId in the cause chain IS
    // the cancellation signature. A bare "cancel" substring match would
    // also swallow a genuine failure that merely *mentions* cancellation
    // (e.g. a user-cancelled downstream wrapped in a task failure) when
    // it races the timer — that one must propagate, not retry.
    def isGroupCancellation(e: Throwable, groupId: String): Boolean = {
      var cur = e
      while (cur != null) {
        val m = cur.getMessage
        if (cur.isInstanceOf[org.apache.spark.SparkException] &&
          m != null && m.contains(groupId)) return true
        cur = cur.getCause
      }
      false
    }
    var attempt = 0
    while (attempt <= maxRetries) {
      val groupId = s"graft-soft-limit-${java.util.UUID.randomUUID()}"
      @volatile var timedOut = false
      val timer = new java.util.Timer("graft-soft-time-limit", true)
      timer.schedule(new java.util.TimerTask {
        override def run(): Unit = { timedOut = true; sc.cancelJobGroup(groupId) }
      }, timeoutMillis)
      sc.setJobGroup(groupId, "graft soft-time-limited section", interruptOnCancel = true)
      try {
        val result = body
        return result
      } catch {
        case e: Exception if timedOut && isGroupCancellation(e, groupId) => // cancelled → retry
      } finally {
        timer.cancel()
        sc.clearJobGroup()
      }
      attempt += 1
    }
    throw new DGSoftTimeLimitExceeded(timeoutMillis, maxRetries + 1)
  }

  private def exprPendingRegistered(registered: Set[String]): Column =
    if (registered.isEmpty) lit(false)
    else registered.map(n => array_contains(col("__pending"), n): Column).reduce(_ || _)

  def dispatch(docs: DataFrame, registry: Map[String, DataFrame => DataFrame],
               maxDepth: Int = 10): DataFrame = {
    var current = docs
    var depth = 0
    var drained = false
    while (!drained && depth < maxDepth) {
      val withPending = current.withColumn("__pending", pendingTasksCol)
      val pendingNames = withPending
        .select(explode(col("__pending")).as("t")).distinct()
        .collect().map(_.getString(0)).toSeq.filter(registry.contains).sorted
      if (pendingNames.isEmpty) drained = true
      else {
        // coalesce before the checkpoint: unionByName CONCATENATES
        // partitions, so an un-capped loop doubles the partition count
        // per round — a task that never drains turns 10 depths × 5
        // retries into 2⁴⁰ empty partitions (found by the retry tests)
        val parts = docs.sparkSession.sparkContext.defaultParallelism.max(1)
        pendingNames.foreach { name =>
          val withP = current.withColumn("__pending", pendingTasksCol)
          val target = withP.filter(array_contains(col("__pending"), name))
            .select(Documents.columns.map(col): _*)
          val rest = withP.filter(!array_contains(col("__pending"), name))
            .select(Documents.columns.map(col): _*)
          current = rest.unionByName(registry(name)(target))
            .coalesce(parts)
            .localCheckpoint(true)
        }
        depth += 1
      }
    }
    current
  }
}
