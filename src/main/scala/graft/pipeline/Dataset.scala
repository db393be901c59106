package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.core.PyJson
import graft.functions.GraftFunctions
import graft.model.{CollectionSpec, Documents}
import graft.sources.Fetcher

/** A dataset definition — the declarative pipeline (reference:
  * datagrowth/datatypes/datasets/db/dataset.py:42-54): seeding phases
  * per collection, growth phases, a growth strategy, and config whose
  * `$`-prefixed keys are signature-relevant.
  */
/** One collection pipeline within a dataset — the reference builds one
  * Collection per seeding factory (dataset.py:148-164). */
final case class CollectionDef(
    collection: CollectionSpec,
    seedingPhases: Seq[PhaseSpec],
    growthPhases: Seq[GrowthSpec] = Nil)

final case class DatasetSpec(
    name: String,
    collections: Seq[CollectionDef],
    growthStrategy: String = GrowthStrategy.Freeze,
    config: Map[String, String] = Map.empty,
    /** `weed_document` hook (dataset.py:240-247): documents matching
      * this predicate are deleted before a re-growth. */
    weedPredicate: Option[org.apache.spark.sql.Column] = None,
    /** Document task definitions stamped on every doc at prepare
      * (`tasks` config JSON; version.py:113-116 `influence`). */
    documentTasks: Option[String] = None) {

  /** Single-collection convenience (most datasets). */
  def collection: CollectionSpec = collections.head.collection

  /** `get_signature_from_input` (dataset.py:116-121): args + whitelisted
    * `key=value` pairs, falsy entries dropped, sorted, `&`-joined. */
  def signature(args: Seq[String], kwargs: Map[String, String] = Map.empty): String = {
    val whitelisted = kwargs.filter { case (k, _) => config.contains("$" + k.stripPrefix("$")) }
    val parts = (args ++ whitelisted.map { case (k, v) => s"$k=$v" }).filter(_.nonEmpty)
    parts.sorted.mkString("&")
  }
}

object GrowthStrategy {
  val Freeze = "freeze"; val Reset = "reset"; val Revise = "revise"; val Stack = "stack"
}

object GrowthState {
  val Pending = "pending"; val Growing = "growing"
  val Complete = "complete"; val Error = "error"
}

final case class VersionMeta(version: Int, state: String, isCurrent: Boolean,
                             growthStrategy: String, errors: String)

/** Versioned dataset storage: Parquet snapshots under
  * `<root>/<signature>/v<N>/collection=<name>/` plus a small JSON
  * manifest with an atomically-swapped `is_current` pointer — the Spark
  * replacement for the reference's DatasetVersion rows + row locking
  * (version.py:26-78; SURVEY §4 "snapshot isolation").
  *
  * Concurrency: the manifest write itself was always atomic (temp file
  * + ATOMIC_MOVE), but atomicity of ONE write is not serialization of
  * a read-modify-write — two concurrent growers on the same signature
  * would each read the manifest, decide, and overwrite the other's
  * decision (lost update; a loser's version could end up silently
  * promoted). The reference serialized this with `select_for_update`
  * (dataset.py:302-311); here every manifest MUTATION runs inside a
  * per-signature lock-file critical section ([[transact]]): an
  * O_CREAT|O_EXCL lock file is the cross-process mutex (atomic on
  * POSIX and on every distributed filesystem offering
  * create-if-absent), held only for the tiny read-decide-write window
  * — never across Spark jobs. A holder that dies without unlocking is
  * broken by the stale-lock timeout. */
class VersionStore(val root: String, spark: SparkSession,
                   /** Max age before another writer may break a lock
                     * left by a crashed holder. The critical section is
                     * milliseconds of JSON I/O, so a minute-old lock is
                     * abandoned with overwhelming probability. */
                   lockStaleMs: Long = 60000L,
                   /** Max total wait to acquire before giving up. */
                   lockWaitMs: Long = 30000L) {

  private def sigDir(sig: String) = Paths.get(root, if (sig.isEmpty) "_default" else sig)
  private def manifestPath(sig: String) = sigDir(sig).resolve("manifest.json")
  private def lockPath(sig: String) = sigDir(sig).resolve(".manifest.lock")

  /** Serialized manifest transaction: acquire the signature's lock
    * file, hand `f` the current versions, atomically write the
    * versions it returns, release. `f` throwing aborts the transaction
    * (nothing written, lock released) — how [[DatasetRunner.grow]]'s
    * claim step rejects a second concurrent grower. */
  /** Put a mistakenly-moved LIVE lock back on the lock path without
    * ever clobbering: CREATE_NEW re-creation of the holder's bytes —
    * if a third party acquired into the vacancy, leave their lock
    * (the displaced holder's own release then no-ops on the foreign
    * token). A rename here would silently REPLACE the new lock
    * (POSIX rename(2) semantics), reopening the two-writers window.
    * The restored file keeps the grave's ORIGINAL mtime: if the
    * displaced holder released during the vacancy, the restoration is
    * an orphan, and preserving the mtime lets the staleness clock
    * break it on its original schedule instead of granting it a fresh
    * lease (waiters fail loud at lockWaitMs in the interim — degraded,
    * never corrupt). */
  private def restoreLock(lock: java.nio.file.Path,
                          grave: java.nio.file.Path): Unit = {
    // the grave is deleted ONLY when the live bytes are safe again —
    // restored (success) or superseded (a foreign lock already holds
    // the path, so the grave is a dead orphan). Any OTHER write
    // failure (transient IO, disk full) keeps the grave on disk: an
    // unconditional delete there would destroy the live lock's only
    // copy while the displaced holder is mid-critical-section —
    // a wider two-writer window than the third-party race this
    // routine exists to close. A surviving grave costs nothing: the
    // next restore attempt (or a human) can still replay it.
    try {
      val mtime = Files.getLastModifiedTime(grave)
      Files.write(lock, Files.readAllBytes(grave),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      Files.setLastModifiedTime(lock, mtime)
      Files.deleteIfExists(grave)
      ()
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(grave); ()
      case _: Exception => ()
    }
  }

  def transact[T](sig: String)(f: Seq[VersionMeta] => (Seq[VersionMeta], T)): T = {
    Files.createDirectories(sigDir(sig))
    val lock = lockPath(sig)
    // ownership token: written into the lock on acquire, checked on
    // release — a holder whose lock was stale-broken must NOT delete
    // the next holder's fresh lock (delete-by-path is delete-whatever-
    // is-there; delete-if-mine closes that cascade)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.nanoTime() + lockWaitMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age =
            try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis
            catch { case _: Exception => 0L } // holder released between check and stat
          if (age > lockStaleMs) {
            // break a crashed holder's lock by ATOMIC RENAME to a
            // unique grave: exactly ONE breaker wins the rename (the
            // losers get NoSuchFileException and loop) — a plain
            // delete here would let every waiter that observed the
            // stale lock delete "the" lock in turn, including the
            // fresh one the first winner just created (two writers in
            // the critical section: the lost update returns)
            val grave = lock.resolveSibling(s".manifest.lock.broken.$token")
            try {
              Files.move(lock, grave, StandardCopyOption.ATOMIC_MOVE)
              // re-verify staleness from the GRAVE (rename preserves
              // mtime): between our stat and the move, the stale
              // holder may have released and a FRESH holder acquired —
              // deleting that would unlock a live critical section.
              // HONEST LIMIT: the lock path is vacant from the move to
              // the restore — a waiter acquiring in that two-syscall
              // window while the displaced holder is mid-section is
              // the residual two-writers race these primitives (no
              // compare-and-rename in POSIX) cannot close; the
              // re-verify narrows it from "every stale break" to
              // "stale break racing a release+acquire"
              val graveAge =
                System.currentTimeMillis() - Files.getLastModifiedTime(grave).toMillis
              if (graveAge > lockStaleMs) Files.deleteIfExists(grave)
              else restoreLock(lock, grave) // we moved a live lock — put it back
              ()
            } catch { case _: Exception => () } // someone else broke or released it
          } else if (System.nanoTime() > deadline) {
            throw new IllegalStateException(
              s"timed out after ${lockWaitMs}ms waiting for manifest lock $lock " +
                "(another grower holds it; raise lockWaitMs or investigate)")
          } else Thread.sleep(10)
      }
    }
    try {
      val (updated, result) = f(versions(sig))
      writeManifest(sig, updated)
      result
    } finally {
      // release ONLY if the lock is still ours: if we stalled past
      // lockStaleMs and a breaker re-acquired, the file now carries
      // their token. The dance: (1) cheap READ — foreign token means
      // nothing of ours remains, touch nothing; (2) if ours, ATOMIC
      // RENAME to a unique grave (exactly one party ever moves a given
      // lock file) and re-verify ownership from the moved bytes — a
      // breaker + fresh holder can land between the read and the
      // rename; (3) a stolen live lock is restored via CREATE_NEW
      // (never a rename, which on POSIX silently REPLACES any lock a
      // third party acquired into the vacancy). THIS path's residual
      // window is two adjacent syscalls wide and requires us to have
      // already overrun lockStaleMs — the stall the staleness clock
      // exists for; the breaker path's own (overrun-free) residual is
      // documented at the break site above.
      try {
        if (new String(Files.readAllBytes(lock), "UTF-8") == token) {
          val grave = lock.resolveSibling(s".manifest.lock.release.$token")
          Files.move(lock, grave, StandardCopyOption.ATOMIC_MOVE)
          if (new String(Files.readAllBytes(grave), "UTF-8") == token)
            Files.delete(grave)
          else restoreLock(lock, grave)
        }
        ()
      } catch { case _: Exception => () } // already broken/renamed away — nothing ours to release
    }
  }
  def collectionPath(sig: String, v: Int, name: String): String =
    sigDir(sig).resolve(s"v$v").resolve(s"collection=$name").toString

  def versions(sig: String): Seq[VersionMeta] = {
    val p = manifestPath(sig)
    if (!Files.exists(p)) return Seq.empty
    val tree = PyJson.parse(Files.readString(p))
    tree.get("versions").elements.asScala.map { n =>
      VersionMeta(n.get("version").asInt, n.get("state").asText,
        n.get("is_current").asBoolean, n.get("growth_strategy").asText,
        PyJson.canonical(n.get("errors")))
    }.toSeq
  }

  /** Atomic manifest write: temp file + ATOMIC_MOVE rename. */
  private def writeManifest(sig: String, vs: Seq[VersionMeta]): Unit = {
    val m = PyJson.mapper
    val rootNode = m.createObjectNode()
    val arr = m.createArrayNode()
    vs.foreach { v =>
      val n = m.createObjectNode()
      n.put("version", v.version).put("state", v.state)
        .put("is_current", v.isCurrent).put("growth_strategy", v.growthStrategy)
      n.set[JsonNode]("errors", PyJson.parse(v.errors))
      arr.add(n)
    }
    rootNode.set[JsonNode]("versions", arr)
    Files.createDirectories(sigDir(sig))
    val tmp = sigDir(sig).resolve(".manifest.tmp")
    Files.writeString(tmp, PyJson.dumps(rootNode, ensureAscii = false))
    Files.move(tmp, manifestPath(sig), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def currentVersion(sig: String): Option[VersionMeta] =
    versions(sig).filter(_.isCurrent).lastOption

  def latestVersion(sig: String): Option[VersionMeta] = versions(sig).lastOption

  def createVersion(sig: String, strategy: String): VersionMeta =
    transact(sig) { vs =>
      val next = VersionMeta(vs.map(_.version).maxOption.getOrElse(0) + 1,
        GrowthState.Pending, isCurrent = false, strategy, """{"seeding":{},"tasks":{}}""")
      (vs :+ next, next)
    }

  def updateVersion(sig: String, v: VersionMeta): Unit =
    transact(sig) { vs =>
      (vs.map(old => if (old.version == v.version) v else old), ())
    }

  /** `finish_processing` promotion (version.py:72-78): non-STACK flips
    * every other version's is_current off. */
  def promote(sig: String, version: Int): Unit =
    transact(sig) { vs =>
      (vs.map(v => v.copy(isCurrent = v.version == version)), ())
    }

  def writeCollection(sig: String, v: Int, name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(collectionPath(sig, v, name))

  /** Collection names materialized for a version (directory listing —
    * the manifest tracks versions, not collections). */
  def collectionNames(sig: String, v: Int): Seq[String] = {
    val dir = sigDir(sig).resolve(s"v$v")
    if (!Files.exists(dir)) return Seq.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("collection="))
      .map(_.stripPrefix("collection="))
      .toSeq.sorted
    finally stream.close()
  }

  def readCollection(sig: String, v: Int, name: String): DataFrame = {
    val p = collectionPath(sig, v, name)
    if (Files.exists(Paths.get(p))) spark.read.parquet(p) else Documents.empty(spark)
  }
}

class DGGrowthFrozen extends RuntimeException("Frozen datasets can not be grown")
class DGGrowthUnfinished extends RuntimeException("Dataset growth already in progress")

/** The dataset growth driver — `Dataset.grow` (dataset.py:302-332) with
  * strategy semantics: FREEZE forbids regrow of an existing current
  * version; RESET/STACK start an empty new version; REVISE copies the
  * current snapshot then regrows (upserts refresh the copied docs).
  * Collection pipelines run as ordinary Spark jobs; the manifest swap
  * replaces Celery orchestration + row locks.
  *
  * `collectionParallelism` > 1 grows a dataset's collections as
  * CONCURRENT Spark jobs (the reference dispatches them as a parallel
  * Celery group, dataset.py:297-298): each collection pipeline is
  * independent — own seeding fetches, own output path — so a
  * fetch-bound collection no longer serializes behind a neighbor.
  * Jobs are submitted from one driver thread per collection; set
  * `spark.scheduler.mode=FAIR` for round-robin task slots between them
  * (FIFO still overlaps fetch latency with compute, which is the win).
  */
class DatasetRunner(store: VersionStore, fetcher: Fetcher, cacheOnly: Boolean = false,
                    collectionParallelism: Int = 4,
                    /** Durable cross-run response cache for the GROWTH
                      * fan-out ([[graft.sources.ResourceCache]] — use
                      * `ResourceCache.configured` to pick the bucketed
                      * table layout at scale). None = cache-less rounds
                      * (every phase fetches live), the reference's
                      * behavior with an empty Resource table. Seeding
                      * keeps its driver-side memo by design: pagination
                      * is sequential and page-count-sized. */
                    resourceCache: Option[graft.sources.ResourceCache] = None) {

  def grow(spec: DatasetSpec, args: Seq[String] = Nil,
           kwargs: Map[String, String] = Map.empty,
           retry: Boolean = false, seeds: Option[Seq[String]] = None,
           limit: Int = -2): VersionMeta = {
    val spark = storeSpark
    val sig = spec.signature(args, kwargs)
    val strategy = spec.growthStrategy

    // The CLAIM is one serialized manifest transaction (the reference's
    // select_for_update window, dataset.py:302-311): check the strategy
    // preconditions, pick-or-create the version, and mark it Growing
    // atomically. Two concurrent growers on the same signature resolve
    // deterministically — the first claims, the second observes the
    // Growing state INSIDE the lock and throws DGGrowthUnfinished; a
    // loser can never create a shadow version or later promote one.
    val (version, current, copyFrom) =
      store.transact(sig) { vs =>
        val current =
          if (strategy == GrowthStrategy.Stack) vs.lastOption
          else vs.filter(_.isCurrent).lastOption
        if (strategy == GrowthStrategy.Freeze && current.isDefined)
          throw new DGGrowthFrozen
        // ANY in-flight version blocks, not just the current one: a
        // fresh Reset/Stack claim is Growing but NOT current (promotion
        // happens at completion), so a current-only check would let a
        // second grower race past it into a shadow version. A version
        // abandoned in Growing by a crashed run must be failed
        // explicitly (updateVersion to Error) before regrowing — the
        // same manual intervention the reference's stuck
        // pending_at/Celery state required.
        if (vs.exists(_.state == GrowthState.Growing))
          throw new DGGrowthUnfinished
        def fresh = VersionMeta(vs.map(_.version).maxOption.getOrElse(0) + 1,
          GrowthState.Growing, isCurrent = false, strategy,
          """{"seeding":{},"tasks":{}}""")
        val (claimed, copyFrom) = current match {
          case None => (fresh, None)
          case Some(v) if v.state == GrowthState.Complete && !retry =>
            strategy match {
              case GrowthStrategy.Reset | GrowthStrategy.Stack => (fresh, None)
              case GrowthStrategy.Revise => (fresh, Some(v.version))
              case other =>
                throw new IllegalArgumentException(s"Unknown growth_strategy: $other")
            }
          // retry / pending / error keeps the version
          case Some(v) => (v.copy(state = GrowthState.Growing), None)
        }
        val updated =
          if (vs.exists(_.version == claimed.version))
            vs.map(o => if (o.version == claimed.version) claimed else o)
          else vs :+ claimed
        (updated, (claimed, current, copyFrom))
      }

    // copy_dataset_version (version.py:99-110): deep snapshot copy —
    // Spark work, so it runs AFTER the claim, outside the lock (the
    // version is already ours; no one else can touch it)
    copyFrom.foreach { fromV =>
      spec.collections.foreach { cd =>
        val copied = store.readCollection(sig, fromV, cd.collection.name)
        store.writeCollection(sig, version.version, cd.collection.name, copied)
      }
    }

    // grow_collection per collection pipeline (dispatch_growth,
    // dataset.py:262-300 — the Celery group becomes one driver thread
    // per collection submitting concurrent Spark jobs; each collection's
    // stages are themselves fully parallel).
    def growCollection(cd: CollectionDef): Unit = {
      var docs0 = store.readCollection(sig, version.version, cd.collection.name)
      if (retry || (current.isDefined && strategy == GrowthStrategy.Revise))
        docs0 = prepareDatasetVersion(docs0, spec).localCheckpoint(true)
      val seeding = new SeedingProcessor(cd.collection, cd.seedingPhases, fetcher, cacheOnly)
      var docs = seeding.run(docs0, args, initial = seeds,
        limit = if (retry && !docs0.isEmpty && limit == -2) -1 else limit)
      cd.growthPhases.foreach { g =>
        val (grown, _) = resourceCache match {
          // the store owns the round: read its cache, checkpoint the
          // fetch exactly-once, append the misses — growth rounds are
          // memoized ACROSS runs and the cache side of the fetch join
          // stays Exchange-free under the bucketed layout
          case Some(rc) =>
            Growth.growWith(docs, g, reqs => rc.fetch(reqs, fetcher, cacheOnly))
          case None =>
            Growth.grow(docs, g, fetcher, graft.sources.Resources.emptyCache(spark),
              cacheOnly = cacheOnly)
        }
        docs = grown.localCheckpoint(true)
      }
      store.writeCollection(sig, version.version, cd.collection.name, docs)
    }
    val par = math.max(1, math.min(collectionParallelism, spec.collections.size))
    if (par <= 1) spec.collections.foreach(growCollection)
    else {
      // Collections write to disjoint paths and share no mutable state,
      // so the only cross-thread concern is Spark's thread-locals: the
      // active session must be re-pinned in each worker thread, and the
      // scheduler pool is a per-thread local property (inert under FIFO,
      // round-robin under FAIR).
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val jobs = spec.collections.map { cd =>
          scala.concurrent.Future {
            SparkSession.setActiveSession(spark)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-grow")
            growCollection(cd)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(jobs),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdownNow()
    }

    val allDocs = spec.collections.map(cd =>
        store.readCollection(sig, version.version, cd.collection.name))
      .reduce(_ unionByName _)
    val errors = evaluate(allDocs,
      spec.collections.flatMap(_.growthPhases.map(_.growthPhase)).distinct)
    val finished = version.copy(state = GrowthState.Complete, errors = errors,
      isCurrent = strategy != GrowthStrategy.Stack)
    store.updateVersion(sig, finished)
    if (strategy != GrowthStrategy.Stack) store.promote(sig, version.version)
    finished
  }

  private def storeSpark: SparkSession = SparkSession.active

  /** `prepare_dataset_version` (dataset.py:178-217): weed documents,
    * invalidate every FAILED task (result + derivative dropped, doc back
    * to pending), stamp task definitions. Distributed: one filter + one
    * projection over the documents frame. */
  def prepareDatasetVersion(docs: DataFrame, spec: DatasetSpec): DataFrame = {
    val weeded = spec.weedPredicate match {
      // NULL-safe negation: a predicate evaluating NULL (e.g. a reach on
      // a missing key) must KEEP the document, not drop it.
      case Some(p) => docs.filter(!coalesce(p, lit(false)))
      case None => docs
    }
    val taskNames = spec.documentTasks
      .map(t => graft.core.DocOps.keys(t)).getOrElse(Nil)
    if (taskNames.isEmpty) return weeded
    val invalidate = org.apache.spark.sql.functions.udf {
      (results: String, derivs: String) =>
        val failed = taskNames.filter { t =>
          graft.core.Reach.reachString(s"$$.$t.success", results) == "false"
        }
        (graft.core.DocOps.removeKeys(results, failed),
          graft.core.DocOps.removeKeys(derivs, failed),
          failed.nonEmpty)
    }
    weeded
      .withColumn("__inv", invalidate(col("task_results"), col("derivatives")))
      .withColumn("task_results", col("__inv._1"))
      .withColumn("derivatives", col("__inv._2"))
      .withColumn("pending_at",
        when(col("__inv._3") || col("task_results") === "{}", current_timestamp())
          .otherwise(col("pending_at")))
      .withColumn("finished_at",
        when(col("__inv._3"), lit(null).cast(org.apache.spark.sql.types.TimestampType))
          .otherwise(col("finished_at")))
      .withColumn("tasks", lit(spec.documentTasks.get))
      .select(graft.model.Documents.columns.map(col): _*)
  }

  /** `evaluate_dataset_version` (version.py:42-70): per task, one-pass
    * conditional counts of success / fail / skipped documents. */
  def evaluate(docs: DataFrame, tasks: Seq[String]): String = {
    if (tasks.isEmpty || docs.isEmpty) return """{"seeding":{},"tasks":{}}"""
    val aggs = tasks.flatMap { t =>
      val s = GraftFunctions.reach(col("task_results"), s"$$.$t.success")
      Seq(count(when(s === "true", 1)).as(s"${t}__success"),
        count(when(s === "false", 1)).as(s"${t}__fail"),
        count(when(s.isNull, 1)).as(s"${t}__skipped"))
    }
    val row = docs.agg(aggs.head, aggs.tail: _*).head
    val m = PyJson.mapper
    val rootNode = m.createObjectNode()
    rootNode.set[JsonNode]("seeding", m.createObjectNode())
    val tasksNode = m.createObjectNode()
    tasks.foreach { t =>
      val n = m.createObjectNode()
      n.put("success", row.getAs[Long](s"${t}__success"))
      n.put("fail", row.getAs[Long](s"${t}__fail"))
      n.put("skipped", row.getAs[Long](s"${t}__skipped"))
      tasksNode.set[JsonNode](t, n)
    }
    rootNode.set[JsonNode]("tasks", tasksNode)
    PyJson.dumps(rootNode, itemSep = ",", kvSep = ":", ensureAscii = false)
  }
}
