package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Objective
import graft.model.CollectionSpec
import graft.sources.EntityApiFetcher

/** Dataset lifecycle specs mirroring the reference's per-strategy tests
  * (tests/django_project/datatypes/tests/dataset/test_*_strategy.py).
  */
class DatasetLifecycleSpec extends SparkTestBase {

  val paperKeys = Seq("id", "state", "title")
  def makeSpec(strategy: String) = DatasetSpec(
    name = "papers",
    collections = Seq(CollectionDef(
      CollectionSpec("paper", identifier = Some("id")),
      seedingPhases = Seq(PhaseSpec(
        phase = "papers", strategy = "initial", batchSize = 5,
        retrieve = RetrieveSpec(
          urlTemplate = "http://localhost:8000/entities/{}/",
          parameters = Seq("size" -> "20", "page_size" -> "10"),
          continuationLimit = 2),
        contribute = ContributeSpec(objective =
          Some(Objective("$.results", paperKeys.map(k => k -> s"$$.$k")))))))),
    growthStrategy = strategy,
    config = Map("$setting1" -> "const"))

  def newStore() = new VersionStore(
    Files.createTempDirectory("graft-ds").toString, spark)

  test("signature: sorted args + whitelisted config (dataset.py:116-121)") {
    val spec = makeSpec(GrowthStrategy.Freeze)
    assert(spec.signature(Seq("test")) === "test")
    assert(spec.signature(Seq("test"), Map("setting1" -> "const")) === "setting1=const&test")
    assert(spec.signature(Seq("test"), Map("unknown" -> "x")) === "test")
    assert(spec.signature(Seq("b", "a")) === "a&b")
  }

  test("freeze: grows once, second grow raises DGGrowthFrozen (test_freeze_strategy)") {
    val store = newStore()
    val runner = new DatasetRunner(store, new EntityApiFetcher())
    val spec = makeSpec(GrowthStrategy.Freeze)
    val v = runner.grow(spec, Seq("paper"))
    assert(v.version === 1 && v.state === GrowthState.Complete && v.isCurrent)
    assert(store.readCollection("paper", 1, "paper").count() === 20)
    intercept[DGGrowthFrozen](runner.grow(spec, Seq("paper")))
  }

  test("reset: new empty version replaces current (test_reset_strategy)") {
    val store = newStore()
    val runner = new DatasetRunner(store, new EntityApiFetcher())
    val spec = makeSpec(GrowthStrategy.Reset)
    runner.grow(spec, Seq("paper"))
    val v2 = runner.grow(spec, Seq("paper"))
    assert(v2.version === 2 && v2.isCurrent)
    val vs = store.versions("paper")
    assert(vs.map(_.isCurrent) === Seq(false, true))
    assert(store.readCollection("paper", 2, "paper").count() === 20)
  }

  test("revise: copies current snapshot then regrows (test_revise_strategy)") {
    val store = newStore()
    val runner = new DatasetRunner(store, new EntityApiFetcher())
    val spec = makeSpec(GrowthStrategy.Revise)
    runner.grow(spec, Seq("paper"))
    val v2 = runner.grow(spec, Seq("paper"))
    assert(v2.version === 2 && v2.isCurrent)
    // revised copy upserted in place: still 20 docs, ids preserved from copy
    assert(store.readCollection("paper", 2, "paper").count() === 20)
  }

  test("stack: always a new version, no promotion flip (test_stack_strategy)") {
    val store = newStore()
    val runner = new DatasetRunner(store, new EntityApiFetcher())
    val spec = makeSpec(GrowthStrategy.Stack)
    val v1 = runner.grow(spec, Seq("paper"))
    val v2 = runner.grow(spec, Seq("paper"))
    assert(v1.version === 1 && v2.version === 2)
    assert(!store.versions("paper").exists(_.isCurrent), "stack never promotes")
  }

  test("concurrent growers on one signature: first claims, second raises DGGrowthUnfinished, manifest never corrupt") {
    val store = newStore()
    val spec = makeSpec(GrowthStrategy.Reset)
    // version 1 exists and is current — both racers want to create v2
    new DatasetRunner(store, new EntityApiFetcher()).grow(spec, Seq("paper"))
    // grower 1's fetches block until released, so its Growing claim is
    // observably held while grower 2 attempts its own claim
    GatedFetcherState.reset()
    val slowRunner = new DatasetRunner(store, new GatedFetcher())
    val t1Result = new java.util.concurrent.atomic.AtomicReference[VersionMeta]()
    val t1 = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      t1Result.set(slowRunner.grow(spec, Seq("paper")))
    })
    t1.start()
    // wait until grower 1 has claimed (manifest shows v2 Growing)
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (!store.versions("paper").exists(v =>
        v.version == 2 && v.state == GrowthState.Growing) &&
        System.nanoTime() < deadline) Thread.sleep(10)
    assert(store.versions("paper").exists(v =>
      v.version == 2 && v.state == GrowthState.Growing), "grower 1 never claimed")
    // grower 2: the claim transaction must observe Growing and refuse
    intercept[DGGrowthUnfinished] {
      new DatasetRunner(store, new EntityApiFetcher()).grow(spec, Seq("paper"))
    }
    GatedFetcherState.release()
    t1.join(60000)
    assert(t1Result.get() != null, "grower 1 must finish after release")
    // the winner is promoted; no shadow version was ever created
    val vs = store.versions("paper")
    assert(vs.map(_.version) === Seq(1, 2))
    assert(vs.filter(_.isCurrent).map(_.version) === Seq(2))
    assert(vs.find(_.version == 2).get.state === GrowthState.Complete)
  }

  test("transact serializes manifest read-modify-writes across threads (no lost update)") {
    val store = newStore()
    val threads = 4; val perThread = 10
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to threads).map(_ => new Thread(() => {
      try (1 to perThread).foreach(_ => store.createVersion("sig", "reset"))
      catch { case t: Throwable => errs.add(t); () }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(errs.isEmpty, s"transact threw: ${errs.peek()}")
    val vs = store.versions("sig")
    // every write survived (40 versions) with distinct contiguous
    // numbers — the unlocked read-modify-write lost ~most of these
    assert(vs.size === threads * perThread)
    assert(vs.map(_.version).sorted === (1 to threads * perThread))
  }

  test("release: a lock re-acquired by another holder survives our release (rename-verify, not read-delete)") {
    val store = newStore()
    val lock = java.nio.file.Paths.get(store.root, "sig", ".manifest.lock")
    store.transact("sig") { vs =>
      // simulate the ADVICE r10 race: we stalled past lockStaleMs, a
      // breaker moved our lock away and a fresh holder wrote THEIR
      // token — the release must detect the foreign token and leave
      // (restore) the lock, never delete it out from under them
      Files.write(lock, "foreign-token".getBytes("UTF-8"))
      (vs, ())
    }
    assert(Files.exists(lock) &&
      new String(Files.readAllBytes(lock), "UTF-8") == "foreign-token",
      "release deleted a lock it no longer owned")
    // no grave litter left behind by the rename-verify dance
    assert(!lock.getParent.toFile.list().exists(_.startsWith(".manifest.lock.")),
      "release must clean up its grave files")
    Files.delete(lock) // the simulated holder releases
    store.createVersion("sig", "reset") // store remains functional
    assert(store.versions("sig").size === 1)
    // and the normal path still removes the lock entirely
    assert(!Files.exists(lock))
  }

  test("multi-collection dataset: one collection per seeding factory (dataset.py:148-164)") {
    def phase(entity: String) = Seq(PhaseSpec(
      phase = entity, strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = s"http://localhost:8000/entities/$entity/",
        parameters = Seq("size" -> "20", "page_size" -> "10"),
        continuationLimit = 2),
      contribute = ContributeSpec(objective =
        Some(Objective("$.results", Seq("id" -> "$.id", "title" -> "$.title"))))))
    val spec = DatasetSpec(
      name = "library",
      collections = Seq(
        CollectionDef(CollectionSpec("paper", identifier = Some("id")), phase("paper")),
        CollectionDef(CollectionSpec("journal", identifier = Some("id")), phase("journal"))),
      growthStrategy = GrowthStrategy.Freeze)
    val store = newStore()
    val v = new DatasetRunner(store, new EntityApiFetcher()).grow(spec)
    assert(v.state === GrowthState.Complete)
    assert(store.readCollection("", 1, "paper").count() === 20)
    assert(store.readCollection("", 1, "journal").count() === 20)
  }

  test("concurrent collection growth == sequential growth (dispatch_growth parallel group)") {
    def phase(entity: String) = Seq(PhaseSpec(
      phase = entity, strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = s"http://localhost:8000/entities/$entity/",
        parameters = Seq("size" -> "20", "page_size" -> "10"),
        continuationLimit = 2),
      contribute = ContributeSpec(objective =
        Some(Objective("$.results", Seq("id" -> "$.id", "title" -> "$.title"))))))
    val spec = DatasetSpec(
      name = "library",
      collections = Seq("paper", "journal", "author").map(e =>
        CollectionDef(CollectionSpec(e, identifier = Some("id")), phase(e))),
      growthStrategy = GrowthStrategy.Freeze)
    def contents(par: Int): Map[String, Seq[String]] = {
      val store = newStore()
      val v = new DatasetRunner(store, new EntityApiFetcher(),
        collectionParallelism = par).grow(spec)
      assert(v.state === GrowthState.Complete)
      Seq("paper", "journal", "author").map(c =>
        c -> store.readCollection("", 1, c)
          .select(col("identity"), col("properties"))
          .collect().map(_.toString).sorted.toSeq).toMap
    }
    val seq = contents(par = 1)
    val conc = contents(par = 3)
    seq.keys.foreach { c =>
      assert(seq(c).nonEmpty, s"$c grew no docs")
      assert(seq(c) === conc(c), s"collection $c diverges between the two modes")
    }
  }

  test("prepareDatasetVersion: weeds docs, invalidates failed tasks, stamps tasks (dataset.py:178-217)") {
    import graft.model.{CollectionOps, Documents}
    val colSpec = CollectionSpec("prep", identifier = Some("id"))
    val docs = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, Seq(
        """{"id":1,"junk":true}""", """{"id":2}""", """{"id":3}""")), colSpec)
      .withColumn("task_results", element_at(
        array(lit("""{"check":{"success":false}}"""), lit("""{"check":{"success":true}}"""),
          lit("{}")), col("id").cast("int")))
      .withColumn("derivatives", element_at(
        array(lit("""{"check":{"x":1}}"""), lit("""{"check":{"x":2}}"""), lit("{}")),
        col("id").cast("int")))
      .withColumn("pending_at", lit(null).cast("timestamp"))
    val spec = makeSpec(GrowthStrategy.Revise).copy(
      weedPredicate = Some(graft.functions.GraftFunctions.reach(col("properties"), "$.junk") === "true"),
      documentTasks = Some("""{"check":{"checks":[],"depends_on":[]}}"""))
    val runner = new DatasetRunner(newStore(), new EntityApiFetcher())
    val out = runner.prepareDatasetVersion(docs, spec).orderBy("id").collect()
    assert(out.length === 2, "weeded doc deleted")
    val doc2 = out(0) // id=2: successful task untouched
    assert(doc2.getAs[String]("task_results") === """{"check":{"success":true}}""")
    assert(doc2.getAs[java.sql.Timestamp]("pending_at") == null)
    val doc3 = out(1) // id=3: no results → back to pending
    assert(doc3.getAs[java.sql.Timestamp]("pending_at") != null)
    out.foreach(r => assert(r.getAs[String]("tasks").contains("check")))
  }

  test("growth phase inside grow() writes derivatives and evaluation counts") {
    val store = newStore()
    val runner = new DatasetRunner(store, new EntityApiFetcher())
    val base = makeSpec(GrowthStrategy.Freeze)
    val spec = base.copy(collections = Seq(base.collections.head.copy(
      growthPhases = Seq(GrowthSpec(
        growthPhase = "detail",
        urlTemplate = "http://localhost:8000/entities/paper/{}/?size=20",
        argTemplates = Seq("$.id"),
        objective = Objective("$", Seq("abstract" -> "$.abstract")))))))
    val v = runner.grow(spec, Seq("paper"))
    val docs = store.readCollection("paper", 1, "paper")
    assert(docs.filter(col("derivatives").contains("abstract")).count() === 20)
    assert(v.errors.contains("\"detail\":{\"success\":20,\"fail\":0,\"skipped\":0}"))
  }

  test("runner growth through the configured resource cache: a regrow fetches NO growth URL live") {
    GrowthUrlCounter.n.set(0)
    val rc = graft.sources.ResourceCache.configured(spark,
      table = Some("dspec_runner_cache")).get
    val spec = DatasetSpec(
      name = "papers",
      collections = Seq(CollectionDef(
        CollectionSpec("paper", identifier = Some("id"), referee = Some("id")),
        seedingPhases = Seq(PhaseSpec(
          phase = "papers", strategy = "initial", batchSize = 5,
          retrieve = RetrieveSpec(
            urlTemplate = "http://localhost:8000/entities/{}/",
            parameters = Seq("size" -> "20", "page_size" -> "10"),
            continuationLimit = 2),
          contribute = ContributeSpec(objective =
            Some(Objective("$.results", paperKeys.map(k => k -> s"$$.$k")))))),
        growthPhases = Seq(GrowthSpec(
          growthPhase = "detail",
          urlTemplate = "http://localhost:8000/entities/paper/{}/?size=20",
          argTemplates = Seq("$.id"),
          objective = Objective("$", Seq("doi" -> "$.doi")))))),
      growthStrategy = GrowthStrategy.Reset)
    val store = newStore()
    val runner = new DatasetRunner(store, new GrowthCountingFetcher(),
      resourceCache = Some(rc))
    val v1 = runner.grow(spec, Seq("paper"))
    assert(v1.state === GrowthState.Complete)
    val live1 = GrowthUrlCounter.n.get()
    assert(live1 === 20L, s"first grow fetches every detail URL live, got $live1")
    // RESET regrows from scratch — every growth URL must now come from
    // the durable bucketed cache, across runner/version boundaries
    val v2 = runner.grow(spec, Seq("paper"))
    assert(v2.version === 2 && v2.state === GrowthState.Complete)
    assert(GrowthUrlCounter.n.get() === live1,
      "regrow must fetch no growth URL live (cache-served)")
    val docs2 = store.readCollection("paper", 2, "paper")
    assert(docs2.filter(col("derivatives").contains("doi")).count() === 20)
  }
}

/** Executor-visible live-fetch counter for the growth DETAIL pattern
  * (seeding pages don't match — the driver memo covers those). */
object GrowthUrlCounter {
  val n = new java.util.concurrent.atomic.AtomicLong()
}

class GrowthCountingFetcher extends EntityApiFetcher {
  override def fetch(method: String, url: String,
                     requestBody: String): graft.sources.FetchResponse = {
    if (url.matches(".*/entities/paper/\\d+/.*")) GrowthUrlCounter.n.incrementAndGet()
    super.fetch(method, url, requestBody)
  }
}

/** Cross-serialization gate for the concurrent-grower race: fetches
  * block on a static latch so one grower's Growing claim stays
  * observably held while the other attempts its own claim. */
object GatedFetcherState {
  @volatile var latch = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = latch = new java.util.concurrent.CountDownLatch(1)
  def release(): Unit = latch.countDown()
}

class GatedFetcher extends EntityApiFetcher {
  override def fetch(method: String, url: String,
                     requestBody: String): graft.sources.FetchResponse = {
    GatedFetcherState.latch.await(60, java.util.concurrent.TimeUnit.SECONDS)
    super.fetch(method, url, requestBody)
  }
}
