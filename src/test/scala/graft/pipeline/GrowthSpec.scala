package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Objective
import graft.model.{CollectionOps, CollectionSpec, Documents}
import graft.sources.{Fetcher, FetchResponse, Resources}

/** Growth processor specs mirroring the reference's HttpGrowthProcessor
  * tests (tests/django_project/processors/tests/growth/http.py): three
  * documents, each pointing at a resource; contributions land in
  * derivatives[phase] (or a property with to_property).
  */
/** A per-URL canned source: /mock/<ix> → [{"extra": "test <ix>"}]. */
class MockSource extends Fetcher {
  def fetch(method: String, url: String, body: String): FetchResponse = {
    val ix = url.split('/').last
    if (ix.forall(_.isDigit))
      FetchResponse(200, "{}", s"""[{"extra":"test $ix"}]""")
    else FetchResponse(404, "{}", null)
  }
}

/** MockSource that counts live fetches across serialization. */
class CountingSource extends MockSource {
  override def fetch(m: String, u: String, b: String): FetchResponse = {
    CountingHolder.count.incrementAndGet(); super.fetch(m, u, b)
  }
}

class GrowthPipelineSpec extends SparkTestBase {

  val spec = CollectionSpec("growth", identifier = Some("id"))
  val objective = Objective("$.0", Seq("extra" -> "$.extra"))

  def threeDocs() = CollectionOps.add(Documents.empty(spark),
    Documents.fromJsonSeq(spark, (0 until 3).map(ix =>
      s"""{"id":$ix,"resource":"http://mock.api/mock/$ix"}""")), spec)

  test("synchronous update writes derivatives[phase] (growth/http.py:47-70)") {
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective)
    val (out, resources) = Growth.grow(threeDocs(), growth, new MockSource,
      Resources.emptyCache(spark))
    assert(out.count() === 3)
    val rows = out.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (row, ix) =>
      assert(row.getAs[String]("derivatives") === s"""{"test":{"extra":"test $ix"}}""")
      val tr = row.getAs[String]("task_results")
      assert(tr.contains("\"success\":true"))
      assert(row.getAs[java.sql.Timestamp]("pending_at") == null)
      assert(row.getAs[java.sql.Timestamp]("finished_at") != null)
    }
    assert(resources.count() === 3)
  }

  test("growth through the bucketed store: cross-run memoization, Exchange-free cache side") {
    import graft.sources.{BucketedCacheStore, ResourceCache}
    CountingHolder.count.set(0)
    // configured() picks the bucketed layout when a table is named —
    // the at-scale default this wiring exists for
    val rc = ResourceCache.configured(spark,
      path = Some("/tmp/unused"), table = Some("gspec_growth_cache")).get
    assert(rc.isInstanceOf[BucketedCacheStore])
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective)
    val counting = new CountingSource
    def kernel(reqs: org.apache.spark.sql.DataFrame) =
      rc.fetch(reqs, counting)
    val (out, _) = Growth.growWith(threeDocs(), growth, kernel)
    val rows = out.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (row, ix) =>
      assert(row.getAs[String]("derivatives") === s"""{"test":{"extra":"test $ix"}}""")
    }
    assert(CountingHolder.count.get() === 3, "first run fetches live")
    // a FRESH run over fresh documents: every request is a cache hit —
    // growth rounds are memoized ACROSS runs through the store
    val (again, _) = Growth.growWith(threeDocs(), growth, kernel)
    assert(again.count() === 3)
    assert(CountingHolder.count.get() === 3, "second run must fetch nothing live")
    assert(again.orderBy("id").collect().map(_.getAs[String]("derivatives")).toSeq ===
      rows.map(_.getAs[String]("derivatives")).toSeq)

    // plan pin: the cache side of the fetch's (uri, data_hash) join
    // consumes the on-disk bucketing — only the request side shuffles.
    // (rc.fetch checkpoints its result, so inspect the equivalent
    // un-checkpointed fetch plan against the store's table.)
    val (aqe, bcast) = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val reqs = threeDocs().select(
        lit("get").as("method"),
        get_json_object(col("properties"), "$.resource").as("url"),
        lit(null).cast("string").as("request_body"))
      val plan = Resources.fetchWithCache(reqs, rc.read(), counting,
        broadcastCache = false).queryExecution.executedPlan
      val sides = plan.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == Set("uri", "data_hash") =>
          Seq(j.left, j.right)
        case j: ShuffledHashJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == Set("uri", "data_hash") =>
          Seq(j.left, j.right)
      }.flatten
      assert(sides.nonEmpty, s"no (uri, data_hash) join in the fetch plan:\n$plan")
      val cacheSides = sides.filter(_.collectFirst {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
      }.nonEmpty)
      assert(cacheSides.nonEmpty, s"fetch must join the bucketed cache table:\n$plan")
      cacheSides.foreach { side =>
        assert(side.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
          s"cache side must consume the bucketing, never re-shuffle:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("growth auth: credential reaches the transport, never the resources frame") {
    graft.sources.AuthSeenHolder.reset()
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective)
    val auth = graft.sources.AuthConfig(parameters = Map("token" -> "tok-SECRET"))
    val (_, resources) = Growth.grow(threeDocs(), growth, new graft.sources.AuthSeeingFetcher,
      Resources.emptyCache(spark), auth = auth)
    val dumped = resources.collect().map(_.toSeq.map(String.valueOf).mkString("|")).mkString
    assert(!dumped.contains("SECRET"), s"credential leaked into resources: $dumped")
    import scala.jdk.CollectionConverters._
    assert(graft.sources.AuthSeenHolder.urls.asScala.forall(_.contains("token=tok-SECRET")))
  }

  test("to_property properties/results writes into properties (http.py:72-95)") {
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective,
      toProperty = Some("properties/results"))
    val (out, _) = Growth.grow(threeDocs(), growth, new MockSource,
      Resources.emptyCache(spark))
    val row = out.filter(col("identity") === "1").head
    assert(row.getAs[String]("properties").contains(""""results":{"extra":"test 1"}"""))
    assert(row.getAs[String]("derivatives") === "{}")
  }

  test("to_property key writes under derivatives[phase][key]") {
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective,
      toProperty = Some("boxed"))
    val (out, _) = Growth.grow(threeDocs(), growth, new MockSource,
      Resources.emptyCache(spark))
    val row = out.filter(col("identity") === "2").head
    assert(row.getAs[String]("derivatives") === """{"test":{"boxed":{"extra":"test 2"}}}""")
  }

  test("already-successful documents are skipped; depends_on gates (resources/growth.py:40-47)") {
    val docs = threeDocs()
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective)
    val (once, _) = Growth.grow(docs, growth, new MockSource, Resources.emptyCache(spark))
    // Counting fetcher proves no requests on the second run.
    CountingHolder.count.set(0)
    val (twice, _) = Growth.grow(once.localCheckpoint(true), growth,
      new CountingSource, Resources.emptyCache(spark))
    assert(twice.count() === 3)
    assert(CountingHolder.count.get() === 0, "no refetch for successful tasks")

    // depends_on unmet → nothing pending
    val gated = GrowthSpec(growthPhase = "second",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective,
      dependsOn = Some("missing_task"))
    assert(once.filter(Growth.pendingFilter(gated)).count() === 0)
    val met = gated.copy(dependsOn = Some("test"))
    assert(once.filter(Growth.pendingFilter(met)).count() === 3)

    // dependency-gated docs must be RETAINED by the round, not lost:
    // the reach on a missing task key is SQL NULL, and an un-coalesced
    // NULL fails both the pending filter AND its negation — the docs
    // would vanish from the grow output entirely
    CountingHolder.count.set(0)
    val (gatedOut, _) = Growth.grow(docs.localCheckpoint(true), gated,
      new CountingSource, Resources.emptyCache(spark))
    assert(gatedOut.count() === 3, "unmet depends_on parks docs, never drops them")
    assert(CountingHolder.count.get() === 0, "and fetches nothing")
  }

  test("apply_resource hook sets reference = resource.status (document.py:171-172, " +
      "tests/django_project/datatypes/models/document.py:4-7)") {
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective,
      applyResourceTo = Seq("reference"),
      applyResource = Some((_, resource) => Map("reference" -> resource.status.toString)))
    val (out, _) = Growth.grow(threeDocs(), growth, new MockSource,
      Resources.emptyCache(spark))
    out.orderBy("id").collect().foreach { row =>
      assert(row.getAs[String]("reference") === "200")
    }
    // hook present but applyResourceTo empty → not applied (growth.py:118)
    val gatedOff = growth.copy(applyResourceTo = Nil)
    val (out2, _) = Growth.grow(threeDocs(), gatedOff, new MockSource,
      Resources.emptyCache(spark))
    out2.collect().foreach(row => assert(row.getAs[String]("reference") !== "200"))
  }

  test("multi-resource merge is deterministic under repartition (growth.py:103-105)") {
    import spark.implicits._
    val pending = threeDocs().limit(1)
    val docId = pending.head.getAs[Long]("id")
    val rows = Seq(
      (docId, 200, "mock.api/a", "h1", """{"Content-Type": "application/json"}""", """[{"extra":"from a"}]"""),
      (docId, 200, "mock.api/b", "h2", """{"Content-Type": "application/json"}""", """[{"extra":"from b"}]"""))
      .toDF("doc_id", "status", "r_uri", "data_hash", "head", "body")
    val growth = GrowthSpec(growthPhase = "test",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective)
    val results = (1 to 4).map { parts =>
      Growth.mergeBatch(pending, rows.repartition(parts), growth)
        .select("derivatives", "task_results").head
    }
    // main = first by sorted uri → "mock.api/a"; contributions reduce
    // to the first in that same order, whatever the partitioning
    assert(results.map(_.getString(0)).distinct === Seq("""{"test":{"extra":"from a"}}"""))
    assert(results.map(_.getString(1)).distinct.size === 1)
    assert(results.head.getString(1).contains(""""ids":["""))
  }

  test("growth extracts text/html resources through the markup objective") {
    import spark.implicits._
    val pending = threeDocs().limit(1)
    val docId = pending.head.getAs[Long]("id")
    val html = "<html><head><title>T</title></head><body><a href='/x'>link</a></body></html>"
    val rows = Seq((docId, 200, "mock.api/page", "h1",
        """{"Content-Type": "text/html; charset=utf-8"}""", html))
      .toDF("doc_id", "status", "r_uri", "data_hash", "head", "body")
    val growth = GrowthSpec(growthPhase = "scrape",
      urlTemplate = "{}", argTemplates = Seq("$.resource"), objective = objective,
      markupObjective = Some(graft.core.MarkupObjective.fromJson(
        """{"@": "soup.find_all('a')", "extra": "el.text"}""")))
    val out = Growth.mergeBatch(pending, rows, growth).head
    assert(out.getAs[String]("derivatives") === """{"scrape":{"extra":"link"}}""")
  }

  test("fetch kernel: cache hits skip live fetches; cache_only blocks them (generic.py:117-124)") {
    import spark.implicits._
    val requests = Seq(("get", "http://mock.api/mock/0", null: String),
      ("get", "http://mock.api/mock/1", null: String))
      .toDF("method", "url", "request_body")
    val first = Resources.fetchWithCache(requests, Resources.emptyCache(spark), new MockSource)
    assert(first.count() === 2 && first.filter(col("from_cache")).count() === 0)
    // Feed results back as the cache: all hits now.
    val cache = first.select(Resources.schema.fieldNames.map(col): _*)
    val second = Resources.fetchWithCache(requests, cache, new MockSource)
    assert(second.filter(col("from_cache")).count() === 2)
    // cache_only with empty cache → status 0 rows, no fetch
    val blocked = Resources.fetchWithCache(requests, Resources.emptyCache(spark),
      new MockSource, cacheOnly = true)
    assert(blocked.filter(col("status") === 0).count() === 2)
  }
}

object CountingHolder {
  val count = new java.util.concurrent.atomic.AtomicInteger(0)
}
