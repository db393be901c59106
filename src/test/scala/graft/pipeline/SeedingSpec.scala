package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Objective
import graft.model.{CollectionOps, CollectionSpec, Documents}
import graft.sources.EntityApiFetcher

/** Seeding pipeline specs mirroring the reference's own scenarios
  * (tests/django_project/processors/tests/seeding/{simple,merge}.py) —
  * the SURVEY §7.2 end-to-end slice, driven by the deterministic
  * EntityApi source instead of live HTTP.
  */
class SeedingSpec extends SparkTestBase {

  val paperKeys = Seq("id", "state", "doi", "title", "abstract", "authors",
    "url", "published_at", "modified_at")
  val paperObjective = Objective("$.results", paperKeys.map(k => k -> s"$$.$k"))
  val spec = CollectionSpec("paper", identifier = Some("id"))

  def newProcessor(phases: Seq[PhaseSpec]) =
    new SeedingProcessor(spec, phases, new EntityApiFetcher())

  test("simple seeding: 20 papers over 2 pages, 2 requests (seeding/simple.py:46-60)") {
    val phases = Seq(PhaseSpec(
      phase = "papers", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/entities/{}/",
        parameters = Seq("size" -> "20", "page_size" -> "10"),
        continuationLimit = 2),
      contribute = ContributeSpec(objective = Some(paperObjective))))
    val processor = newProcessor(phases)
    var batches = 0
    val out = processor.run(Documents.empty(spark), args = Seq("paper"),
      onBatch = _ => batches += 1)

    assert(out.count() === 20)
    assert(batches === 4) // 20 seeds / batch_size 5
    assert(processor.resources.size === 2, "two requests to the entity list endpoint")
    assert(processor.resources.forall(_.status == 200))
    // identity stamped from the id property; titles extracted
    val row = out.filter(col("identity") === "7").head
    assert(row.getAs[String]("properties").contains("\"title\":\"Title for 7\""))
    // every new document is pending with no task results
    assert(out.filter(col("pending_at").isNull).count() === 0)
    assert(out.filter(col("task_results") =!= "{}").count() === 0)
  }

  test("HTML seeding: markup objective extracts seeds from a scraped page") {
    val htmlFetcher = new graft.sources.Fetcher {
      def fetch(m: String, url: String, b: String) = graft.sources.FetchResponse(200,
        """{"Content-Type": "text/html; charset=utf-8"}""",
        """<html><body><ul>
          |<li><a href="/p/1">alpha</a></li>
          |<li><a href="/p/2">beta</a></li>
          |</ul></body></html>""".stripMargin)
    }
    val markup = graft.core.MarkupObjective.fromJson(
      """{"@": "soup.find_all('a')", "id": "el['href']", "title": "el.text"}""")
    val phases = Seq(PhaseSpec(
      phase = "pages", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(urlTemplate = "http://scrape.site/list"),
      contribute = ContributeSpec(markupObjective = Some(markup))))
    val processor = new SeedingProcessor(spec, phases, htmlFetcher)
    val out = processor.run(Documents.empty(spark), args = Seq.empty)
    assert(out.count() === 2)
    val row = out.filter(col("identity") === "/p/2").head
    assert(row.getAs[String]("properties").contains("\"title\":\"beta\""))
  }

  test("continuation_limit 1 stops after the first page") {
    val phases = Seq(PhaseSpec(
      phase = "papers", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/entities/{}/",
        parameters = Seq("size" -> "20", "page_size" -> "10"),
        continuationLimit = 1),
      contribute = ContributeSpec(objective = Some(paperObjective))))
    val processor = newProcessor(phases)
    val out = processor.run(Documents.empty(spark), args = Seq("paper"))
    assert(out.count() === 10)
    assert(processor.resources.size === 1)
  }

  test("merge seeding: id list + per-id details, 1+10 requests (seeding/merge.py:63-90)") {
    val detailObjective = Objective("$", paperKeys.map(k => k -> s"$$.$k"))
    val phases = Seq(
      PhaseSpec(
        phase = "ids", strategy = "initial", batchSize = 5,
        retrieve = RetrieveSpec(
          urlTemplate = "http://localhost:8000/entities/{}/ids",
          parameters = Seq("size" -> "10", "page_size" -> "20")),
        contribute = ContributeSpec(objective = Some(Objective("$", Seq("id" -> "$.id"))))),
      PhaseSpec(
        phase = "details", strategy = "merge",
        retrieve = RetrieveSpec(
          urlTemplate = "http://localhost:8000/entities/{}/{}/",
          argTemplates = Seq("#.args.0", "$.id"),
          parameters = Seq("size" -> "10")),
        contribute = ContributeSpec(objective = Some(detailObjective))))
    val processor = newProcessor(phases)
    val out = processor.run(Documents.empty(spark), args = Seq("paper"))

    assert(out.count() === 10)
    val idListRequests = processor.resources.filter(_.url.contains("/ids"))
    assert(idListRequests.size === 1, "one request to the id list endpoint")
    val detailRequests = processor.resources.filterNot(_.url.contains("/ids"))
    assert(detailRequests.size === 10, "one detail request per id")
    // merged details landed on the documents
    val row = out.filter(col("identity") === "3").head
    assert(row.getAs[String]("properties").contains("\"title\":\"Title for 3\""))
  }

  test("merge with composition_to nests the detail record (seeding/merge.py:101-115)") {
    val detailObjective = Objective("$", paperKeys.map(k => k -> s"$$.$k"))
    val phases = Seq(
      PhaseSpec(
        phase = "ids", strategy = "initial", batchSize = 5,
        retrieve = RetrieveSpec(
          urlTemplate = "http://localhost:8000/entities/{}/ids",
          parameters = Seq("size" -> "10", "page_size" -> "20")),
        contribute = ContributeSpec(objective = Some(Objective("$", Seq("id" -> "$.id"))))),
      PhaseSpec(
        phase = "details", strategy = "merge",
        retrieve = RetrieveSpec(
          urlTemplate = "http://localhost:8000/entities/{}/{}/",
          argTemplates = Seq("#.args.0", "$.id"),
          parameters = Seq("size" -> "10")),
        contribute = ContributeSpec(objective = Some(detailObjective),
          compositionTo = Some("details"))))
    val out = newProcessor(phases).run(Documents.empty(spark), args = Seq("paper"))
    assert(out.count() === 10)
    val props = out.filter(col("identity") === "3").head.getAs[String]("properties")
    assert(props.contains("\"details\":{"))
    assert(props.contains("\"title\":\"Title for 3\""))
  }

  test("delta seeding upserts into preexisting documents (seeding/simple.py delta)") {
    // Preexisting: doc id=1 with an old title, plus an ignored doc without id.
    val preexisting = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, Seq(
        """{"id":1,"state":"open","title":"Old title"}""",
        """{"state":"open"}""")), spec, dedupe = false)
    val phases = Seq(PhaseSpec(
      phase = "papers", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/entities/{}/",
        parameters = Seq("size" -> "20", "page_size" -> "10"),
        continuationLimit = 2),
      contribute = ContributeSpec(objective = Some(paperObjective))))
    val out = newProcessor(phases).run(preexisting, args = Seq("paper"))
    // 20 seeded + 1 identity-less preexisting left alone
    assert(out.count() === 21)
    val updated = out.filter(col("identity") === "1").head
    assert(updated.getAs[String]("properties").contains("\"title\":\"Title for 1\""))
    val ignored = out.filter(col("identity").isNull).head
    assert(ignored.getAs[String]("properties") === """{"state":"open"}""")
  }

  test("POST body templates resolve and join the cache key (generic.py:225-243)") {
    // Fetcher that echoes the posted query back as a single seed.
    class EchoFetcher extends graft.sources.Fetcher {
      def fetch(m: String, url: String, body: String): graft.sources.FetchResponse =
        graft.sources.FetchResponse(200, "{}",
          s"""{"results":[{"id":1,"posted":$body,"method":"$m"}]}""")
    }
    val phases = Seq(PhaseSpec(
      phase = "search", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/search/",
        method = "post",
        bodyTemplate = Some("""{"query":"#.args.0","page":1}""")),
      contribute = ContributeSpec(objective = Some(
        Objective("$.results", Seq("id" -> "$.id", "posted" -> "$.posted"))))))
    val processor = new SeedingProcessor(spec, phases, new EchoFetcher())
    val out = processor.run(Documents.empty(spark), args = Seq("papers"))
    assert(out.count() === 1)
    val props = out.head.getAs[String]("properties")
    assert(props.contains(""""query":"papers""""), props)
    // cache key carries the payload hash (not the empty-GET hash)
    assert(processor.resources.head.dataHash ===
      graft.core.Hashing.hashFromData("""{"query":"papers","page":1}"""))
  }

  test("exclusive deletes still seed documents with state=deleted (simple.py:62-69)") {
    val phases = Seq(PhaseSpec(
      phase = "papers", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/entities/{}/",
        parameters = Seq("size" -> "20", "page_size" -> "10", "deletes" -> "-1"),
        continuationLimit = 2),
      contribute = ContributeSpec(objective = Some(paperObjective))))
    val out = newProcessor(phases).run(Documents.empty(spark), args = Seq("paper"))
    assert(out.count() === 20)
    assert(out.filter(graft.functions.GraftFunctions.reach(col("properties"), "$.state") === "deleted")
      .count() === 20)
  }
}
