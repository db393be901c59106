package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.Objective
import graft.model.{Annotations, CollectionOps, CollectionSpec, Documents, DumpIO}
import graft.pipeline._
import graft.sources.EntityApiFetcher

/** Kitchen-sink integration: one dataset grows end-to-end through every
  * layer — seeding from the synthetic API, a growth/enrichment phase,
  * task dispatch, version promotion, annotation, split and dump — the
  * "a user of the reference could switch" scenario.
  */
class IntegrationSpec extends SparkTestBase {

  test("full dataset lifecycle: seed → grow → tasks → promote → annotate → split → dump") {
    val paperKeys = Seq("id", "state", "title", "abstract")
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
      growthStrategy = GrowthStrategy.Revise,
      documentTasks = Some("""{"check_doi":{"checks":["pending_at"],"depends_on":[]}}"""))

    val store = new VersionStore(Files.createTempDirectory("graft-int").toString, spark)
    val runner = new DatasetRunner(store, new EntityApiFetcher())

    // Grow v1: 20 papers seeded, each enriched with a doi derivative.
    val v1 = runner.grow(spec, Seq("paper"))
    assert(v1.state === GrowthState.Complete && v1.isCurrent)
    val docs1 = store.readCollection("paper", 1, spec.collection.name)
    assert(docs1.count() === 20)
    assert(docs1.filter(col("derivatives").contains("doi")).count() === 20)
    assert(v1.errors.contains("\"detail\":{\"success\":20"))

    // Dispatch a document task over the grown frame.
    val tasked = docs1.withColumn("tasks", lit(spec.documentTasks.get))
      .withColumn("pending_at", current_timestamp())
    val afterTasks = Tasks.dispatch(tasked, Map("check_doi" -> { df =>
      df.withColumn("task_results", call_function("graft_json_merge",
        col("task_results"), lit("""{"check_doi":{"success":true}}""")))
    }))
    assert(afterTasks.filter(col("task_results").contains("check_doi")).count() === 20)

    // Revise: v2 copies v1 and regrows; promotion flips.
    val v2 = runner.grow(spec, Seq("paper"))
    assert(v2.version === 2 && v2.isCurrent)
    assert(store.versions("paper").map(_.isCurrent) === Seq(false, true))
    val docs2 = store.readCollection("paper", 2, spec.collection.name)
    assert(docs2.count() === 20)

    // Annotate two documents, sample candidates, split, dump.
    var ann = Annotations.empty(spark)
    ann = Annotations.annotate(ann, "rater", "3", "quality", 0.9)
    ann = Annotations.annotate(ann, "rater", "7", "quality", 0.2)
    assert(Annotations.forCollection(ann, docs2).count() === 2)
    assert(Annotations.candidates(docs2, ann, "quality", pageSize = 5).count() === 5)

    val split = CollectionOps.split(docs2, 0.8, 0.1, 0.1, seed = 11L)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("test") === 2 && counts("validate") === 2 && counts("train") === 16)

    val dumpDir = Files.createTempDirectory("graft-int-dump").toString
    DumpIO.dumpDocuments(docs2, dumpDir)
    assert(DumpIO.loadDocuments(spark, dumpDir).count() === 20)
  }

  test("scrape-to-corpus pipeline: HTML seeding → markup growth → curation → chunks") {
    // An HTML site: a listing page and per-item pages, served canned.
    val pages = Map(
      "http://site/list" ->
        """<html><body><ul>
          |<li><a href="/item/1">one</a></li>
          |<li><a href="/item/2">two</a></li>
          |<li><a href="/item/3">three</a></li>
          |</ul></body></html>""".stripMargin,
      "http://site/item/1" ->
        "<html><head><title>One</title></head><body><p>alpha beta gamma delta epsilon zeta</p></body></html>",
      "http://site/item/2" ->
        "<html><head><title>Two</title></head><body><p>alpha beta gamma delta epsilon zeta</p></body></html>",
      "http://site/item/3" ->
        "<html><head><title>Three</title></head><body><p>completely different words here now</p></body></html>")
    val htmlFetcher = new graft.sources.Fetcher {
      def fetch(m: String, url: String, b: String) = pages.get(url) match {
        case Some(body) => graft.sources.FetchResponse(200,
          """{"Content-Type": "text/html; charset=utf-8"}""", body)
        case None => graft.sources.FetchResponse(404, "{}", null)
      }
    }

    // Seed identities from the listing's anchors.
    val colSpec = CollectionSpec("scrape", identifier = Some("path"))
    val seeding = new SeedingProcessor(colSpec, Seq(PhaseSpec(
      phase = "listing", strategy = "initial", batchSize = 10,
      retrieve = RetrieveSpec(urlTemplate = "http://site/list"),
      contribute = ContributeSpec(markupObjective = Some(
        graft.core.MarkupObjective.fromJson(
          """{"@": "soup.find_all('a')", "path": "el['href']", "name": "el.text"}"""))))),
      htmlFetcher)
    val seeded = seeding.run(Documents.empty(spark), args = Seq.empty)
    assert(seeded.count() === 3)

    // Grow each doc by scraping its page body through a markup objective.
    val growth = GrowthSpec(growthPhase = "scrape",
      urlTemplate = "http://site{}", argTemplates = Seq("$.path"),
      objective = Objective("$", Seq("body" -> "$.body")),
      markupObjective = Some(graft.core.MarkupObjective.fromJson(
        """{"@": "soup.find('body')", "body": "el.text",
          | "#page": "soup.find('title').text"}""".stripMargin)),
      toProperty = Some("properties/"))
    val (grown, _) = Growth.grow(seeded, growth, htmlFetcher,
      graft.sources.Resources.emptyCache(spark))
    val scraped = grown
      .withColumn("doc_id", col("id"))
      .withColumn("text", trim(call_function("graft_reach", col("properties"), lit("$.body"))))
      .filter(col("text").isNotNull)
    assert(scraped.count() === 3)
    assert(scraped.filter(col("properties").contains("\"page\"")).count() === 3)

    // Curate: exact-dedup the two identical bodies, then chunk.
    val groups = graft.ops.Dedup.exactGroups(scraped, "doc_id", "text")
    assert(groups.count() === 2, "items 1 and 2 share a body")
    val keep = scraped.join(
      groups.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(keep.count() === 2)
    val chunks = graft.ops.Curation.chunk(keep, "doc_id", "text", size = 4, overlap = 1)
    assert(chunks.count() === 4, "6 tokens → chunks at 0 and 3, per kept doc")
  }
}
