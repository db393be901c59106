package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import graft.core.{Objective, PyJson, Reach}
import graft.functions.GraftFunctions
import graft.model.{CollectionSpec, Documents}
import graft.sources.EntityApiFetcher

/** The reference's NESTED seeding scenario (tests/django_project/
  * processors/tests/seeding/nested.py): a journal list whose entries
  * carry nested paper seeds — a CALLABLE `@` objective flattens papers
  * stamping journal_id/state, and a back_fill phase propagates journal
  * deletions onto already-seeded papers by looking the collection up.
  */
class NestedSeedingSpec extends SparkTestBase {

  val paperKeys = Seq("id", "state", "doi", "title", "abstract", "url")

  /** `get_nested_seeds` (nested.py:12-22). */
  def nestedSeeds(journalPage: JsonNode): Seq[JsonNode] = {
    val results = journalPage.get("results")
    if (results == null || !results.isArray) return Nil
    results.elements.asScala.flatMap { journal =>
      val papers = journal.get("papers")
      val noPapers = papers == null || !papers.isArray || papers.size == 0
      if (noPapers && journal.get("state").asText == "deleted") {
        val marker = PyJson.mapper.createObjectNode()
        marker.set[JsonNode]("journal_id", journal.get("id"))
        marker.put("state", "deleted")
        Seq(marker: JsonNode)
      } else if (papers == null || !papers.isArray) Nil
      else papers.elements.asScala.map { p =>
        val paper = p.deepCopy[ObjectNode]()
        paper.set[JsonNode]("journal_id", journal.get("id"))
        paper.set[JsonNode]("state", journal.get("state"))
        paper: JsonNode
      }.toSeq
    }.toSeq
  }

  /** `back_fill_deletes` (nested.py:25-31): deleted-journal markers
    * expand into state=deleted updates of that journal's papers. */
  def backFillDeletes(seedJson: String, docs: org.apache.spark.sql.DataFrame): Seq[String] = {
    val seed = PyJson.parse(seedJson)
    if (seed.get("state") == null || seed.get("state").asText != "deleted")
      return Seq(seedJson)
    val journalId = seed.get("journal_id").asText
    docs.filter(GraftFunctions.reach(col("properties"), "$.journal_id") === journalId)
      .select("properties").collect().map { r =>
        val props = PyJson.parse(r.getString(0)).asInstanceOf[ObjectNode]
        props.put("state", "deleted")
        PyJson.dumps(props, itemSep = ",", kvSep = ":", ensureAscii = false)
      }.toSeq
  }

  val objective = Objective(at = null,
    fields = paperKeys.map(k => k -> s"$$.$k") :+ ("journal_id" -> "$.journal_id"),
    atFunction = Some(nestedSeeds))

  def phases(extraParams: Seq[(String, String)] = Nil) = Seq(
    PhaseSpec(
      phase = "testing", strategy = "initial", batchSize = 5,
      retrieve = RetrieveSpec(
        urlTemplate = "http://localhost:8000/entities/{}/",
        parameters = Seq("size" -> "20", "page_size" -> "10", "nested" -> "paper")
          ++ extraParams,
        continuationLimit = 2),
      contribute = ContributeSpec(objective = Some(objective))),
    PhaseSpec(
      phase = "deletes", strategy = "back_fill", batchSize = 5,
      contribute = ContributeSpec(callback = Some(backFillDeletes))))

  val spec = CollectionSpec("paper", identifier = Some("id"))

  test("nested seeding flattens papers with journal context, 19 docs (nested.py:83-99)") {
    val processor = new SeedingProcessor(spec, phases(), new EntityApiFetcher())
    val out = processor.run(Documents.empty(spark), args = Seq("journal"))
    // 20 journals deal ix%3 papers from a 20-paper pool → 19 dealt
    assert(out.count() === 19)
    assert(processor.resources.size === 2, "two journal list page requests")
    // every doc carries its journal_id
    assert(out.filter(GraftFunctions.reach(col("properties"), "$.journal_id").isNull)
      .count() === 0)
  }

  test("exclusive deletes: all journals deleted → no documents (nested.py:101-108)") {
    val processor = new SeedingProcessor(spec, phases(Seq("deletes" -> "-1")),
      new EntityApiFetcher())
    val out = processor.run(Documents.empty(spark), args = Seq("journal"))
    assert(out.count() === 0)
  }

  test("delta deletes propagate journal deletion onto papers (nested.py delta)") {
    // deletes=4: journals 0,4,8,12,16 deleted → their papers (dealt in the
    // SAME non-delete run earlier) flip to state=deleted via back_fill.
    val first = new SeedingProcessor(spec, phases(), new EntityApiFetcher())
      .run(Documents.empty(spark), args = Seq("journal")).cache()
    assert(first.count() === 19)
    val second = new SeedingProcessor(spec, phases(Seq("deletes" -> "4")),
      new EntityApiFetcher())
      .run(first, args = Seq("journal"))
    // journals deleted in the delta run dealt no papers; their previously
    // seeded papers must now be state=deleted
    val deletedJournals = Set("0", "4", "8", "12", "16")
    val deletedDocs = second.filter(
      GraftFunctions.reach(col("properties"), "$.state") === "deleted")
    assert(deletedDocs.count() > 0)
    val journalsOfDeleted = deletedDocs
      .select(GraftFunctions.reach(col("properties"), "$.journal_id").as("j"))
      .collect().map(_.getString(0)).toSet
    assert(journalsOfDeleted.subsetOf(deletedJournals))
  }
}
