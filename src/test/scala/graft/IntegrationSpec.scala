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
}
