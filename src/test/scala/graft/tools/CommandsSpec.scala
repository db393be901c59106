package graft.tools

import java.nio.file.Files
import graft.SparkTestBase
import graft.core.Objective
import graft.model.CollectionSpec
import graft.pipeline.{CollectionDef, ContributeSpec, DatasetSpec, GrowthStrategy,
  PhaseSpec, RetrieveSpec, VersionStore}
import graft.sources.EntityApiFetcher

/** The CLI provider the Grow main resolves by name — the management
  * command's equivalent of a registered Django dataset model. */
object PapersProvider extends DatasetProvider {
  override def spec: DatasetSpec = DatasetSpec(
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
          Some(Objective("$.results", Seq("id", "state", "title").map(k => k -> s"$$.$k")))))))),
    growthStrategy = GrowthStrategy.Freeze)
  override def fetcher: EntityApiFetcher = new EntityApiFetcher()
}

/** Management-command mains driven end-to-end: grow a dataset by
  * provider name, dump its collections, load the dump into a fresh
  * store — the reference's grow_dataset/dump_dataset/load_dataset
  * round-trip. */
class CommandsSpec extends SparkTestBase {

  test("Grow → Dump → Load round-trips a dataset through the CLI mains") {
    val storeRoot = Files.createTempDirectory("graft-cli-store").toString
    val dumpDir = Files.createTempDirectory("graft-cli-dump").toString
    val loadRoot = Files.createTempDirectory("graft-cli-load").toString

    Grow.main(Array("graft.tools.PapersProvider", storeRoot, "paper"))
    val store = new VersionStore(storeRoot, spark)
    assert(store.currentVersion("paper").exists(_.version === 1))
    assert(store.readCollection("paper", 1, "paper").count() === 20)

    Dump.main(Array(storeRoot, "paper", dumpDir))
    assert(Files.isDirectory(java.nio.file.Paths.get(dumpDir, "paper")))

    Load.main(Array(dumpDir, loadRoot, "paper"))
    val loaded = new VersionStore(loadRoot, spark)
    assert(loaded.currentVersion("paper").exists(_.version === 1))
    val docs = loaded.readCollection("paper", 1, "paper")
    assert(docs.count() === 20)
    // round-trip preserves document content
    val orig = store.readCollection("paper", 1, "paper")
      .select("identity", "properties").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val back = docs.select("identity", "properties").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back === orig)
  }

  test("Grow honors --strategy and --limit overrides; frozen regrow fails loudly") {
    val storeRoot = Files.createTempDirectory("graft-cli-store2").toString
    Grow.main(Array("graft.tools.PapersProvider", storeRoot, "paper", "--strategy",
      GrowthStrategy.Reset))
    Grow.main(Array("graft.tools.PapersProvider", storeRoot, "paper", "--strategy",
      GrowthStrategy.Reset))
    val store = new VersionStore(storeRoot, spark)
    assert(store.currentVersion("paper").exists(_.version === 2), "reset regrows a new version")
    intercept[graft.pipeline.DGGrowthFrozen] {
      Grow.main(Array("graft.tools.PapersProvider", storeRoot, "paper"))
    }
  }

  test("DataStorages resolves registered labels (case-insensitive) and drives the CLI by label") {
    DataStorages.reset()
    try {
      DataStorages.register("articles.Paper", PapersProvider)
      val storages = DataStorages.fromLabel("ARTICLES.paper")
      assert(storages.provider eq PapersProvider)
      assert(storages.spec.name === "papers")
      assert(storages.collections.map(_.collection.name) === Seq("paper"))
      val loaded = DataStorages.loadInstances("articles.Paper", "/some/store")
      assert(loaded.storeRoot === Some("/some/store"))
      // the Grow main resolves the label through the same registry —
      // grow_dataset <label> parity, not just a lookup API
      val storeRoot = Files.createTempDirectory("graft-cli-label").toString
      Grow.main(Array("articles.Paper", storeRoot, "paper"))
      assert(new VersionStore(storeRoot, spark)
        .currentVersion("paper").exists(_.version === 1))
    } finally DataStorages.reset()
  }

  test("DataStorages falls back to dotted class names; unresolvable labels fail loudly") {
    DataStorages.reset()
    val viaClass = DataStorages.fromLabel("graft.tools.PapersProvider")
    assert(viaClass.spec.name === "papers")
    intercept[IllegalArgumentException] {
      DataStorages.fromLabel("no.such.Label")
    }
  }
}
