package graft.model

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Configuration
import graft.pipeline.{Harvest, HarvestPhase, ProcessorRegistry}
import graft.sources.Shell

/** Specs for annotations joins, harvest registry, shell kernel and
  * dump/load — the remaining SURVEY §2 surface. */
class AnnotationsSpec extends SparkTestBase {
  import spark.implicits._

  val spec = CollectionSpec("ann", identifier = Some("id"), referee = Some("id"))
  def docs() = CollectionOps.add(Documents.empty(spark),
    Documents.fromJsonSeq(spark, (0 until 6).map(i => s"""{"id":$i}""")), spec)

  test("semi-join scopes annotations to collection refs (collection.py:34-37)") {
    var ann = Annotations.empty(spark)
    ann = Annotations.annotate(ann, "u1", "2", "quality", 0.9)
    ann = Annotations.annotate(ann, "u1", "99", "quality", 0.1) // not in collection
    val scoped = Annotations.forCollection(ann, docs())
    assert(scoped.count() === 1)
    assert(scoped.head.getAs[String]("reference") === "2")
  }

  test("annotate routes EVERY numeric width to the value column (views.py isinstance(int, float) gate)") {
    var ann = Annotations.empty(spark)
    ann = Annotations.annotate(ann, "u1", "1", "score", 0.5f) // Float
    ann = Annotations.annotate(ann, "u1", "2", "score", 3: Short)
    ann = Annotations.annotate(ann, "u1", "3", "score", BigDecimal("2.25"))
    ann = Annotations.annotate(ann, "u1", "4", "score", "text")
    val byRef = ann.collect()
      .map(r => r.getAs[String]("reference") ->
        ((Option(r.getAs[java.lang.Double]("value")), r.getAs[String]("string"))))
      .toMap
    assert(byRef("1") === ((Some(0.5), null)))
    assert(byRef("2") === ((Some(3.0), null)))
    assert(byRef("3") === ((Some(2.25), null)))
    assert(byRef("4") === ((None, "text")))
  }

  test("anti-join candidates exclude annotated refs, page-limited (views.py:122-131)") {
    var ann = Annotations.empty(spark)
    ann = Annotations.annotate(ann, "u1", "0", "quality", 1.0)
    ann = Annotations.annotate(ann, "u1", "1", "quality", 0.5)
    val cand = Annotations.candidates(docs(), ann, "quality", pageSize = 3)
    assert(cand.count() === 3)
    val refs = cand.select("reference").collect().map(_.getString(0)).toSet
    assert(!refs.contains("0") && !refs.contains("1"))
  }

  test("annotate upserts by (user, reference, name); float vs string values (base.py:11-12)") {
    var ann = Annotations.empty(spark)
    ann = Annotations.annotate(ann, "u1", "3", "quality", 0.5)
    ann = Annotations.annotate(ann, "u1", "3", "quality", 0.8) // replace
    ann = Annotations.annotate(ann, "u1", "3", "note", "fine") // string value
    assert(ann.count() === 2)
    val q = ann.filter(col("name") === "quality").head
    assert(q.getAs[Double]("value") === 0.8)
    val n = ann.filter(col("name") === "note").head
    assert(n.getAs[String]("string") === "fine")
    assert(n.isNullAt(n.fieldIndex("value")))
  }
}

class HarvestSpec extends SparkTestBase {

  val spec = CollectionSpec("harvest", identifier = Some("id"))

  test("registry resolves Class.method strings; phases chain in order (base.py:29-95)") {
    ProcessorRegistry.register("MockNumberProcessor.number_documents") { (df, _) =>
      // The reference numbers documents sequentially during harvest
      // (processors/output.py:21-27).
      import org.apache.spark.sql.expressions.Window
      df.withColumn("task_results", call_function("graft_json_merge", col("task_results"),
        concat(lit("""{"number":{"success":true,"n":"""),
          row_number().over(Window.orderBy(col("id"))).cast("string"), lit("}}"))))
    }
    ProcessorRegistry.register("MockFilterProcessor.filter_documents") { (df, config) =>
      df.filter(graft.functions.GraftFunctions.reach(col("properties"), "$.keep") ===
        config.getString("keep_value"))
    }
    val docs = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark,
        Seq("""{"id":1,"keep":"y"}""", """{"id":2,"keep":"n"}""", """{"id":3,"keep":"y"}""")), spec)
    val out = Harvest.run(docs, Seq(
      HarvestPhase("MockNumberProcessor.number_documents"),
      HarvestPhase("MockFilterProcessor.filter_documents",
        Configuration("harvest", Map("keep_value" -> "y")))))
    assert(out.count() === 2)
    assert(out.filter(col("task_results").contains("\"number\"")).count() === 2)
    intercept[IllegalArgumentException](
      Harvest.run(docs, Seq(HarvestPhase("Nope.missing"))))
  }
}

class ShellSpec extends SparkTestBase {
  import spark.implicits._

  test("command template fill + sorted flags (shell/generic.py:192-226)") {
    assert(Shell.buildCommand(Seq("tika", "-t", "{}"), Seq("/p/file"),
      Map("--b" -> "2", "--a" -> "1")) === Seq("tika", "-t", "/p/file", "--a=1", "--b=2"))
  }

  test("runWithCache executes misses, caches hits (shell cache key = sorted argv + stdin)") {
    val cmds = Seq(
      (Seq("echo", "hello"), ""),
      (Seq("echo", "world"), "")).toDF("cmd", "stdin")
    val first = Shell.runWithCache(cmds, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Shell.schema))
    assert(first.count() === 2)
    assert(first.filter(col("status") === 0).count() === 2)
    val outs = first.select("stdout").collect().map(_.getString(0).trim).toSet
    assert(outs === Set("hello", "world"))
    // feed back as cache → all hits
    val second = Shell.runWithCache(cmds, first.select(Shell.schema.fieldNames.map(col): _*))
    assert(second.filter(col("from_cache")).count() === 2)
  }

  test("tika content post-processing stamps resourcePath (tika.py:44-56)") {
    val out = Shell.tikaContent("""[{"X-TIKA:content":"text"}]""", "/p/doc.pdf")
    assert(out.contains(""""resourcePath":"/p/doc.pdf""""))
    assert(Shell.tikaContent("not json", "/p") === null)
  }
}

class DumpIOSpec extends SparkTestBase {

  val spec = CollectionSpec("dump", identifier = Some("id"))

  test("diffSnapshots classifies added/removed/changed/unchanged, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val prev = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None: Option[String], 30L)).toDF("id", "t", "n")
    val next = Seq((1L, Some("a"), 10L), (2L, Some("B"), 20L),
      (4L, Some("d"), 40L), (3L, None: Option[String], 30L)).toDF("id", "t", "n")
    val d = DumpIO.diffSnapshots(prev, next, "id", Seq("t", "n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"))
    val d2 = DumpIO.diffSnapshots(next, prev, "id", Seq("t", "n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2(4L) === "removed")
    // a null vs the empty string must NOT collide (the sentinel's job)
    val p3 = Seq((9L, None: Option[String])).toDF("id", "t")
    val n3 = Seq((9L, Some(""))).toDF("id", "t")
    assert(DumpIO.diffSnapshots(p3, n3, "id", Seq("t"))
      .head.getString(1) === "changed")
  }

  test("collection content to file is a JSON array ordered by id (collection.py:359-361)") {
    val docs = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, Seq("""{"id":1,"t":"a"}""", """{"id":2,"t":"b"}""")), spec)
    val path = Files.createTempDirectory("graft-io").resolve("col.json").toString
    DumpIO.collectionContentToFile(docs, path)
    val content = Files.readString(java.nio.file.Paths.get(path))
    assert(content.startsWith("[{"))
    assert(content.indexOf("\"t\":\"a\"") < content.indexOf("\"t\":\"b\""))
  }

  test("documents round-trip through dump/load; replace and upsert modes (dataset.py:380-465)") {
    val docs = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, Seq("""{"id":1,"t":"a"}""", """{"id":2,"t":"b"}""")), spec)
    val dir = Files.createTempDirectory("graft-io").toString
    DumpIO.dumpDocuments(docs, dir)
    val replaced = DumpIO.loadDocuments(spark, dir)
    assert(replaced.count() === 2)
    assert(replaced.schema.fieldNames.toSeq === Documents.schema.fieldNames.toSeq)
    assert(replaced.schema.map(_.dataType) === Documents.schema.map(_.dataType))
    // upsert mode: dump merges into an existing frame by identity
    val existing = CollectionOps.add(Documents.empty(spark),
      Documents.fromJsonSeq(spark, Seq("""{"id":2,"t":"OLD"}""", """{"id":9,"t":"z"}""")), spec)
    val merged = DumpIO.loadDocuments(spark, dir, Some(existing), replace = false, spec)
    assert(merged.count() === 3)
    val t2 = merged.filter(col("identity") === "2").head.getAs[String]("properties")
    assert(t2.contains("\"t\":\"b\""), "dump value wins on upsert")
  }
}
