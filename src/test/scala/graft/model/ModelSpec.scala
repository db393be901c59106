package graft.model

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestBase
import graft.core.DocOps

/** Model-layer specs mirroring the reference's own tests
  * (tests/django_project/datatypes/tests/test_document.py and
  * test_collection.py). */
class DocContentSpec extends SparkTestBase {

  test("content strips _keys, injects _id, overlays derivatives first-wins (test_document.test_content)") {
    // Reference fixture doc 1: properties {country, language, value, nested, context, _hidden}
    val props = """{"value":"0","nested":"nested value 0","context":"nested value","_hidden":"secret"}"""
    assert(DocOps.content(props, "{}", 1L) ===
      """{"value":"0","nested":"nested value 0","context":"nested value","_id":1}""")
    val derivs = """{"task_1":{"task_1_result":"test"},"new_context":{"context":"new"}}"""
    assert(DocOps.content(props, derivs, 1L) ===
      """{"value":"0","nested":"nested value 0","context":"new","_id":1,"task_1_result":"test"}""")
  }

  test("derivative key clash: first base wins") {
    val derivs = """{"a":{"k":"first"},"b":{"k":"second"}}"""
    assert(DocOps.content("{}", derivs, 7L) === """{"_id":7,"k":"first"}""")
  }

  test("mergeShallow = python dict.update (position kept, child wins)") {
    assert(DocOps.mergeShallow("""{"a":1,"b":2}""", """{"b":9,"c":3}""") ===
      """{"a":1,"b":9,"c":3}""")
    assert(DocOps.mergeShallow(null, """{"x":1}""") === """{"x":1}""")
  }

  test("applyUpdate invalidates tasks on $-path dependency change (document.py:85-92)") {
    val tasks = """{"t1":{"checks":[],"depends_on":["$.value"]},"t2":{"checks":[],"depends_on":["other"]}}"""
    val results = """{"t1":{"success":true},"t2":{"success":true}}"""
    val derivs = """{"t1":{"out":"x"}}"""
    // value changes → t1 invalidated, t2 untouched
    val (p, r, d, inv) = DocOps.applyUpdate("""{"value":"0"}""", tasks, results, derivs, """{"value":"1"}""")
    assert(p === """{"value":"1"}""")
    assert(r === """{"t2":{"success":true}}""")
    assert(d === "{}")
    assert(inv)
    // same value → nothing invalidated
    val (_, r2, _, inv2) = DocOps.applyUpdate("""{"value":"0"}""", tasks, results, derivs, """{"value":"0"}""")
    assert(r2 === results && !inv2)
    // Python ==: a numerically identical update (1 vs 1.0) is NOT a
    // change — Jackson node equality would type-split and re-queue
    val tasksNum = """{"t1":{"checks":[],"depends_on":["$.n"]}}"""
    val (_, r3, _, inv3) = DocOps.applyUpdate("""{"n":1}""", tasksNum,
      """{"t1":{"success":true}}""", "{}", """{"n":1.0}""")
    assert(r3 === """{"t1":{"success":true}}""" && !inv3)
    // an explicit null dependency equals a missing one (both are
    // Python None through reach)
    val (_, r4, _, inv4) = DocOps.applyUpdate("""{"n":null}""", tasksNum,
      """{"t1":{"success":true}}""", "{}", """{"m":2}""")
    assert(!inv4, "null vs absent dependency is not a change")
    // a REAL numeric change still invalidates
    val (_, _, _, inv5) = DocOps.applyUpdate("""{"n":1}""", tasksNum,
      """{"t1":{"success":true}}""", "{}", """{"n":2}""")
    assert(inv5)
  }
}

class OutputTemplateSpec extends SparkTestBase {
  import OutputTemplate._

  val content = """{"value":"0","nested":"nested value 0","_id":1}"""

  private def one(tplJson: String, replacement: Char = '$'): Row = {
    import spark.implicits._
    Seq(content).toDF("c")
      .select(compileJson(col("c"), tplJson, replacement).as("out"))
      .head
  }

  test("$-path, dict and list templates (test_output_from_content)") {
    assert(one("\"$.value\"").getString(0) === "0")
    assert(one("\"$._id\"").getString(0) === "1")
    assert(one("""["$.value","$.value"]""").getSeq[String](0) === Seq("0", "0"))
    assert(one("""{"value":"$.value"}""").getStruct(0).getString(0) === "0")
  }

  test("replacement character # (seeding form)") {
    assert(one("\"#.value\"", '#').getString(0) === "0")
  }

  test("non-replacement strings and escapes are literals") {
    assert(one("\"value\"").getString(0) === "value")
    assert(one("\"\\\\$.value\"").getString(0) === "$.value") // \-escaped → literal
    assert(one("42").getString(0) === "42")
  }
}

class CollectionOpsSpec extends SparkTestBase {
  import spark.implicits._

  val spec = CollectionSpec("test", identifier = Some("id"), referee = Some("id"))

  def docs(props: String*) = Documents.fromJsonSeq(spark, props)

  test("add: influence stamps identity/reference, ids assigned after max (test_collection.test_add)") {
    val existing = CollectionOps.add(Documents.empty(spark),
      docs("""{"id":1,"w":"a"}""", """{"id":2,"w":"b"}"""), spec)
    assert(existing.count() === 2)
    val rows = existing.select("id", "identity", "reference").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "1", "1"), (2L, "2", "2")))
    val more = CollectionOps.add(existing, docs("""{"id":3,"w":"c"}"""), spec)
    assert(more.select(max("id")).head.getLong(0) === 3L)
  }

  test("add dedupes identical properties in one batch (collection.py:166-175)") {
    val out = CollectionOps.add(Documents.empty(spark),
      docs("""{"id":1}""", """{"id":1}""", """{"id":2}"""), spec)
    assert(out.count() === 2)
  }

  test("add reset drops existing rows (collection.py:146-147)") {
    val first = CollectionOps.add(Documents.empty(spark), docs("""{"id":1}"""), spec)
    val out = CollectionOps.add(first, docs("""{"id":9}"""), spec, reset = true)
    assert(out.select("identity").collect().map(_.getString(0)).toSeq === Seq("9"))
  }

  test("upsert updates matches, inserts misses, multi-target (test_collection update semantics)") {
    val target = CollectionOps.add(Documents.empty(spark),
      docs("""{"id":1,"state":"old","extra":"keep"}""",
           """{"id":1,"state":"old2"}""", // same key → multi-target
           """{"id":2,"state":"old"}"""), spec, dedupe = false)
    val updates = docs("""{"id":1,"state":"new"}""", """{"id":5,"state":"created"}""")
    val out = CollectionOps.upsert(target, updates, "id", spec).cache()
    assert(out.count() === 4) // 2×id=1 updated + id=2 kept + id=5 inserted
    val byIdentity = out.select("identity", "properties").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // multi-target: BOTH id=1 docs got state=new
    val id1 = out.filter(col("identity") === "1").select("properties").collect()
    assert(id1.length === 2)
    id1.foreach(r => assert(r.getString(0).contains("\"state\":\"new\"")))
    // merge keeps non-updated keys
    assert(id1.exists(_.getString(0).contains("\"extra\":\"keep\"")))
    // untouched survives
    assert(byIdentity("2").contains("\"state\":\"old\""))
    // miss inserted with identity stamped
    assert(byIdentity("5").contains("\"state\":\"created\""))
  }

  test("upsert same-key updates apply in order (collection.py:231-255)") {
    val target = CollectionOps.add(Documents.empty(spark), docs("""{"id":1,"v":"a"}"""), spec)
    val updates = docs("""{"id":1,"v":"b"}""", """{"id":1,"v":"c"}""")
    val out = CollectionOps.upsert(target, updates, "id", spec)
    assert(out.filter(col("identity") === "1").head.getAs[String]("properties")
      .contains("\"v\":\"c\""))
  }

  test("upsert orderCol: multi-partition same-key batch applies in DECLARED order; null order raises") {
    import spark.implicits._
    val target = CollectionOps.add(Documents.empty(spark), docs("""{"id":1,"v":"a"}"""), spec)
    // an 8-partition update frame whose partition order INVERTS the
    // declared order — partition-local arrival order (the default
    // monotonically_increasing_id path) would apply "last" first;
    // the explicit order column must win regardless of partitioning
    val updates = Seq(
      ("""{"id":1,"v":"last"}""", 30L), ("""{"id":1,"v":"mid"}""", 20L),
      ("""{"id":1,"v":"first"}""", 10L))
      .toDF("properties", "seq").repartition(8, col("seq")).sortWithinPartitions(desc("seq"))
    val out = CollectionOps.upsert(target, updates, "id", spec,
      orderCol = Some("seq"))
    assert(out.filter(col("identity") === "1").head.getAs[String]("properties")
      .contains("\"v\":\"last\""))
    // null order must raise naming the row, not silently sort first
    val bad = Seq(("""{"id":1,"v":"x"}""", Some(1L)),
      ("""{"id":1,"v":"y"}""", None: Option[Long])).toDF("properties", "seq")
    val e = intercept[Exception] {
      CollectionOps.upsert(target, bad, "id", spec, orderCol = Some("seq"))
        .collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("must be non-null"))
  }

  test("group_by groups documents by property value (test_collection.test_group_by)") {
    val df = CollectionOps.add(Documents.empty(spark),
      docs("""{"id":1,"state":"a"}""", """{"id":2,"state":"b"}""", """{"id":3,"state":"a"}"""), spec)
    val grouped = CollectionOps.groupByProperty(df, "state")
      .orderBy("group_value").collect()
    assert(grouped.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 1L)))
  }

  test("split: exact ceil-sized test/validate sets, remainder train (collection.py:289-308)") {
    val df = CollectionOps.add(Documents.empty(spark),
      docs((1 to 10).map(i => s"""{"id":$i}"""): _*), spec)
    val out = CollectionOps.split(df, 0.8, 0.1, 0.1, seed = 7L)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("test") === 1L && counts("validate") === 1L && counts("train") === 8L)
    // deterministic given seed
    val again = CollectionOps.split(df, 0.8, 0.1, 0.1, seed = 7L)
      .select("identity", "split").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val first = out.select("identity", "split").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(again === first)
  }

  test("collection output vectorizes templates (collection.py:310-324)") {
    val df = CollectionOps.add(Documents.empty(spark),
      docs("""{"id":1,"title":"t1"}""", """{"id":2,"title":"t2"}"""), spec)
    val out = CollectionOps.output(df, """["$.title"]""")
      .collect().map(_.getSeq[String](0))
    assert(out.map(_.head).toSet === Set("t1", "t2"))
  }
}
