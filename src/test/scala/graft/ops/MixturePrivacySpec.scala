package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MixturePrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = ((0 until 900).map(i => (i.toLong, "big")) ++
    (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "dom")

  test("mixtureSample: alpha=1 preserves the natural mix, alpha=0 flattens toward uniform") {
    def mix(alpha: Double): Map[String, Long] =
      Curation.mixtureSample(corpus, "dom", "id", alpha, targetRows = 200)
        .groupBy("dom").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
    val natural = mix(1.0)
    // alpha=1: rate identical for every domain (target/n) -> ~9:1 mix
    assert(natural("big").toDouble / natural("small") > 4.0,
      s"natural mix should stay big-heavy, got $natural")
    val flat = mix(0.0)
    // alpha=0: expected 100 rows per domain; small (100 rows) keeps ~all
    assert(flat("small") > 60, s"flattened mix should lift the rare domain, got $flat")
    assert(math.abs(flat("big") - flat("small")) < flat("big"),
      s"flattened mix should be far from 9:1, got $flat")
  }

  test("mixtureSample is a pure function of the id: repeatable under repartition") {
    val a = Curation.mixtureSample(corpus, "dom", "id", 0.5, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(corpus.repartition(13), "dom", "id", 0.5, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("kAnonymize: drops quasi-groups smaller than k, keeps payload rows intact") {
    val df = Seq(
      ("a", 1, "p1"), ("a", 1, "p2"), ("a", 1, "p3"),
      ("b", 2, "p4"), ("b", 2, "p5"),
      ("c", 3, "p6")).toDF("q1", "q2", "payload")
    val kept = Curation.kAnonymize(df, Seq("q1", "q2"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(kept === Set(("a", "p1"), ("a", "p2"), ("a", "p3"),
      ("b", "p4"), ("b", "p5")))
    val all = Curation.kAnonymize(df, Seq("q1"), k = 1).count()
    assert(all === 6L, "k=1 suppresses nothing")
  }
}
