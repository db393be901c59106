package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ran to the park", "en"),
    (3L, "der hund lief zum park", "de"),
    (4L, "die katze sitzt auf der matte", "de"),
    (5L, "the cat and the dog", "en"),
    (6L, "", "en") // zero tokens
  ).toDF("doc_id", "text", "lang")

  test("dsirLogWeights: target-like docs outweigh off-target docs; zero-token row is explicit") {
    val out = Selection.dsirLogWeights(docs, docs.filter($"lang" === "en"),
      "doc_id", "text").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out.size === 6, "every raw doc surfaces exactly once")
    assert(out(6L) === ((0L, None)), "zero-token doc: n_tokens 0, null weight")
    // English tokens dominate the target distribution; German tokens
    // appear in raw but (almost) never in target
    val en = out(1L)._2.get
    val de = out(3L)._2.get
    assert(en > de, s"English doc weight $en must exceed German $de")
    assert(out(1L)._1 === 6L, "n_tokens counts occurrences, not distincts")
  }

  test("dsirLogWeights is partitioning-invariant") {
    val a = Selection.dsirLogWeights(docs, docs.filter($"lang" === "en"),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Selection.dsirLogWeights(docs.repartition(7),
      docs.filter($"lang" === "en").repartition(3),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("dsirSelect: deterministic top-n by (weight desc, id), nulls excluded") {
    val top = Selection.dsirSelect(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", n = 3).collect()
    assert(top.length === 3)
    val ws = top.map(_.getDouble(2))
    assert(ws.sameElements(ws.sortBy(-(_: Double))), "descending weight order")
    assert(!top.map(_.getLong(0)).contains(6L), "null-weight doc never selected")
    val plan = Selection.dsirSelect(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", n = 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-n is a per-partition heap, never a global sort")
  }

  test("naiveBayes: separable classes classify correctly; OOV doc scores prior alone") {
    val train = Seq(
      (10L, "good clean prose text", true),
      (11L, "good clear prose words", true),
      (12L, "spam spam buy now", false),
      (13L, "buy spam click now", false),
      (14L, "good text here", true) // 3 pos vs 2 neg docs -> prior > 0
    ).toDF("doc_id", "text", "y")
    val (model, prior) = Selection.naiveBayesTrain(train, "y", "text")
    val p = prior.head
    assert(p.getAs[Long]("d_pos") === 3L && p.getAs[Long]("d_neg") === 2L)
    val priorPico = p.getAs[Long]("prior_pico")
    assert(priorPico > 0L, "majority-positive prior is positive log-odds")
    val test = Seq(
      (20L, "clean prose text"),
      (21L, "buy spam now"),
      (22L, "zzz qqq www") // fully out-of-vocabulary
    ).toDF("doc_id", "text")
    val scored = Selection.naiveBayesScore(test, model, prior, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(scored(20L)._3 === true, "prose doc predicted positive")
    assert(scored(21L)._3 === false, "spam doc predicted negative")
    assert(scored(22L)._1 === 0L, "OOV doc matched zero vocab tokens")
    assert(math.abs(scored(22L)._2 - priorPico / 1e12) < 1e-6,
      "OOV doc's log-odds IS the prior")
  }

  test("naiveBayesScore is occurrence-counted, not membership") {
    val train = Seq((1L, "good", true), (2L, "bad", false)).toDF("doc_id", "text", "y")
      .union(Seq((3L, "good good", true)).toDF("doc_id", "text", "y"))
    val (model, prior) = Selection.naiveBayesTrain(train, "y", "text")
    val s = Selection.naiveBayesScore(
      Seq((9L, "good good good")).toDF("doc_id", "text"), model, prior,
      "doc_id", "text").head
    assert(s.getLong(1) === 3L, "three occurrences of one vocab token")
  }

  test("snakeShards: valid range, exact snake order, balanced totals") {
    val sized = (0L until 64L).map(i => (i, ("tk " * (1 + (i % 13).toInt)).trim))
      .toDF("doc_id", "text")
    val out = Selection.snakeShards(sized, "doc_id", "text", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 64)
    assert(out.forall(t => t._3 >= 0 && t._3 < 4))
    // reference snake computed locally from the same (n desc, id) order
    val ranked = out.sortBy(t => (-t._2, t._1)).zipWithIndex
    val expect = ranked.map { case ((id, _, _), rk) =>
      id -> (if ((rk / 4) % 2 == 0) rk % 4 else 3 - rk % 4).toLong
    }.toMap
    out.foreach { case (id, _, sh) => assert(sh === expect(id), s"doc $id") }
    // balance: totals within one max-doc of each other
    val totals = out.groupBy(_._3).map(_._2.map(_._2).sum)
    val maxDoc = out.map(_._2).max
    assert(totals.max - totals.min <= maxDoc,
      s"shard totals $totals spread within one max doc ($maxDoc)")
  }

  test("snakeShards is partitioning-invariant and window-free") {
    val sized = (0L until 40L).map(i => (i, ("w " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "text")
    val a = Selection.snakeShards(sized, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    val b = Selection.snakeShards(sized.repartition(9), "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val plan = Selection.snakeShards(sized, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "rank must come from the two-pass zip, not a global window")
  }

  test("crossContamination: exact copy collides, unrelated doc does not, zero rows explicit") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "totally different words nothing shared here at all ok")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val out = Dedup.crossContamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size === 3, "every corpus doc has a row")
    assert(out(1L)._2 && out(1L)._1 >= 1L, "identical doc is contaminated")
    assert(out(2L)._2, "identical doc is contaminated")
    assert(!out(3L)._2 && out(3L)._1 === 0L, "unrelated doc has an explicit zero row")
  }

  test("crossContamination plan broadcasts the benchmark side") {
    val corpus = (0L until 50L).map(i => (i, s"corpus doc $i alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "bench doc alpha beta gamma delta")).toDF("doc_id", "text")
    val plan = Dedup.crossContamination(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bench bucket probe must be a broadcast join, never a corpus shuffle")
  }
}
