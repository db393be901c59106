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
    // null-labeled rows are DROPPED, not trained as negatives: the
    // prior and token counts must match the fully-labeled run exactly
    val withNulls = train
      .select(col("doc_id"), col("text"), col("y").cast("boolean").as("y"))
      .unionByName(Seq((99L, "mystery unlabeled words"))
        .toDF("doc_id", "text")
        .withColumn("y", lit(null).cast("boolean")))
    val (modelN, priorN) = Selection.naiveBayesTrain(withNulls, "y", "text")
    val pN = priorN.head
    assert(pN.getAs[Long]("d_pos") === 3L && pN.getAs[Long]("d_neg") === 2L,
      "an unlabeled doc must not count as a negative in the prior")
    assert(modelN.collect().toSet === model.collect().toSet,
      "unlabeled tokens must not train the negative class")
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

  test("globalShuffle: a seeded bijection onto [0, n), layout-independent, seed-sensitive") {
    val ids = (0L until 200L).map(i => Tuple1(i)).toDF("doc_id")
    val a = Selection.globalShuffle(ids, "doc_id", seed = 7L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(a.values.toSeq.sorted === (0L until 200L), "positions are exactly 0..n-1")
    // physical layout must not matter: the permutation is a pure
    // function of (id, seed)
    val b = Selection.globalShuffle(ids.repartition(13), "doc_id", seed = 7L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(a === b, "same seed + same ids => identical permutation")
    val c = Selection.globalShuffle(ids, "doc_id", seed = 8L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    assert(a !== c, "a different seed re-draws the permutation")
    // it actually shuffles: identity order would be astronomical luck
    assert((0L until 200L).count(i => a(i) == i) < 10, "not the identity permutation")
  }

  test("globalShuffle carries payload columns through") {
    val docs = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val out = Selection.globalShuffle(docs, "doc_id", seed = 1L)
    assert(out.columns.sorted.toSeq === Seq("doc_id", "pos", "text"))
    assert(out.count() === 2L)
  }

  test("mortonKey: known interleavings and the 16-bit mask") {
    val rows = Seq((0L, 0L), (3L, 5L), (65535L, 0L), (0L, 65535L),
        (65535L, 65535L), (65536L + 3L, 5L))
      .toDF("x", "y")
      .select(Selection.mortonKey(col("x"), col("y")).as("m"))
      .collect().map(_.getLong(0))
    // morton(3, 5): x bits at even positions (1,1,0), y at odd (1,0,1)
    // -> 0b100111 = 39
    assert(rows(0) === 0L)
    assert(rows(1) === 39L)
    assert(rows(2) === 0x55555555L, "x fills the even bits")
    assert(rows(3) === 0xAAAAAAAAL, "y fills the odd bits")
    assert(rows(4) === 0xFFFFFFFFL)
    assert(rows(5) === 39L, "inputs are masked to 16 bits")
  }

  test("zorderStats: every bucket envelope fits its 2^(b-bits/2) tile") {
    // 6-bit dims, 12-bit key, 16 buckets -> each bucket is one
    // 16x16 (x, y) tile: envelope width <= 15 on BOTH dims
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val st = Selection.zorderStats(grid, col("x"), col("y"),
        bucketBits = 4, keyBits = 12).collect()
    assert(st.length === 16, "full grid occupies all 16 tiles")
    st.foreach { r =>
      assert(r.getAs[Long]("n") === 256L, "each tile holds 16x16 cells")
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") === 15L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") === 15L)
    }
    // contrast: bucketing the same grid on x alone leaves y unbounded
    // (the envelope Z-order tightens) — computed, not asserted folklore
    val naive = grid.groupBy((col("x") / 16).cast("long").as("bucket"))
      .agg(max(col("y")).minus(min(col("y"))).as("yw")).collect()
    assert(naive.forall(_.getAs[Long]("yw") === 63L),
      "1-D layout cannot bound the second dimension")
  }

  test("zorderRepartition range-partitions on the morton key") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val out = Selection.zorderRepartition(grid, col("x"), col("y"), 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"z-order write path is a range exchange on the key: ${plan.take(400)}")
    assert(out.count() === 1024L)
    assert(!out.columns.contains("__z"), "the key column is internal")
  }

  test("lshAudit: counts consistent, nested band configs give nested candidate sets") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"),
      (5L, "totally different content with no overlap whatsoever at all")
    ).toDF("doc_id", "text")
    val out = Dedup.lshAudit(docs, "doc_id", "text",
        k = 16, bandConfigs = Seq(2, 4, 8), threshold = 0.5)
      .collect().map(r => r.getAs[Long]("bands") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_true"),
          r.getAs[Long]("n_hits")))).toMap
    assert(out.keySet === Set(2L, 4L, 8L), "every configured row present")
    out.values.foreach { case (cand, truth, hits) =>
      assert(hits <= math.min(cand, truth), "hits bound by both sets")
    }
    assert(out(2L)._2 === out(4L)._2 && out(4L)._2 === out(8L)._2,
      "ground truth is config-independent")
    // contiguous band slices nest: an 8-row band agreement implies both
    // 4-row halves agree, which implies all four 2-row quarters agree
    assert(out(2L)._1 <= out(4L)._1 && out(4L)._1 <= out(8L)._1,
      "fewer bands (more rows per band) is strictly no more permissive")
    assert(out(2L)._3 <= out(4L)._3 && out(4L)._3 <= out(8L)._3)
  }

  test("lshAudit: a config with zero candidates still surfaces (null prec, not absence)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val rows = Dedup.lshAudit(docs, "doc_id", "text", k = 16,
        bandConfigs = Seq(2), threshold = 0.9).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_candidates") === 0L)
    assert(r.isNullAt(r.fieldIndex("prec")), "0/0 precision is null, not 1.0")
  }

  test("invertedIndex: gaps reconstruct exactly; blocks bound group size; minDf gates globally") {
    val docs = Seq(
      (0L, "common rare0"), (1L, "common x"), (1023L, "common y"),
      (1024L, "common z"), (1025L, "common rare0"), (4000L, "common w")
    ).toDF("doc_id", "text")
    val out = Relevance.invertedIndex(docs, "doc_id", "text", blockBits = 10)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("block")) ->
        ((r.getAs[Long]("df_block"), r.getSeq[Long](3)))).toMap
    // 'common' df=6 splits into blocks 0 (ids 0,1,1023), 1 (1024,1025), 3 (4000)
    assert(out(("common", 0L)) === ((3L, Seq(0L, 1L, 1022L))),
      "block 0: base 0, gaps 0, 1, 1022")
    assert(out(("common", 1L)) === ((2L, Seq(0L, 1L))),
      "block 1: base 1024 -> first gap 0")
    assert(out(("common", 3L)) === ((1L, Seq(928L))), "block 3: 4000 - 3072")
    // reconstruction: base + running sum of gaps = ids
    val (_, gaps) = out(("common", 0L))
    assert(gaps.scanLeft(0L)(_ + _).tail.map(_ + 0L) === Seq(0L, 1L, 1023L))
    // global minDf: 'rare0' (df=2) survives minDf=2 but not minDf=3
    val gated = Relevance.invertedIndex(docs, "doc_id", "text",
        blockBits = 10, minDf = 3L)
      .collect().map(_.getAs[String]("term")).toSet
    assert(gated === Set("common"), "df<3 terms gated by GLOBAL df")
    val kept2 = Relevance.invertedIndex(docs, "doc_id", "text",
        blockBits = 10, minDf = 2L)
      .collect().map(_.getAs[String]("term")).toSet
    assert(kept2 === Set("common", "rare0"))
  }

  test("invertedIndex counts a duplicated term once per doc (postings are distinct)") {
    val docs = Seq((5L, "dup dup dup other")).toDF("doc_id", "text")
    val out = Relevance.invertedIndex(docs, "doc_id", "text", blockBits = 4)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df_block")).toMap
    assert(out("dup") === 1L, "document frequency, not term frequency")
  }
}
