package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("KMV estimate lands near the true distinct count; exact below k") {
    val df = (0L until 5000L).map(i => i % 1000).toDF("v")
    val est = Sketches.kmvDistinct(df, "v", k = 64).head.getDouble(2)
    assert(est > 500 && est < 2000, s"k=64 estimate of 1000 distinct, got $est")
    val small = (0L until 10L).toDF("v")
    val exact = Sketches.kmvDistinct(small, "v", k = 64).head.getDouble(2)
    assert(exact === 10.0, "below k the sketch IS the exact count")
  }

  test("KMV is partitioning-invariant (pure function of the value set)") {
    val df = (0L until 3000L).map(i => i % 700).toDF("v")
    val a = Sketches.kmvDistinct(df, "v", 32).head
    val b = Sketches.kmvDistinct(df.repartition(13), "v", 32).head
    assert(a === b)
  }

  test("native KMV aggregate == relational distinct+limit form (incl. below-k and nulls)") {
    val df = (0L until 4000L).map(i => i % 900).toDF("v")
      .union(Seq[Option[Long]](None, None).toDF("v"))
    for (k <- Seq(16, 64, 1024)) { // 1024 > distinct count: exact path
      val native = Sketches.kmvDistinct(df, "v", k).head
      val relational = Sketches.kmvDistinctRelational(df, "v", k).head
      assert(native === relational, s"k=$k")
    }
  }

  test("native KMV plan is one aggregation — no distinct exchange of the hash set") {
    val df = (0L until 2000L).toDF("v")
    val p = Sketches.kmvDistinct(df, "v", 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_kmv_mins"), "the native aggregate must plan")
    assert(!p.contains("TakeOrderedAndProject"), "no k-minimum sort pass")
    // exactly one shuffle: the partial->final aggregate boundary
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"one exchange expected (partial sketches -> merge), got:\n$p")
  }

  test("weighted sample prefers heavy weights and is deterministic") {
    val docs = (0L until 400L).map(i =>
      (i, if (i < 40) 1000L else 1L)).toDF("doc_id", "w") // 10% heavy
    val sample = Sketches.weightedSample(docs, "doc_id", "w", n = 30)
      .collect().map(_.getLong(0)).toSet
    val heavy = sample.count(_ < 40L)
    assert(heavy >= 20, s"1000× weights should dominate the sample, got $heavy/30")
    val again = Sketches.weightedSample(docs.repartition(7), "doc_id", "w", n = 30)
      .collect().map(_.getLong(0)).toSet
    assert(sample === again)
  }

  test("contiguousIds: a permutation of 0..n-1 matching the sort order, no global window") {
    val df = (0L until 500L).map(i => (i, s"k-${(i * 7919) % 500}%04d")).toDF("id", "key")
    val out = Sketches.contiguousIds(df, "key", partitions = 7)
    val rows = out.select("row_ix", "key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._1).sorted.toSeq === (0L until 500L))
    assert(rows.sortBy(_._1).map(_._2).toSeq === rows.map(_._2).sorted.toSeq,
      "ids follow the key order")
    val again = Sketches.contiguousIds(df.repartition(11), "key", partitions = 7)
      .select("row_ix", "key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows.toSet === again)
  }

  test("weightedSampleGrouped: n per group, global-sample consistency, weight bias") {
    val df = (0L until 600L)
      .map(i => (i, s"g${i % 3}", if (i % 2 == 0) 1000L else 1L))
      .toDF("id", "g", "w")
    val out = Sketches.weightedSampleGrouped(df, "g", "id", "w", nPerGroup = 20)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getAs[Long]("rank")))
    val byGroup = out.groupBy(_._1)
    assert(byGroup.keySet === Set("g0", "g1", "g2"))
    byGroup.values.foreach { rows =>
      assert(rows.length === 20, "exactly n per stratum")
      assert(rows.map(_._3).sorted.toSeq === (1L to 20L), "ranks contiguous")
    }
    // heavy weights dominate: 1000-vs-1 weights should hand nearly all
    // slots to even ids
    val evens = out.count(_._2 % 2 == 0)
    assert(evens >= 55, s"weight-1000 rows must dominate the 60 slots, got $evens")
    // a single-group frame reproduces the GLOBAL sampler exactly (same
    // keys, same tie-break): stratified with one stratum == weightedSample
    val one = df.filter($"g" === "g1")
    val strat = Sketches.weightedSampleGrouped(one, "g", "id", "w", 15)
      .collect().map(_.getLong(0)).toSet
    val glob = Sketches.weightedSample(one, "id", "w", 15)
      .collect().map(_.getLong(0)).toSet
    assert(strat === glob)
  }

  test("grouped KMV sketches: bounded ascending min-sets, exact below k") {
    val df = (0L until 3000L)
      .map(i => (s"src${i % 3}", i % (100 * (i % 3 + 1))))
      .toDF("g", "v")
    val out = Sketches.kmvSketchGrouped(df, "g", "v", k = 32)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3), r.getDouble(4)))).toMap
    assert(out.keySet === Set("src0", "src1", "src2"))
    out.values.foreach { case (n, mins, _) =>
      assert(n <= 32 && mins.length === n, "buffer bounded by k")
      assert(mins === mins.sorted, "min-set is ascending")
    }
    // a group with < k distinct values reports the exact count
    val small = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 5L)).toDF("g", "v")
    val ex = Sketches.kmvSketchGrouped(small, "g", "v", k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(ex === Map("a" -> 2.0, "b" -> 1.0))
  }

  test("merged sketches == direct single-pass sketch, field for field") {
    val df = (0L until 5000L)
      .map(i => (s"src${i % 7}", (i * 31) % 1200))
      .toDF("g", "v")
    val direct = Sketches.kmvDistinct(df, "v", k = 64).head
    val merged = Sketches.kmvMergeSketches(
      Sketches.kmvSketchGrouped(df, "g", "v", k = 64), k = 64).head
    // (k, kth_hash, estimate) vs (k, n_mins, kth_hash, estimate)
    assert(merged.getAs[Long]("kth_hash") === direct.getAs[Long]("kth_hash"),
      "the union's k smallest survive the per-group cut — merge is lossless")
    assert(merged.getAs[Double]("estimate") === direct.getAs[Double]("estimate"))
    assert(merged.getAs[Long]("n_mins") === 64L)
  }

  test("HLL: merged registers == direct single-pass registers, estimate near truth") {
    val df = (0L until 6000L)
      .map(i => (s"src${i % 5}", (i * 17) % 1500))
      .toDF("g", "v")
    val direct = Sketches.hllSketchGrouped(
      df.withColumn("g", lit("all")), "g", "v", p = 6).head
    val merged = Sketches.hllMergeSketches(
      Sketches.hllSketchGrouped(df, "g", "v", p = 6), p = 6).head
    assert(merged.getSeq[Int](2) === direct.getSeq[Int](3),
      "elementwise-max merge must reproduce the single-pass registers")
    assert(merged.getAs[Double]("estimate") === direct.getAs[Double]("estimate"))
    val est = merged.getAs[Double]("estimate")
    // standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(est > 1500 * 0.6 && est < 1500 * 1.4,
      s"p=6 estimate of 1500 distinct, got $est")
  }

  test("HLL: registers dense and bounded, linear counting below 2.5m, partition-invariant") {
    val out = Sketches.hllSketchGrouped(
      (0L until 100L).map(i => ("a", i % 20)).toDF("g", "v"), "g", "v", p = 6).head
    val regs = out.getSeq[Int](3)
    assert(regs.length === 64, "dense 2^p register array")
    assert(regs.forall(r => r >= 0 && r <= 55), "rho bounded by hash width")
    assert(out.getAs[Long]("v_zero") === regs.count(_ == 0).toLong)
    // 20 distinct << 2.5*64: the linear-counting branch must engage —
    // m*ln(m/V) is exact-ish at this density
    val v = out.getAs[Long]("v_zero")
    val expected = BigDecimal(java.math.BigDecimal.valueOf(64.0 * math.log(64.0 / v)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("estimate") === expected)
    val again = Sketches.hllSketchGrouped(
      (0L until 100L).map(i => ("a", i % 20)).toDF("g", "v").repartition(11),
      "g", "v", p = 6).head
    assert(again.getSeq[Int](3) === regs, "pure function of the value set")
  }

  test("count-min: estimate >= true always, exact for unique-bucket rows, merge == direct") {
    val df = (0L until 4000L).map(i => (s"s${i % 3}", s"tok${i % 50}")).toDF("g", "v")
    val merged = Sketches.cmMergeSketches(
      Sketches.cmSketchGrouped(df, "g", "v", depth = 4, width = 64))
    val direct = Sketches.cmSketchGrouped(
      df.withColumn("g", lit("all")), "g", "v", depth = 4, width = 64)
      .select("i", "bucket", "cnt")
    assert(merged.collect().toSet === direct.collect().toSet,
      "cell-wise sum of shard sketches == direct global sketch")
    val queries = (0 until 50).map(i => s"tok$i").toDF("v")
    val est = Sketches.cmPointEstimate(merged, queries, "v", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every tok appears exactly 80 times; CM guarantees est >= true
    assert(est.size === 50)
    est.foreach { case (tok, e) => assert(e >= 80L, s"$tok under-estimated: $e") }
    // 50 values over 4x64 cells: most rows see collisions, but the MIN
    // across 4 independent rows should be exact for a majority
    assert(est.values.count(_ == 80L) >= 25,
      s"min-of-4-rows should be exact for most tokens, got ${est.values.count(_ == 80L)}")
    // duplicate query rows are PRESERVED (surrogate-keyed fold-back):
    // a value-keyed groupBy would collapse them and the output row
    // count would silently diverge from the input
    val dup = Seq("tok1", "tok1", "tok2").toDF("v")
    val dupEst = Sketches.cmPointEstimate(merged, dup, "v", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(dupEst.length === 3, s"row multiplicity preserved: ${dupEst.toSeq}")
    assert(dupEst.count(_._1 == "tok1") === 2)
  }

  test("KMV pairwise Jaccard: exact when the union fits k, near-truth when sampled") {
    // A = 0..999, B = 500..1499, C = 0..99: J(A,B) = 1/3, J(A,C) = 0.1
    val df = ((0L until 1000L).map(("a", _)) ++
      (500L until 1500L).map(("b", _)) ++
      (0L until 100L).map(("c", _))).toDF("g", "v")
    val sk = Sketches.kmvSketchGrouped(df, "g", "v", k = 256)
    val est = Sketches.kmvPairwiseJaccard(sk, k = 256, groupCol = "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4)))).toMap
    val (dAB, jAB) = est(("a", "b"))
    assert(dAB === 256L, "union of 1500 values saturates the k-sample")
    assert(math.abs(jAB - 1.0 / 3.0) < 0.12,
      s"sampled estimate of J=1/3, got $jAB") // se ~ sqrt(J(1-J)/k) ≈ 0.03
    val (dAC, jAC) = est(("a", "c"))
    assert(dAC === 256L && math.abs(jAC - 0.1) < 0.08, s"J(A,C)=0.1, got $jAC")
    // exact regime: |A ∪ C'| <= k for tiny sets
    val tiny = ((0L until 30L).map(("x", _)) ++ (20L until 50L).map(("y", _)))
      .toDF("g", "v")
    val te = Sketches.kmvPairwiseJaccard(
        Sketches.kmvSketchGrouped(tiny, "g", "v", k = 256), 256, "g")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).head
    assert(te === ((50L, 10L, 0.2)), "union 50 <= k: the estimate IS exact")
    // pure function of the value sets
    val again = Sketches.kmvPairwiseJaccard(
        Sketches.kmvSketchGrouped(df.repartition(13), "g", "v", 256), 256, "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(again(("a", "b")) === jAB && again(("a", "c")) === jAC)
  }

  test("sketch merge touches only sketch rows — no corpus re-scan in the plan") {
    val df = (0L until 2000L).map(i => (s"s${i % 4}", i % 300)).toDF("g", "v")
    val sketches = Sketches.kmvSketchGrouped(df, "g", "v", k = 16)
      .select("g", "mins").cache()
    sketches.count()
    val p = Sketches.kmvMergeSketches(sketches, k = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), "merge reads the sketch frame")
    assert(!p.contains("FileScan") && p.contains("graft_kmv_mins"),
      "never the underlying corpus")
    sketches.unpersist(blocking = false)
  }
}
