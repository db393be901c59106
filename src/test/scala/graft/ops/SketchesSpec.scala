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
}
