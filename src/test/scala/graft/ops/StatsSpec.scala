package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("exactQuantiles matches the brute-force sorted-rank answer, deciles over a shuffled column") {
    val n = 1237
    val vals = (0 until n).map(i => ((i * 7919) % n).toLong)
    val df = vals.toDF("x").repartition(9)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Stats.exactQuantiles(df, "x", qs)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val ix = math.ceil(q * n - 1e-9).toLong - 1
      assert(got(q) === sorted(ix.toInt), s"q=$q")
    }
    assert(got.size === qs.size)
  }

  test("exactQuantiles: rank arithmetic survives q*n landing ulp-above an integer") {
    // 0.1 * 500 = 50.000000000000007 in doubles; exact rank must be 49
    val df = (1L to 500L).toDF("x")
    val got = Stats.exactQuantiles(df, "x", Seq(0.1)).head.getLong(1)
    assert(got === 50L, "ceil(0.1*500)-1 = 49 -> 50 (1-based value)")
  }

  test("exactQuantiles: ties yield the tied value; nulls drop") {
    val df = (Seq.fill(40)(7L) ++ Seq.fill(60)(9L)).toDF("x")
      .union(Seq[Option[Long]](None, None).toDF("x"))
    val got = Stats.exactQuantiles(df, "x", Seq(0.25, 0.75))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(got(0.25) === 7L && got(0.75) === 9L)
  }

  test("groupedQuantiles: per-group brute-force parity, incl. a 1-row group") {
    val rows = (0 until 400).map(i => ("g" + (i % 3), ((i * 7919) % 400).toLong)) :+
      ("solo", 42L)
    val df = rows.toDF("g", "x").repartition(7)
    val qs = Seq(0.25, 0.5, 0.75, 1.0)
    val got = Stats.groupedQuantiles(df, "g", "x", qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, sorted) <- byGroup; q <- qs) {
      val ix = math.ceil(q * sorted.size - 1e-9).toInt - 1
      assert(got((g, q)) === sorted(ix), s"group $g q=$q")
    }
    assert(got.size === byGroup.size * qs.size)
    assert(got(("solo", 0.25)) === 42L, "a 1-row group answers every q with its row")
  }

  test("profile: one row per column with nulls, distinct estimate, extrema") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "y"), (3L, null),
      (2L, "x"), (null, "z")).toDF("a", "b")
    val p = Stats.profile(df, Seq("a", "b"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4), r.getString(5))).toMap
    assert(p("a") === ((5L, 1L, 3.0, "1", "3")), s"got ${p("a")}")
    assert(p("b") === ((5L, 1L, 3.0, "x", "z")), s"got ${p("b")}")
  }

  test("heavyHitters: exact counts, share gate, partitioning-invariant") {
    // 600 a, 300 b, 90 c, 10 d of 1000
    val rows = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(90)("c") ++ Seq.fill(10)("d")
    val df = rows.toDF("v")
    val hh = Stats.heavyHitters(df, "v", minShare = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hh === Set(("a", 600L, 0.6), ("b", 300L, 0.3), ("c", 90L, 0.09)))
    val again = Stats.heavyHitters(df.repartition(13), "v", 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hh === again)
  }

  test("histogram sketches: merge == direct, brackets contain the exact quantile") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = (0L until 3000L).map(i => (s"s${i % 5}", (i * 7919) % 1000))
      .toDF("g", "v")
    val merged = Stats.histogramMergeSketches(
      Stats.histogramSketchGrouped(df, "g", "v", binWidth = 32L))
    val direct = Stats.histogramSketchGrouped(
      df.withColumn("g", lit("all")), "g", "v", binWidth = 32L)
      .select("bin", "cnt")
    assert(merged.collect().toSet === direct.collect().toSet,
      "per-bin sum of shard histograms == direct global histogram")
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val brackets = Stats.histogramQuantiles(merged, qs, 32L)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val exact = Stats.exactQuantiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(brackets.keySet === qs.toSet, "exactly one bracket per q")
    qs.foreach { q =>
      val (lo, hi) = brackets(q)
      assert(exact(q) >= lo && exact(q) <= hi,
        s"q=$q exact ${exact(q)} outside bracket [$lo, $hi]")
      assert(hi - lo === 31L, "fixed bin width")
    }
  }

  test("histogram bins: floor division handles negatives; cum brackets are exclusive-inclusive") {
    val df = Seq(("a", -65L), ("a", -64L), ("a", -1L), ("a", 0L), ("a", 63L), ("a", 64L))
      .toDF("g", "v")
    val bins = Stats.histogramSketchGrouped(df, "g", "v", binWidth = 64L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // -65 -> bin -2; -64..-1 -> bin -1; 0..63 -> bin 0; 64 -> bin 1
    assert(bins === Map(-2L -> 1L, -1L -> 2L, 0L -> 2L, 1L -> 1L))
    // rank 1 of 6 at q≈0.1 lands in bin -2; rank 6 at q=1.0 in bin 1
    val qs = Stats.histogramQuantiles(
      Stats.histogramMergeSketches(bins.toSeq.toDF("bin", "cnt")
        .selectExpr("'x' AS g", "bin", "cnt").drop("g")),
      Seq(0.1, 1.0), 64L)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(qs === Map(0.1 -> -2L, 1.0 -> 1L))
  }

  test("exactQuantilesDiscrete == exactQuantiles (ties, ulp ranks, nulls); no window in the plan") {
    // shuffled, tied, null-holding discrete column
    val df = ((0L until 500L).map(i => Option((i * 7919) % 40)) ++
        Seq(None, None)).toDF("x").repartition(7)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val viaSort = Stats.exactQuantiles(df, "x", qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val disc = Stats.exactQuantilesDiscrete(df, "x", qs)
    val viaHist = disc.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(viaHist === viaSort, "value-histogram form must equal the sorted-rank form")
    // q*n ulp case (0.1 * 500 = 50.000000000000004 in doubles)
    assert(viaHist(0.1) === viaSort(0.1))
    // no window anywhere: the bounded frame collapses to one array row
    // and prefix sums compute in-expression — never WindowExec's
    // single-partition shape
    val plan = disc.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"discrete quantiles must not fall back to a window:\n$plan")
  }

  test("groupedCumeDist equals the window CUME_DIST, per group, tie-correct") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 5L),
      ("b", 10L), ("b", 10L), ("b", 10L)).toDF("g", "v")
    val got = Stats.groupedCumeDist(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // hand-computed: group a has 4 rows (1,1,2,5); group b all-ties
    assert(got(("a", 1L)) === 0.5, "both tied rows share cum<=v / n")
    assert(got(("a", 2L)) === 0.75)
    assert(got(("a", 5L)) === 1.0)
    assert(got(("b", 10L)) === 1.0, "an all-tie group is all 1.0")
    // the window-function reference agrees value for value
    val ref = df.selectExpr("g", "v",
        "round(CUME_DIST() OVER (PARTITION BY g ORDER BY v), 6) AS cd")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === ref)
    // row multiplicity is preserved (join back fans out to every input row)
    assert(Stats.groupedCumeDist(df, "g", "v").count() === 7L)
    // plan shape: the corpus is never window-sorted — the only Window
    // runs on the aggregated (g, v) frame after one aggregation
    val plan = Stats.groupedCumeDist(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "cume frame comes back via a broadcast join")
    // null keys survive the join back (null-SAFE equality): real
    // CUME_DIST keeps null rows, nulls-first — a null-unsafe join
    // would silently drop them while still counting them in the totals
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      (null.asInstanceOf[String], Some(7L))).toDF("g", "v")
    val gotN = Stats.groupedCumeDist(withNulls, "g", "v").collect()
      .map(r => (Option(r.getString(0)),
        Option(r.getAs[java.lang.Long]("v")).map(_.toLong)) ->
        r.getDouble(2)).toMap
    assert(gotN.size === 4, "no row lost to null group or value keys")
    assert(gotN((Some("a"), None)) === round6(1.0 / 3),
      "null value orders first in its group")
    assert(gotN((Some("a"), Some(2L))) === 1.0)
    assert(gotN((None, Some(7L))) === 1.0, "null GROUP is its own group")
  }

  private def round6(d: Double): Double =
    math.rint(d * 1e6) / 1e6
}
