package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val left = Seq(
    (1L, 10L, ts(100)), // after r@50 → matches 50
    (2L, 10L, ts(200)), // after r@150 → matches 150
    (3L, 10L, ts(150)), // AT r@150 → inclusive match
    (4L, 20L, ts(100)), // key 20 has no right rows at all
    (5L, 30L, ts(10))   // before key 30's only right row → null
  ).toDF("event_id", "user_id", "ts")

  private val right = Seq(
    (10L, ts(50), 1.5),
    (10L, ts(150), 2.5),
    (10L, ts(300), 9.9), // in the future of every left row — never matches
    (30L, ts(500), 7.0)
  ).toDF("user_id", "ts", "value")

  test("backward as-of: latest prior-or-equal right row per key, null when none") {
    val out = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("value"))
      .select(col("event_id"), col("asof_value"), col("asof_ts"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) === ((Some(1.5), Some(ts(50)))))
    assert(out(2L) === ((Some(2.5), Some(ts(150)))))
    assert(out(3L) === ((Some(2.5), Some(ts(150)))), "equal timestamps match (inclusive)")
    assert(out(4L) === ((None, None)), "key with no right rows")
    assert(out(5L) === ((None, None)), "right row exists but only in the future")
  }

  test("as-of keeps every left row and is partitioning-invariant") {
    val a = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("value"))
    assert(a.count() === left.count())
    val b = AsOfJoin.asofBackward(left.repartition(7), right.repartition(3),
      "user_id", "ts", Seq("value"))
    assert(a.orderBy("event_id").collect().toSeq ===
      b.orderBy("event_id").collect().toSeq)
  }

  test("sessionize: gaps over the threshold split sessions; exact boundaries") {
    val ev = Seq(
      (1L, 10L, ts(0)),
      (2L, 10L, ts(100)),   // gap 100s ≤ 120s → same session
      (3L, 10L, ts(221)),   // gap 121s > 120s → new session
      (4L, 10L, ts(341)),   // gap 120s = threshold → SAME session (inclusive)
      (5L, 20L, ts(0))      // other key starts at 0
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.sessionize(ev, "user_id", "ts", gapMillis = 120000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 1L, "121s gap opens session 1")
    assert(out(4L) === 1L, "exactly-at-threshold gap does NOT split")
    assert(out(5L) === 0L, "sessions are per key")
    val repart = AsOfJoin.sessionize(ev.repartition(5), "user_id", "ts", 120000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === repart)
  }

  test("as-of property: equals the brute-force latest-prior match on random data") {
    val rnd = new scala.util.Random(11)
    val lrows = Seq.tabulate(120)(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
    // unique (key, ts) on the right — the operator's documented contract
    val rrows = rnd.shuffle(
      (for (k <- 1L to 5L; t <- 0 until 1000 by 7) yield (k, t)).toSeq)
      .take(150).map { case (k, t) => (k, ts(t.toLong), t.toDouble) }
    val out = AsOfJoin.asofBackward(lrows.toDF("event_id", "user_id", "ts"),
        rrows.toDF("user_id", "ts", "value"), "user_id", "ts", Seq("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    lrows.foreach { case (id, k, t) =>
      val expect = rrows.filter(r => r._1 == k && !r._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(id) === expect, s"left $id key $k ts $t")
    }
  }

  test("sessionize property: matches a sequential per-key fold on random event times") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(5000).toLong)))
      .distinctBy(r => (r._2, r._3)) // unique (key, ts)
    val gap = 60000L
    val got = AsOfJoin.sessionize(rows.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", gap)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(_._3.getTime)
      var six = 0L; var prev = Long.MinValue
      ordered.foreach { case (id, _, t) =>
        if (prev != Long.MinValue && t.getTime - prev > gap) six += 1
        assert(got(id) === six, s"event $id")
        prev = t.getTime
      }
    }
  }

  test("as-of: a null payload field rides with ITS row, never a stitched older row") {
    // latest right row @150 carries value=null, tag="b"; a left row @200
    // must get (asof_ts=150, asof_value=null, asof_tag=b) — per-column
    // forward-fill would resurrect value=1.5 from the @50 row and emit a
    // right row that never existed
    val r = Seq(
      (10L, ts(50), Option(1.5), "a"),
      (10L, ts(150), Option.empty[Double], "b")
    ).toDF("user_id", "ts", "value", "tag")
    val l = Seq((1L, 10L, ts(200))).toDF("event_id", "user_id", "ts")
    val row = AsOfJoin.asofBackward(l, r, "user_id", "ts", Seq("value", "tag")).head()
    assert(row.getAs[Timestamp]("asof_ts") === ts(150))
    assert(row.isNullAt(row.fieldIndex("asof_value")),
      "the matched row's null payload must survive")
    assert(row.getAs[String]("asof_tag") === "b")
  }

  // --- TIMESTAMP_NTZ tolerance (the q61 regression class) ---
  // Modern pyarrow/pandas write parquet timestamps without the
  // adjusted-to-UTC flag; Spark reads them as TIMESTAMP_NTZ, a type
  // `unix_micros`/`window` reject at analysis time. Every tsCol
  // entry point must accept BOTH types and produce identical results.

  private def ntz(s: Long) = java.time.LocalDateTime
    .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC)

  test("sessionize accepts TIMESTAMP_NTZ input and matches the TIMESTAMP result") {
    val rows = Seq((1L, 10L, 0L), (2L, 10L, 100L), (3L, 10L, 221L),
      (4L, 10L, 341L), (5L, 20L, 0L))
    val tzDf = rows.map { case (i, k, t) => (i, k, ts(t)) }
      .toDF("event_id", "user_id", "ts")
    val ntzDf = rows.map { case (i, k, t) => (i, k, ntz(t)) }
      .toDF("event_id", "user_id", "ts")
    assert(ntzDf.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val expect = AsOfJoin.sessionize(tzDf, "user_id", "ts", 120000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = AsOfJoin.sessionize(ntzDf, "user_id", "ts", 120000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === expect)
  }

  test("as-of accepts TIMESTAMP_NTZ on both sides") {
    val l = Seq((1L, 10L, ntz(100)), (2L, 10L, ntz(40)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, ntz(50), 1.5), (10L, ntz(150), 2.5))
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.asofBackward(l, r, "user_id", "ts", Seq("value"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(out(1L) === Some(1.5), "NTZ ordering matches @50 for left @100")
    assert(out(2L) === None, "left @40 precedes every right row")
  }

  test("Tables.load normalizes TIMESTAMP_NTZ columns to TIMESTAMP, value-exact") {
    val dir = java.nio.file.Files.createTempDirectory("ntz-tables").toString
    Seq((1L, ntz(100)), (2L, ntz(200))).toDF("id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // raw read is NTZ (what the driver-regenerated testdata looks like)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val loaded = graft.Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // value-exact under the UTC session: epoch micros unchanged
    val micros = loaded.select(unix_micros(col("ts"))).as[Long]
      .collect().sorted
    assert(micros === Array(100000000L, 200000000L))
  }

  test("as-of plan: one keyed window — no range join, no cartesian") {
    val p = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), "the carry is a window, not a join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), "no O(l·r) range-join explosion")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      "both sides shuffle once on the key (union is partition-local)")
  }
}
