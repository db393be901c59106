package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.model.{CollectionSpec, Documents}

/** Streaming specs: micro-batch upsert ingestion (the reference's
  * webhook-increment path as a stream) and watermarked windows. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch upsert sink merges micro-batches through collection semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val stream = input.toDF().select(col("value").as("properties"))

    val spec = CollectionSpec("stream", identifier = Some("id"))
    var state = Documents.empty(spark)
    val writer = Streaming.upsertSink(spec, _ => state, merged => state = merged)(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .start()

    input.addData("""{"id":1,"v":"a"}""", """{"id":2,"v":"b"}""")
    writer.processAllAvailable()
    assert(state.count() === 2)

    input.addData("""{"id":2,"v":"UPDATED"}""", """{"id":3,"v":"c"}""")
    writer.processAllAvailable()
    writer.stop()
    assert(state.count() === 3)
    val v2 = state.filter(col("identity") === "2").head.getAs[String]("properties")
    assert(v2.contains("\"v\":\"UPDATED\""))
  }

  test("watermarked windowed aggregation matches its batch twin on static data") {
    val events = graft.Tables.load(spark, sf("sf0.001"), "events")
    val out = Streaming.windowedCounts(events) // batch execution of the same plan
      .orderBy("window_start", "event_type")
    assert(out.count() > 0)
    // cross-check one bucket against a direct aggregation
    val direct = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(out.agg(sum("cnt")).head.getLong(0) === direct.agg(sum("cnt")).head.getLong(0))
  }

  test("streaming sessionization closes sessions at the gap and matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val input = MemoryStream[(Long, Timestamp)]
    val stream = input.toDF().toDF("user_id", "ts")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (user, n_events)
    val writer = Streaming.sessionizeStream(stream, gap = "2 minutes",
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => rows += ((r.getLong(0), r.getLong(2))))
      }.start()
    // user 10: events at 0s, 60s (same session), then 600s (gap > 2min)
    input.addData((10L, ts(0)), (10L, ts(60)), (10L, ts(600)))
    writer.processAllAvailable()
    // advancing the watermark past 600s + gap closes everything
    input.addData((10L, ts(1200)))
    writer.processAllAvailable()
    input.addData((10L, ts(2400)))
    writer.processAllAvailable()
    writer.stop()
    assert(rows.contains((10L, 2L)), s"first session has its two events: $rows")
    assert(rows.contains((10L, 1L)), s"the 600s event sits alone: $rows")
    // batch equivalence on the same static data (2-minute gap = 120000 ms)
    val static = Seq((10L, ts(0)), (10L, ts(60)), (10L, ts(600)))
      .toDF("user_id", "ts")
    val batch = graft.ops.AsOfJoin.sessionize(static, "user_id", "ts", 120000L)
      .groupBy("user_id", "session_ix").count()
      .collect().map(_.getLong(2)).sorted
    assert(batch.toSeq === Seq(1L, 2L), "batch twin groups identically")
  }

  test("streaming dedup drops same-text docs within the watermark, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val stream = input.toDF().toDF("doc_id", "text", "ts")

    val out = Streaming.dedupStream(stream, "text", "ts", watermark = "10 minutes")
    val writer = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-dedup").toString)
      .start()

    input.addData((1L, "same text", ts(0)), (2L, "same text", ts(1)),
      (3L, "other text", ts(2)))
    writer.processAllAvailable()
    input.addData((4L, "same text", ts(3))) // still within watermark → dropped
    writer.processAllAvailable()
    writer.stop()
    val kept = spark.sql("SELECT doc_id FROM dedup_out").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L), s"dup texts dropped, got $kept")
  }

  test("KMV aggregate runs in a streaming aggregation: running distinct estimate per key") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("grp", "v")
    // the bounded <=k buffer is exactly what a streaming state store
    // wants: per-group state never exceeds k longs no matter how many
    // distinct values stream through
    val out = stream
      .groupBy(col("grp"))
      .agg(call_function("graft_kmv_mins",
        graft.ops.Sketches.hash60(col("v")), lit(64)).as("s"))
      .select(col("grp"), col("s.n_mins").as("n_mins"))
    val writer = out.writeStream.format("memory").queryName("kmv_out")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("graft-kmv").toString)
      .start()
    input.addData((0L until 40L).map(i => ("a", i % 20)): _*)
    writer.processAllAvailable()
    input.addData((0L until 40L).map(i => ("a", 20 + i % 20)): _*)
    writer.processAllAvailable()
    writer.stop()
    val n = spark.sql("SELECT n_mins FROM kmv_out WHERE grp = 'a'")
      .head.getLong(0)
    // 40 distinct below k=64: the sketch holds the exact distinct count
    // ACROSS micro-batches (state merged, not recomputed)
    assert(n === 40L, s"running distinct mins across batches, got $n")
  }

  test("cluster maintenance sink: streamed pair batches == one-shot CC; merges, compaction, replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("id_a", "id_b")
    val store = new graft.sources.LabelStore(spark,
      idTable = "sspec_labels_id", clusterTable = "sspec_labels_cluster",
      buckets = 4)
    val emitted = scala.collection.mutable.ArrayBuffer[Map[Long, Long]]()
    val writer = graft.streaming.Streaming.clusterMaintenanceSink(
        "id_a", "id_b", store,
        df => { emitted += df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap; () })(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-cm").toString)
      .start()
    val b1 = Seq((1L, 2L), (5L, 6L), (10L, 11L))
    val b2 = Seq((2L, 100L), (100L, 6L)) // merges clusters 1 and 5 through a fresh doc
    val b3 = Seq((11L, 200L), (300L, 301L)) // attach via non-min member + novel pair
    input.addData(b1: _*); writer.processAllAvailable()
    input.addData(b2: _*); writer.processAllAvailable()
    input.addData(b3: _*); writer.processAllAvailable()
    writer.stop()
    val full = graft.ops.Dedup.connectedComponents(
        (b1 ++ b2 ++ b3).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = store.loadAll()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === full, "streamed labels must equal the one-shot CC")
    // batch 2 relabeled exactly the merged component (both old clusters'
    // members + the fresh doc), batch 3 touched cluster 10 + the novel
    // pair and NOTHING of the (already merged) cluster 1
    assert(emitted(1) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L))
    assert(emitted(2) === Map(10L -> 10L, 11L -> 10L, 200L -> 10L,
      300L -> 300L, 301L -> 300L))
    // compaction: one current row per id, labels preserved
    store.compact()
    assert(spark.table("sspec_labels_id").count() === full.size.toLong)
    assert(store.loadAll().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === full)
    // crash-replay: re-ingesting batch 2 reproduces identical labels and
    // leaves the log's read state unchanged (merges are idempotent)
    val replay = store.ingest(b2.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay === emitted(1), "replay must re-emit the original relabels")
    assert(store.loadAll().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === full)
  }

  test("cluster maintenance auto-compaction: a long stream's label log plateaus at O(current), labels unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("id_a", "id_b")
    val store = new graft.sources.LabelStore(spark,
      idTable = "sspec_ac_labels_id", clusterTable = "sspec_ac_labels_cluster",
      buckets = 4)
    // the worst case for an append log: every batch extends ONE
    // component downward (a new smaller min), so the WHOLE component
    // relabels every batch — without compaction the log is quadratic
    // in the component (2+3+...+17 = 135 rows for 16 batches)
    val ratio = 2.0
    val writer = graft.streaming.Streaming.clusterMaintenanceSink(
        "id_a", "id_b", store, _ => (),
        compactRatio = ratio, compactFloor = 20L)(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-ac").toString)
      .start()
    val pairs = (0 until 16).map(b => (1000L - b, 1001L - b))
    pairs.foreach { p => input.addData(p); writer.processAllAvailable() }
    writer.stop()
    val full = graft.ops.Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(store.loadAll().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === full, "auto-compaction must never change the labels")
    val current = full.size.toLong // 17
    val log = spark.table("sspec_ac_labels_id").count()
    // invariant at every batch end: log <= max(floor, ratio x current)
    // + the one batch appended since the last trigger check ran BEFORE
    // it (the trigger fires after each fold, so the slack is one
    // component-sized append)
    assert(log <= (ratio * current).toLong + current,
      s"log must plateau near ratio x current, got $log rows for $current ids")
    assert(log < 135L, s"the un-compacted quadratic growth (135) must not survive, got $log")
  }

  test("streaming HLL register maintenance: running registers == batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("grp", "v")
    // register maintenance is ONE update-mode max aggregation — state
    // bounded by groups × 2^p, mergeable forever, no watermark needed
    val out = graft.ops.Sketches.hllRegisterRows(stream, "grp", "v", p = 6)
    val writer = out.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("graft-hll").toString)
      .start()
    val batch1 = (0L until 300L).map(i => ("a", i % 150))
    val batch2 = (0L until 300L).map(i => ("a", 100 + i % 150))
    input.addData(batch1: _*)
    writer.processAllAvailable()
    input.addData(batch2: _*)
    writer.processAllAvailable()
    writer.stop()
    val streamed = spark.sql("SELECT bucket, rho FROM hll_out WHERE grp = 'a'")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    import spark.implicits._
    val batch = graft.ops.Sketches.hllRegisterRows(
        (batch1 ++ batch2).toDF("grp", "v"), "grp", "v", p = 6)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(streamed === batch,
      "cross-batch running max must equal the one-shot batch registers")
    assert(streamed.size <= 64, "state bounded by 2^p buckets")
  }

  test("streaming quota sampler admits the first `quota` docs per domain across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("domain", "doc_id")
    val out = Streaming.quotaSampleStream(stream, "domain", "doc_id", quota = 3)
    val writer = out.writeStream.format("memory").queryName("quota_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-quota").toString)
      .start()
    input.addData(("a", 5L), ("a", 1L), ("a", 9L), ("a", 3L), ("b", 7L))
    writer.processAllAvailable()
    input.addData(("a", 2L), ("a", 8L), ("b", 4L)) // a is FULL: only b admits
    writer.processAllAvailable()
    writer.stop()
    val got = spark.sql("SELECT domain, doc_id FROM quota_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // batch 1: a admits its 3 smallest ids (1,3,5); b admits 7
    // batch 2: a's state says full; b admits 4 (2 of 3 used)
    assert(got === Set(("a", 1L), ("a", 3L), ("a", 5L), ("b", 7L), ("b", 4L)),
      s"quota must persist across micro-batches, got $got")
  }

  test("streaming near-dup: a later-batch near-duplicate is flagged against the band table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    var bandTable = Streaming.emptyBandTable(spark)
    val saveSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var flagged = Map.empty[Long, Long]
    val writer = Streaming.nearDupSink("doc_id", "text",
        _ => bandTable,
        bt => { // append-only contract: the store merges, the sink doesn't
          val b = bt.localCheckpoint(true)
          saveSizes += b.count()
          bandTable = bandTable.unionByName(b)
        },
        f => flagged ++= f.collect().map(r => r.getLong(0) -> r.getLong(1)))(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-neardup").toString)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    input.addData((1L, base), (2L, "completely different words about spark streaming state"))
    writer.processAllAvailable()
    assert(flagged.isEmpty, s"first batch has no near-dups, got $flagged")

    // batch 2: near-dup of doc 1 (NOT byte-identical), one unrelated doc,
    // and a within-batch near-dup pair (10, 11)
    val inBatch = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    input.addData(
      (42L, base.replace("today", "tonight")),
      (43L, "nothing in common with anything seen before at all whatsoever"),
      (10L, inBatch), (11L, inBatch + " xi"))
    writer.processAllAvailable()
    writer.stop()
    assert(flagged.get(42L).contains(1L), s"later-batch near-dup must flag, got $flagged")
    assert(flagged.get(11L).contains(10L), s"within-batch near-dup must flag, got $flagged")
    assert(!flagged.contains(43L) && !flagged.contains(2L), s"unrelated docs stay clean: $flagged")
    // the band table accumulated both batches' keys (4 bands per doc)
    assert(bandTable.count() === 6 * 4)
    // append-only save contract: each save carries ONLY its batch's
    // bands (2 docs × 4, then 4 docs × 4) — never the merged history
    // (a history-sized save is an O(corpus) rewrite per micro-batch)
    assert(saveSizes.toSeq === Seq(2 * 4, 4 * 4), s"saves must be batch-sized: $saveSizes")
  }

  test("streaming Hamming near-dup: verified image-dHash pairs accumulate to the batch operator's") {
    import graft.ops.ImageHash
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (media_id, dhash) — decode upstream
    val stream = input.toDF().toDF("media_id", "dhash")

    var blocks = Streaming.emptyBlockTable(spark)
    val saveSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = Streaming.hammingNearDupSink("media_id", "dhash",
        _ => blocks,
        b => { val c = b.localCheckpoint(true); saveSizes += c.count()
          blocks = blocks.unionByName(c) },
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2))))(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-hamming").toString)
      .start()

    // real dHashes of the image fixtures: ids 31..310 step 31, every
    // 62nd gets a perturbed copy (<= 2 bit flips) in a LATER batch
    def h(id: Long, p: Boolean = false): Long =
      ImageHash.dHash64(ImageHash.fixturePng(id, p)).get
    val ids = (1L to 10L).map(_ * 31L)
    input.addData(ids.take(5).map(id => (id, h(id))): _*)
    writer.processAllAvailable()
    assert(emitted.isEmpty, s"distinct images must not pair, got $emitted")
    // batch 2: rest of the bases + a perturbed copy of id 62 (prior
    // batch) — and a within-batch copy pair (93's copy arrives with it)
    input.addData((ids.drop(5).map(id => (id, h(id))) ++ Seq(
      (1000000062L, h(62L, p = true)), (1000000093L, h(93L, p = true)))): _*)
    writer.processAllAvailable()
    writer.stop()
    // the streamed pairs, normalized to unordered, equal the batch twin
    val batchHashes = (ids.map(id => (id, h(id))) ++
      Seq((1000000062L, h(62L, p = true)), (1000000093L, h(93L, p = true))))
      .toDF("media_id", "dhash")
    val expected = ImageHash.nearDupPairs(batchHashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = emitted.map { case (id, p, d) =>
      (math.min(id, p), math.max(id, p), d) }.toSet
    assert(got === expected, s"streamed $got != batch $expected")
    assert(expected.nonEmpty && expected.forall(_._3 <= 3))
    // append-only, batch-sized saves: 5 docs x 4 blocks, then 7 x 4
    assert(saveSizes.toSeq === Seq(5 * 4, 7 * 4))
  }

  test("streaming near-dup retention: expired bands stop flagging and compact away") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

    var bandTable = Streaming.emptyBandTable(spark, withTs = true)
    var flagged = Map.empty[Long, Long]
    // retention = 60 s of EVENT time
    val writer = Streaming.nearDupSink("doc_id", "text",
        _ => bandTable,
        bt => bandTable = bandTable.unionByName(bt.localCheckpoint(true)),
        f => flagged ++= f.collect().map(r => r.getLong(0) -> r.getLong(1)),
        tsCol = "ts", retentionMillis = 60000L)(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-ndret").toString)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    input.addData((1L, base, ts(0)), (2L, other, ts(55)))
    writer.processAllAvailable()
    // batch 2 at event time 100: doc 1's bands (age 100 s) are PAST the
    // 60 s window — its near-dup must NOT flag; doc 2 (age 45 s) must
    input.addData((42L, base.replace("today", "tonight"), ts(100)),
      (43L, other + " xi", ts(100)))
    writer.processAllAvailable()
    writer.stop()
    assert(!flagged.contains(42L), s"expired band must not flag, got $flagged")
    assert(flagged.get(43L).contains(2L), s"in-window near-dup must flag, got $flagged")

    // state plateau: compacting at the sink's horizon (100 s − 60 s)
    // drops doc 1's rows — the table holds only in-window docs
    spark.sql("DROP TABLE IF EXISTS graft_band_ret")
    val store = new Streaming.BandStore(spark, "graft_band_ret", buckets = 4)
    store.save(bandTable)
    assert(store.load(spark).count() === 4 * 4, "4 docs x 4 bands before compaction")
    store.compact(horizonMillis = 40000L)
    val kept = store.load(spark)
    assert(kept.count() === 3 * 4, "doc 1 expired; 3 docs remain")
    assert(kept.filter(col("id") === 1L).isEmpty)
    spark.sql("DROP TABLE IF EXISTS graft_band_ret")
  }

  test("retention clock survives a process restart: the horizon re-seeds from the store, a late replay can't widen it") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"

    var bandTable = Streaming.emptyBandTable(spark, withTs = true)
    var flagged = Map.empty[Long, Long]
    def makeWriter(input: MemoryStream[(Long, String, java.sql.Timestamp)]) =
      Streaming.nearDupSink("doc_id", "text",
          _ => bandTable,
          bt => bandTable = bandTable.unionByName(bt.localCheckpoint(true)),
          f => flagged ++= f.collect().map(r => r.getLong(0) -> r.getLong(1)),
          tsCol = "ts", retentionMillis = 60000L)(input.toDF().toDF("doc_id", "text", "ts"))

    // process 1: doc 1 at t=10, then an unrelated doc at t=100 pushes
    // the high water to 100 (horizon 40 — doc 1 is already expired)
    val in1 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val w1 = makeWriter(in1)
      .option("checkpointLocation", Files.createTempDirectory("graft-hw1").toString)
      .start()
    in1.addData((1L, base, ts(10)))
    w1.processAllAvailable()
    in1.addData((2L, other, ts(100)))
    w1.processAllAvailable()
    w1.stop()

    // process 2 (fresh sink = fresh driver clock): a LATE batch at
    // t=50 replays. Unseeded, the clock would rebuild at 50, widen the
    // horizon to -10, and flag doc 1's expired bands — rows the
    // original run never emitted. The store's max stamp (100) seeds
    // the clock, so the horizon stays 40 and doc 1 stays expired.
    val in2 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val w2 = makeWriter(in2)
      .option("checkpointLocation", Files.createTempDirectory("graft-hw2").toString)
      .start()
    in2.addData((42L, base.replace("today", "tonight"), ts(50)))
    w2.processAllAvailable()
    w2.stop()
    assert(!flagged.contains(42L),
      s"restart must not widen the retention horizon: $flagged")
  }

  test("retention stamps survive NON-NUMERIC doc ids (no silent cast-to-long nulling)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    var bandTable = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", StringType),
        StructField("band", IntegerType), StructField("bucket", StringType),
        StructField("ts", LongType))))
    val writer = Streaming.nearDupSink("doc_id", "text",
        _ => bandTable,
        bt => bandTable = bandTable.unionByName(bt.localCheckpoint(true)),
        _ => (),
        tsCol = "ts", retentionMillis = 60000L)(input.toDF().toDF("doc_id", "text", "ts"))
      .option("checkpointLocation", Files.createTempDirectory("graft-sid").toString)
      .start()
    input.addData(("url-hash-abc", "the quick brown fox jumps over the lazy dog today",
      new java.sql.Timestamp(10000L)))
    writer.processAllAvailable()
    writer.stop()
    // a cast("long") on the stamp join would null every string id's ts
    // — rows the horizon then exempts forever (unbounded state with
    // retention configured and no error anywhere)
    assert(bandTable.count() === 4)
    assert(bandTable.filter(col("ts").isNull).count() === 0,
      "string-id band rows must carry their event-time stamp")
    assert(bandTable.filter(col("ts") === 10000L).count() === 4)
  }

  test("streaming sessionization accepts TIMESTAMP_NTZ event time") {
    // LocalDateTime encodes as TIMESTAMP_NTZ — the type modern pyarrow
    // parquet yields; session_window/withWatermark must not reject it
    implicit val sqlCtx = spark.sqlContext
    def ntz(s: Long) = java.time.LocalDateTime
      .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC)
    val input = MemoryStream[(Long, java.time.LocalDateTime)]
    val stream = input.toDF().toDF("user_id", "ts")
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val writer = Streaming.sessionizeStream(stream, gap = "2 minutes",
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ntzs").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => rows += ((r.getLong(0), r.getLong(2))))
      }.start()
    input.addData((10L, ntz(0)), (10L, ntz(60)), (10L, ntz(600)))
    writer.processAllAvailable()
    input.addData((10L, ntz(1200)))
    writer.processAllAvailable()
    input.addData((10L, ntz(2400)))
    writer.processAllAvailable()
    writer.stop()
    assert(rows.contains((10L, 2L)) && rows.contains((10L, 1L)),
      s"NTZ stream sessionizes identically to the TIMESTAMP case: $rows")
  }

  test("windowedCounts and dedupStream accept TIMESTAMP_NTZ event time") {
    implicit val sqlCtx = spark.sqlContext
    def ntz(s: Long) = java.time.LocalDateTime
      .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC)
    // windowedCounts: batch execution of the streaming plan on NTZ input
    val events = Seq((ntz(0), "a", 1.0), (ntz(60), "a", 2.0), (ntz(7200), "b", 3.0))
      .toDF("ts", "event_type", "value")
    val wc = Streaming.windowedCounts(events).collect()
    assert(wc.map(_.getLong(2)).sum === 3L, "all three NTZ events aggregate")
    // dedupStream: watermark + dropDuplicatesWithinWatermark on NTZ
    val input = MemoryStream[(Long, String, java.time.LocalDateTime)]
    val out = Streaming.dedupStream(input.toDF().toDF("doc_id", "text", "ts"),
      "text", "ts", watermark = "10 minutes")
    val writer = out.writeStream.format("memory").queryName("ntz_dedup_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ntzd").toString)
      .start()
    input.addData((1L, "same text", ntz(0)), (2L, "same text", ntz(60)),
      (3L, "other text", ntz(120)))
    writer.processAllAvailable()
    writer.stop()
    val kept = spark.sql("SELECT doc_id FROM ntz_dedup_out")
      .collect().map(_.getLong(0)).toSet
    // which of the two same-text docs survives a single micro-batch is
    // not specified — only that exactly one does
    assert(kept.size === 2 && kept.contains(3L) &&
      (kept.contains(1L) || kept.contains(2L)),
      s"NTZ dup texts dropped, got $kept")
  }

  test("streaming near-dup retention accepts TIMESTAMP_NTZ event time") {
    // the retention stamp runs unix_millis(tsCol) — the exact
    // NTZ-rejection class that broke q61; entry normalization must cover it
    implicit val sqlCtx = spark.sqlContext
    def ntz(s: Long) = java.time.LocalDateTime
      .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC)
    val input = MemoryStream[(Long, String, java.time.LocalDateTime)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    var bandTable = Streaming.emptyBandTable(spark, withTs = true)
    var flagged = Map.empty[Long, Long]
    val writer = Streaming.nearDupSink("doc_id", "text",
        _ => bandTable,
        bt => bandTable = bandTable.unionByName(bt.localCheckpoint(true)),
        f => flagged ++= f.collect().map(r => r.getLong(0) -> r.getLong(1)),
        tsCol = "ts", retentionMillis = 60000L)(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-ntzret").toString)
      .start()
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    input.addData((1L, base, ntz(0)))
    writer.processAllAvailable()
    input.addData((42L, base.replace("today", "tonight"), ntz(30)))
    writer.processAllAvailable()
    writer.stop()
    assert(flagged.get(42L).contains(1L),
      s"in-window NTZ near-dup must flag, got $flagged")
  }

  test("BandStore: bucketed band table, append-only saves, Exchange-free probe side") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS graft_band_test")
    val store = new Streaming.BandStore(spark, "graft_band_test", buckets = 4)

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    var flagged = Map.empty[Long, Long]
    val writer = Streaming.nearDupSink("doc_id", "text", store.load, store.save,
        f => flagged ++= f.collect().map(r => r.getLong(0) -> r.getLong(1)))(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-bandstore").toString)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    input.addData((1L, base), (2L, "completely different words about spark streaming state"))
    writer.processAllAvailable()
    input.addData((42L, base.replace("today", "tonight")))
    writer.processAllAvailable()
    writer.stop()
    assert(flagged.get(42L).contains(1L), s"near-dup must flag through the store, got $flagged")
    assert(store.load(spark).count() === 3 * 4, "both batches' bands persisted")

    // the probe join's store side must co-locate: with broadcast off,
    // the ONLY Exchange in the plan is the batch side shuffling into
    // the table's buckets — the band table itself never reshuffles
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batchBands = (10L until 20L).map(i => (i, i.toInt % 4, s"b$i"))
        .toDF("id", "band", "bucket")
      val joined = batchBands.join(
        store.load(spark).select(col("id").as("partner_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"band-table side must not reshuffle (1 probe-side Exchange):\n$plan")
      // compact() dedupes re-appended rows and keeps the bucketing
      store.save(store.load(spark)) // simulate a full re-ingestion
      assert(store.load(spark).count() === 6 * 4)
      store.compact()
      assert(store.load(spark).count() === 3 * 4, "compact restores one row per key")
      val agg = store.load(spark).groupBy("band", "bucket").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "post-compact table keeps Exchange-free bucket-keyed aggregation")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("HashBlockStore: bucketed block table, Exchange-free probe side, horizon compaction") {
    import graft.ops.ImageHash
    implicit val sqlCtx = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS graft_hash_block_test")
    val store = new Streaming.HashBlockStore(spark, "graft_hash_block_test", buckets = 4)

    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("media_id", "dhash")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = Streaming.hammingNearDupSink("media_id", "dhash",
        store.load, store.save,
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2))))(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-hashstore").toString)
      .start()
    def h(id: Long, p: Boolean = false): Long =
      ImageHash.dHash64(ImageHash.fixturePng(id, p)).get
    input.addData((62L, h(62L)), (93L, h(93L)))
    writer.processAllAvailable()
    input.addData((1000000062L, h(62L, p = true)))
    writer.processAllAvailable()
    writer.stop()
    assert(emitted.map(e => (e._1, e._2)).toSet === Set((1000000062L, 62L)),
      s"near-dup must flag through the store, got $emitted")
    assert(store.load(spark).count() === 3 * 4, "both batches' blocks persisted")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = (10L until 20L).map(i => (i, i * 7L, i.toInt % 4, i % 65536L))
        .toDF("id", "sim", "blk", "key")
      val joined = probe.join(
        store.load(spark).select(col("id").as("partner_id"),
          col("sim").as("partner_sim"), col("blk"), col("key")),
        Seq("blk", "key"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"block-table side must not reshuffle:\n$plan")
      store.save(store.load(spark)) // full re-ingestion
      assert(store.load(spark).count() === 6 * 4)
      store.compact()
      assert(store.load(spark).count() === 3 * 4, "compact restores one row per key")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("streaming frame-set near-dup: verified video pairs accumulate to the batch operator's; duplicate store rows don't inflate") {
    import graft.ops.VideoHash
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Long])] // (media_id, frame hashes) — decode upstream
    val stream = input.toDF().toDF("media_id", "fhashes")
    var frames = Streaming.emptyFrameSetTable(spark)
    val saveSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val writer = Streaming.frameSetNearDupSink("media_id", "fhashes",
        _ => frames,
        b => { val c = b.localCheckpoint(true); saveSizes += c.count()
          // at-least-once simulation: every batch's rows append TWICE
          frames = frames.unionByName(c).unionByName(c) },
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))))(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-frameset").toString)
      .start()
    def fh(id: Long, p: Boolean = false): Seq[Long] =
      VideoHash.frameDHashes(VideoHash.fixtureMp4(id, p)).get
    val ids = (1L to 8L).map(_ * 23L)
    input.addData(ids.take(4).map(id => (id, fh(id))): _*)
    writer.processAllAvailable()
    assert(emitted.isEmpty, s"distinct videos must not pair, got $emitted")
    // batch 2: rest of the bases + a one-scene-replaced copy of a
    // PRIOR video (46) and a WITHIN-batch copy pair (69's copy)
    input.addData((ids.drop(4).map(id => (id, fh(id))) ++ Seq(
      (1000000046L, fh(46L, p = true)), (1000000069L, fh(69L, p = true)))): _*)
    writer.processAllAvailable()
    writer.stop()
    val batchTwin = graft.ops.VideoHash.nearDupVideos(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (ids.map(id => (id, fh(id))) ++ Seq(
          (1000000046L, fh(46L, p = true)), (1000000069L, fh(69L, p = true))))
          .flatMap { case (id, hs) => hs.distinct.map(h =>
            org.apache.spark.sql.Row(id, h)) }, 4),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("media_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("fhash",
            org.apache.spark.sql.types.LongType, nullable = false)))),
      threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = emitted.map { case (id, p, s, j) =>
      (math.min(id, p), math.max(id, p), s, j) }.toSet
    assert(got === batchTwin, s"streamed $got != batch $batchTwin")
    assert(batchTwin.nonEmpty && batchTwin.forall(_._4 === 0.882353),
      "planted copies at 15/17")
    // duplicate store rows (simulated double-append) did not inflate
    // n_shared: every emitted intersection is exactly 15
    assert(emitted.forall(_._3 === 15L), s"n_shared inflated: $emitted")
    // saves are batch-sized distinct frame rows (16 per video)
    assert(saveSizes.toSeq === Seq(4 * 16, 6 * 16))
  }

  test("frame-set sink contract-violation defense: diverging store rows for one video never double-count or exceed Jaccard 1") {
    import graft.ops.VideoHash
    implicit val sqlCtx = spark.sqlContext
    // the violated id contract: video 46 was re-ingested CHANGED, so
    // the store holds its 16 hashes twice with diverging n (16 and 17)
    val hs = VideoHash.frameDHashes(VideoHash.fixtureMp4(46L)).get.distinct
    val poisoned = (hs.map(h => (46L, h, 16L)) ++ hs.map(h => (46L, h, 17L)))
      .toDF("id", "fhash", "n").localCheckpoint(true)
    val input = MemoryStream[(Long, Seq[Long])]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val writer = Streaming.frameSetNearDupSink("media_id", "fhashes",
        _ => poisoned, _ => (),
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))))(
        input.toDF().toDF("media_id", "fhashes"))
      .option("checkpointLocation", Files.createTempDirectory("graft-poison").toString)
      .start()
    input.addData((1000000046L,
      VideoHash.frameDHashes(VideoHash.fixtureMp4(46L, perturb = true)).get))
    writer.processAllAvailable()
    writer.stop()
    // without the per-(partner, fhash) collapse the intersection would
    // read 30 and the "jaccard" 30/(16+16-30) = 15.0
    assert(emitted.toList === List((1000000046L, 46L, 15L, 0.833333)),
      s"poisoned store must degrade conservatively, got $emitted")
  }

  test("streaming keyframe near-dup: scene keyframes flow through the frame-set sink unchanged") {
    // the q145 composition on a STREAM: keyframe arrays (one hash per
    // scene, q142's sampling) ride the SAME frameSetNearDupSink the
    // full frame sets use — no new streaming code, only a lower
    // threshold (a replaced scene moves a whole keyframe: J =
    // (n−1)/(n+1)); completes the batch/streaming × frames/keyframes
    // matrix
    import graft.ops.VideoHash
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Long])]
    var frames = Streaming.emptyFrameSetTable(spark)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val writer = Streaming.frameSetNearDupSink("media_id", "khashes",
        _ => frames,
        b => { frames = frames.unionByName(b.localCheckpoint(true)) },
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))),
        threshold = 0.3)(input.toDF().toDF("media_id", "khashes"))
      .option("checkpointLocation", Files.createTempDirectory("graft-kfsink").toString)
      .start()
    def kf(id: Long, rep: Boolean = false): Seq[Long] =
      VideoHash.sceneWalk(
        VideoHash.frameDHashes(VideoHash.fixtureSceneMp4(id, rep)).get, 4)
        .map(_.key_hash)
    input.addData((1L to 4L).map(id => (id, kf(id))): _*)
    writer.processAllAvailable()
    assert(emitted.isEmpty, s"distinct videos must not pair, got $emitted")
    // batch 2: a one-scene-replaced copy of PRIOR video 3 (5 scenes →
    // J = 4/6) and an unrelated newcomer
    input.addData((1000000003L, kf(3L, rep = true)), (99L, kf(99L)))
    writer.processAllAvailable()
    writer.stop()
    val got = emitted.map(e => (math.min(e._1, e._2), math.max(e._1, e._2),
      e._3, e._4)).toSet
    assert(got === Set((3L, 1000000003L, 4L, 0.666667)),
      s"streamed keyframe verdicts diverged: $emitted")
  }

  test("retention-enabled Hamming sink over a FRESH HashBlockStore: first micro-batch must not crash on the ts-less empty frame") {
    import graft.ops.ImageHash
    implicit val sqlCtx = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS graft_hash_fresh_ret")
    val store = new Streaming.HashBlockStore(spark, "graft_hash_fresh_ret", buckets = 4)
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val stream = input.toDF().toDF("media_id", "dhash", "ts")
    def h(id: Long, p: Boolean = false): Long =
      ImageHash.dHash64(ImageHash.fixturePng(id, p)).get
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val writer = Streaming.hammingNearDupSink("media_id", "dhash",
        store.load, store.save,
        f => emitted ++= f.collect().map(r => (r.getLong(0), r.getLong(1))),
        tsCol = "ts", retentionMillis = 1000000L)(stream)
      .option("checkpointLocation", Files.createTempDirectory("graft-freshret").toString)
      .start()
    // batch 1 against the store's EMPTY (ts-less) day-one frame: the
    // retention filter must treat it as all-exempt, not throw
    input.addData((62L, h(62L), new java.sql.Timestamp(1000L)))
    writer.processAllAvailable()
    input.addData((1000000062L, h(62L, p = true), new java.sql.Timestamp(2000L)))
    writer.processAllAvailable()
    writer.stop()
    assert(emitted.toSet === Set((1000000062L, 62L)),
      s"retention-enabled fresh-store sink must flag the copy, got $emitted")
    assert(store.load(spark).columns.contains("ts"), "saved blocks carry stamps")
  }

  test("Hamming sink crash-replay: a store already holding the batch emits the ORIGINAL pairs, never reversed duplicates") {
    import graft.ops.ImageHash
    implicit val sqlCtx = spark.sqlContext
    def h(id: Long, p: Boolean = false): Long =
      ImageHash.dHash64(ImageHash.fixturePng(id, p)).get
    // batch: within-batch near-dup pair (93, 1000000093); the store
    // ALREADY holds the batch's own rows (the crash-after-save,
    // before-checkpoint window)
    val batchRows = Seq((93L, h(93L)), (1000000093L, h(93L, p = true)))
    val ownBlocks = graft.ops.Dedup.hashBlockRows(
      batchRows.toDF("media_id", "dhash"), "media_id", "dhash")
      .localCheckpoint(true)
    val input = MemoryStream[(Long, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = Streaming.hammingNearDupSink("media_id", "dhash",
        _ => ownBlocks, _ => (),
        f => emitted ++= f.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2))))(
        input.toDF().toDF("media_id", "dhash"))
      .option("checkpointLocation", Files.createTempDirectory("graft-replay").toString)
      .start()
    input.addData(batchRows: _*)
    writer.processAllAvailable()
    writer.stop()
    // exactly the original within-batch emission — no reversed
    // (93, partner = 1000000093) twin from the prior side
    assert(emitted.toList === List((1000000093L, 93L, emitted.head._3)),
      s"replay must re-emit the original pair only, got $emitted")
  }

  test("streaming indexed dedup: verdicts == batch dedupAgainstIndex; streamed index == batch minhashBandIndex") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    var index = Streaming.emptyIndexTable(spark)
    var afterBatch1 = index
    val verdicts = scala.collection.mutable.Map
      .empty[Long, (Long, Option[Long], Boolean)]
    val writer = Streaming.indexedDedupSink("doc_id", "text",
        _ => index,
        ix => { index = index.unionByName(ix.localCheckpoint(true)) },
        v => verdicts ++= v.collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
            r.getBoolean(4))))(stream)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ixdedup").toString)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val b1 = Seq((1L, base),
      (2L, "totally different streaming content with many private words here"))
    input.addData(b1: _*)
    writer.processAllAvailable()
    afterBatch1 = index.localCheckpoint(true)
    // screened against an EMPTY index: present, clean (absence != silence)
    assert(verdicts(1L) === ((0L, None, false)) &&
      verdicts(2L) === ((0L, None, false)))

    val b2 = Seq((42L, base),
      (43L, "a novel unrelated document never seen before in any batch at all"))
    input.addData(b2: _*)
    writer.processAllAvailable()
    writer.stop()
    // the exact re-ingest flags against history; the novel doc is clean
    assert(verdicts(42L) === ((1L, Some(1L), true)), s"got $verdicts")
    assert(verdicts(43L) === ((0L, None, false)))

    // one definition, two modes: batch 2's verdicts equal the BATCH
    // operator run against the post-batch-1 index
    val ref = graft.ops.Dedup.dedupAgainstIndex(
        b2.toDF("doc_id", "text"), afterBatch1, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    assert(ref === Map(42L -> verdicts(42L), 43L -> verdicts(43L)))

    // the streamed index is row-identical to the batch-built one
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), array_join(col("sig"), "|").as("s"),
        col("band"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getString(3))).toSet
    val batchIx = graft.ops.Dedup.minhashBandIndex(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
    assert(rows(index) === rows(batchIx))
  }

  test("streaming SPLIT indexed dedup: verdicts == combined sink; streamed stores == batch split frames") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    var bandsT = graft.sources.BandIndexStore.emptyIndex(spark)
      .select(col("doc_id"), col("band"), col("bucket"))
    var sigsT = graft.sources.BandIndexStore.emptyIndex(spark)
      .select(col("doc_id"), col("sig"))
    val verdicts = scala.collection.mutable.Map
      .empty[Long, (Long, Option[Long], Boolean)]
    val writer = Streaming.indexedDedupSinkSplit("doc_id", "text",
        _ => bandsT, _ => sigsT,
        b => { bandsT = bandsT.unionByName(b.localCheckpoint(true)) },
        s => { sigsT = sigsT.unionByName(s.localCheckpoint(true)) },
        v => verdicts ++= v.collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
            r.getBoolean(4))))(stream)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ixsplit").toString)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val b1 = Seq((1L, base),
      (2L, "totally different streaming content with many private words here"))
    input.addData(b1: _*)
    writer.processAllAvailable()
    assert(verdicts(1L) === ((0L, None, false)) &&
      verdicts(2L) === ((0L, None, false)))

    val b2 = Seq((42L, base),
      (43L, "a novel unrelated document never seen before in any batch at all"))
    input.addData(b2: _*)
    writer.processAllAvailable()
    writer.stop()
    // identical verdicts to the combined sink's history semantics
    assert(verdicts(42L) === ((1L, Some(1L), true)), s"got $verdicts")
    assert(verdicts(43L) === ((0L, None, false)))

    // streamed split stores == batch-built split frames
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batchSigs = graft.ops.Dedup.minhashSignatures(all, "doc_id", "text", 16)
      .select(col("id").as("doc_id"), array_join(col("sig"), "|").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sigsT.select(col("doc_id"), array_join(col("sig"), "|"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet === batchSigs)
    val batchBands = graft.ops.Dedup.minhashBandIndex(all, "doc_id", "text")
      .select(col("doc_id"), col("band"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bandsT.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet === batchBands)
  }

  test("streaming SEMANTIC gate: verdicts == batch operator; streamed stores == batch frames") {
    import graft.ops.Similarity
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")

    def vec(axis: Int, wobble: Float): Seq[Float] =
      (0 until 8).map(d =>
        if (d == axis) 1f else if (d == axis + 4) wobble else 0.01f * d)
    var bucketsT = graft.sources.SrpIndexStore.emptyBuckets(spark)
    var vecsT = graft.sources.SrpIndexStore.emptyVecs(spark)
      .select(col("vec_id"), col("emb"))
    val verdicts = scala.collection.mutable.Map
      .empty[Long, (Long, Option[Long], Boolean)]
    val writer = Streaming.embeddingDedupSink("vec_id", "embedding",
        _ => bucketsT, _ => vecsT,
        v => { vecsT = vecsT.unionByName(v.localCheckpoint(true)) },
        b => { bucketsT = bucketsT.unionByName(b.localCheckpoint(true)) },
        v => verdicts ++= v.collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
            r.getBoolean(4))),
        planes = 6, tables = 2, threshold = 0.95)(stream)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-embgate").toString)
      .start()

    val b1 = Seq((1L, vec(0, 0.1f)), (2L, vec(1, 0.2f)))
    input.addData(b1: _*)
    writer.processAllAvailable()
    assert(verdicts(1L) === ((0L, None, false)) &&
      verdicts(2L) === ((0L, None, false)))

    // batch 2: 42 is an EXACT copy of vector 1 (cosine 1.0); 43 fresh
    val b2 = Seq((42L, vec(0, 0.1f)),
      (43L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f): Seq[Float]))
    input.addData(b2: _*)
    writer.processAllAvailable()
    writer.stop()
    assert(verdicts(42L) === ((1L, Some(1L), true)), s"got $verdicts")
    assert(verdicts(43L) === ((0L, None, false)))

    // streamed verdicts == the batch operator screening b2 against b1
    val opV = Similarity.embeddingDedupAgainstIndex(
        b2.toDF("vec_id", "embedding"),
        Similarity.srpBucketRows(b1.toDF("vec_id", "embedding"),
          planes = 6, tables = 2),
        b1.toDF("vec_id", "embedding"),
        planes = 6, tables = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    assert(opV === verdicts.filterKeys(Set(42L, 43L)).toMap)

    // streamed stores == batch-built frames over the full corpus
    val all = (b1 ++ b2).toDF("vec_id", "embedding")
    assert(bucketsT.select(col("vec_id"), col("t"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ===
      Similarity.srpBucketRows(all, planes = 6, tables = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    assert(vecsT.select(col("vec_id")).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 42L, 43L))
  }

  test("streaming MODEL-SCORE gate: verdicts == batch operator; cache serves repeats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val store = new graft.sources.CacheStore(
      Files.createTempDirectory("graft-scoregate").resolve("c").toString, spark)
    val verdicts = scala.collection.mutable.Map.empty[Long, (Double, Boolean, Boolean)]
    graft.ops.ModelScoringSpec.RecordingScorer.reset()
    val writer = Streaming.scoringGateSink("doc_id", "text",
        new graft.ops.ModelScoringSpec.RecordingScorer(
          graft.ops.Scorer.Default.signature),
        _ => Some(store),
        v => verdicts ++= v.collect().map(r => r.getLong(0) ->
          ((r.getDouble(1), r.getBoolean(2), r.getBoolean(3)))),
        threshold = 0.55, batchSize = 4)(stream)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scoregate-ckpt").toString)
      .start()

    val b1 = Seq((1L, "plain words here"), (2L, "x"), (3L, "a much longer alphabetic body of text"))
    input.addData(b1: _*)
    writer.processAllAvailable()
    assert(graft.ops.ModelScoringSpec.RecordingScorer.texts.get() === 3)
    assert(verdicts.keySet === Set(1L, 2L, 3L))
    assert(verdicts.values.forall(!_._2), "batch 1: nothing from cache")

    // batch 2: doc 4 repeats doc 1's text (served from the store —
    // the model is NOT consulted for it), doc 5 is fresh
    val b2 = Seq((4L, "plain words here"), (5L, "numbers 123 456 789"))
    input.addData(b2: _*)
    writer.processAllAvailable()
    writer.stop()
    assert(graft.ops.ModelScoringSpec.RecordingScorer.texts.get() === 4,
      "only doc 5's text consulted the model in batch 2")
    assert(verdicts(4L)._2 === true && verdicts(5L)._2 === false)
    assert(verdicts(4L)._1 === verdicts(1L)._1, "cached score round-trips exactly")

    // streamed verdicts == the batch gate over the same corpus
    val batchV = graft.ops.ModelScoring.gateByScore(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
        graft.ops.Scorer.Default, threshold = 0.55)
      .select(col("doc_id"), col("score"), col("keep")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(verdicts.view.mapValues(v => (v._1, v._3)).toMap === batchV,
      "one scoring kernel, two execution modes")
  }
}
