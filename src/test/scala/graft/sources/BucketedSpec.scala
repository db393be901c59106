package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bucketed-table specs: the co-located join/aggregation shapes the
  * 100 TB design leans on must actually skip their Exchange. */
class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  test("joins and aggregations on the bucket key run without an Exchange") {
    val docs = (0L until 256L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val scores = (0L until 256L).map(i => (i, i * 2.0)).toDF("doc_id", "score")
    Bucketed.write(docs, "bspec_docs", "doc_id", buckets = 4, sortCols = Seq("doc_id"))
    Bucketed.write(scores, "bspec_scores", "doc_id", buckets = 4, sortCols = Seq("doc_id"))

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.table(spark, "bspec_docs")
        .join(Bucketed.table(spark, "bspec_scores"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 256)

      val agg = Bucketed.table(spark, "bspec_docs").groupBy("doc_id").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucket-keyed agg must not shuffle:\n$aggPlan")
      assert(agg.count() === 256)

      // a join keyed off the bucket column DOES shuffle — the pin is
      // meaningful, not vacuous
      val off = Bucketed.table(spark, "bspec_docs").withColumnRenamed("doc_id", "k")
        .join(Bucketed.table(spark, "bspec_scores")
          .withColumn("k", col("doc_id") + 1).drop("doc_id"), "k")
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("BandIndexStore: screen == in-memory dedupAgainstIndex; index side of the join is Exchange-free") {
    import graft.ops.Dedup
    val old = (0L until 64L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i payload$i end"))
      .toDF("doc_id", "text")
    // every 4th batch doc is an exact copy of an indexed doc
    val batch = (0L until 32L).map { i =>
      val id = i + 1000L
      if (i % 4 == 0)
        (id, s"alpha beta gamma delta epsilon zeta token$i payload$i end")
      else (id, s"nu xi omicron pi rho sigma fresh$i body$i tail")
    }.toDF("doc_id", "text")

    val store = new BandIndexStore(spark, table = "bspec_band_index", buckets = 4)
    assert(store.load().isEmpty, "empty index before the first publish")
    store.publish(old, "doc_id", "text")

    // verdict parity with the in-memory index path (one definition,
    // two storage modes)
    val viaStore = store.screen(batch, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    val inMem = Dedup.dedupAgainstIndex(batch,
        Dedup.minhashBandIndex(old, "doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(viaStore === inMem)
    assert((0L until 32L by 4).forall(i => viaStore(i + 1000L)._2),
      "planted exact copies must flag")

    // plan pin (AQE/broadcast off so Exchange nodes are visible and the
    // join shape is forced): the bucketed index side must consume the
    // on-disk bucketing — only the BATCH side may shuffle
    val (aqe, bcast) = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val plan = store.screen(batch, "doc_id", "text")
        .queryExecution.executedPlan
      // the (band, bucket) probe join specifically — outer joins in the
      // chain transitively contain the scan and legitimately shuffle
      // their pair-sized frames
      val sides = plan.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == Set("band", "bucket") =>
          Seq(j.left, j.right)
        case j: ShuffledHashJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == Set("band", "bucket") =>
          Seq(j.left, j.right)
      }.flatten
      assert(sides.nonEmpty, s"no (band, bucket) join in the plan:\n$plan")
      val indexSides = sides.filter(_.collectFirst {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
      }.nonEmpty)
      assert(indexSides.nonEmpty,
        s"the screen must join against the bucketed table scan:\n$plan")
      indexSides.foreach { side =>
        assert(side.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
          s"index side must consume the bucketing, never re-shuffle:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("SplitBandIndexStore: verdicts == combined layout; band AND sig index sides Exchange-free") {
    import graft.ops.Dedup
    val old = (0L until 64L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i payload$i end"))
      .toDF("doc_id", "text")
    val batch = (0L until 32L).map { i =>
      val id = i + 1000L
      if (i % 4 == 0)
        (id, s"alpha beta gamma delta epsilon zeta token$i payload$i end")
      else (id, s"nu xi omicron pi rho sigma fresh$i body$i tail")
    }.toDF("doc_id", "text")

    val store = new SplitBandIndexStore(spark,
      bandsTable = "bspec_split_bands", sigsTable = "bspec_split_sigs", buckets = 4)
    store.publish(old, "doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))
    val viaSplit = store.screen(batch, "doc_id", "text").collect().map(key).toMap
    val combined = Dedup.dedupAgainstIndex(batch,
        Dedup.minhashBandIndex(old, "doc_id", "text"), "doc_id", "text")
      .collect().map(key).toMap
    assert(viaSplit === combined,
      "split layout must produce verdict-identical output, est included")

    val (aqe, bcast) = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val plan = store.screen(batch, "doc_id", "text")
        .queryExecution.executedPlan
      def sidesOf(keys: Set[String]) = plan.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == keys =>
          Seq(j.left, j.right)
        case j: ShuffledHashJoinExec
          if j.leftKeys.flatMap(_.references).map(_.name).toSet == keys =>
          Seq(j.left, j.right)
      }.flatten
      def pinBucketedSide(keys: Set[String], table: String, what: String): Unit = {
        val sides = sidesOf(keys)
        assert(sides.nonEmpty, s"no $keys join in the plan:\n$plan")
        // the INDEX side is the one scanning the named bucketed table
        // directly (the other side may transitively contain a bucketed
        // scan — e.g. the candidates subtree contains the bands scan —
        // and legitimately shuffles its batch-derived rows)
        val indexSides = sides.filter(_.collectFirst {
          case s: FileSourceScanExec
            if s.relation.bucketSpec.isDefined &&
              s.tableIdentifier.exists(_.table == table) => s
        }.nonEmpty).filterNot(_.exists {
          case j: SortMergeJoinExec => true
          case j: ShuffledHashJoinExec => true
          case _ => false
        })
        assert(indexSides.nonEmpty, s"$what must scan $table directly:\n$plan")
        indexSides.foreach { side =>
          assert(side.collectFirst { case e: ShuffleExchangeLike => e }.isEmpty,
            s"$what side must consume its bucketing, never re-shuffle:\n$side")
        }
      }
      pinBucketedSide(Set("band", "bucket"), "bspec_split_bands", "band probe")
      // the sig lookup joins on the aliased bucket column — alias-aware
      // output partitioning must carry the bucketing through the rename
      pinBucketedSide(Set("old_id"), "bspec_split_sigs", "signature lookup")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("SplitBandIndexStore day one: screen before any publish is clean; ingest screens-then-admits in one pass") {
    val store = new SplitBandIndexStore(spark,
      bandsTable = "bspec_split2_bands", sigsTable = "bspec_split2_sigs", buckets = 4)
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "nu xi omicron pi rho sigma tau upsilon phi chi")).toDF("doc_id", "text")
    // day one: no tables yet — every doc screens clean, nothing throws
    val day0 = store.screen(b1, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(day0 === Map(1L -> false, 2L -> false))
    // ingest batch 1: screened against EMPTY history (clean), then admitted
    val v1 = store.ingest(b1, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v1 === Map(1L -> false, 2L -> false),
      "a batch must never screen against its own admit")
    // ingest batch 2: the exact copy of doc 1 flags; the novel doc is clean
    val b2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "completely novel content never indexed before anywhere at all")
    ).toDF("doc_id", "text")
    val v2 = store.ingest(b2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(v2(10L) === ((1L, Some(1L), true)))
    assert(v2(11L) === ((0L, None, false)))
  }

  test("dedupAgainstIndexSplit: duplicate index rows (at-least-once appends) do not inflate counts") {
    import graft.ops.Dedup
    val old = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "nu xi omicron pi rho sigma tau upsilon phi chi")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(old, "doc_id", "text", 16)
      .select(col("id").as("doc_id"), col("sig"))
    // the documented at-least-once state: every index row appended twice
    val dupSigs = sigs.unionByName(sigs)
    val dupBands = Dedup.bandRowsFromSigs(dupSigs, 4, 4)
    val got = Dedup.dedupAgainstIndexSplit(batch, dupBands, dupSigs,
        "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2), r.getBoolean(4))).toSet
    assert(got === Set((10L, 1L, 1L, true)),
      s"one distinct duplicate must count once, got $got")
    // parity with the combined layout under the SAME duplicated state
    val ix = Dedup.minhashBandIndex(old, "doc_id", "text")
    val combined = Dedup.dedupAgainstIndex(batch, ix.unionByName(ix),
        "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2), r.getBoolean(4))).toSet
    assert(combined === got)
  }

  test("crash-replay defense: a batch screened against an index holding its OWN rows never self-matches") {
    import graft.ops.Dedup
    // the at-least-once replay window: a prior attempt's saves landed
    // (the index already contains the batch) but the stream checkpoint
    // didn't, so the same batch screens again. Every doc would collide
    // with itself at est = 1.0 — the old_id =!= new_id filter must
    // yield the ORIGINAL verdicts instead, in both layouts.
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),   // replayed vs itself
      (2L, "completely novel content never indexed before anywhere at all"))
      .toDF("doc_id", "text")
    val ix = Dedup.minhashBandIndex(batch, "doc_id", "text") // index = the batch itself
    val combined = Dedup.dedupAgainstIndex(batch, ix, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(combined === Map(1L -> false, 2L -> false),
      s"replay must not self-match, got $combined")
    val sigs = Dedup.minhashSignatures(batch, "doc_id", "text", 16)
      .select(col("id").as("doc_id"), col("sig"))
    val split = Dedup.dedupAgainstIndexSplit(batch,
        Dedup.bandRowsFromSigs(sigs, 4, 4), sigs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(split === Map(1L -> false, 2L -> false))
    // and a replay against history + its own rows still reports the
    // REAL prior duplicate (the filter drops only the self pair)
    val full = ix.unionByName(Dedup.minhashBandIndex(
      history.select(col("doc_id") + 100 as "doc_id", col("text")),
      "doc_id", "text"))
    val replay = Dedup.dedupAgainstIndex(batch, full, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(replay(1L) === ((Some(101L), true)))
    assert(replay(2L) === ((None, false)))
  }

  test("index retention: expireBefore drops aged docs from both layouts; unstamped rows exempt; screens forget expired history") {
    val texts = Map(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "nu xi omicron pi rho sigma tau upsilon phi chi")
    // ---- combined layout ----
    val store = new BandIndexStore(spark, table = "bspec_exp_combined", buckets = 4)
    store.publish(
      Seq((1L, texts(1L), 1000L)).toDF("doc_id", "text", "ts"),
      "doc_id", "text", tsCol = Some("ts"))
    store.publish(
      Seq((2L, texts(2L), 5000L)).toDF("doc_id", "text", "ts"),
      "doc_id", "text", tsCol = Some("ts"))
    // doc 1 (ts 1000) ages out; doc 2 (ts 5000) survives
    assert(store.expireBefore(2000L) === 4L) // 4 bands x 1 doc
    val ids = store.load().select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
    // the screen no longer remembers the expired doc
    val v = store.screen(
        Seq((10L, texts(1L)), (20L, texts(2L))).toDF("doc_id", "text"),
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v === Map(10L -> false, 20L -> true))
    // unstamped publishes are exempt from any cutoff
    store.publish(Seq((3L, texts(1L))).toDF("doc_id", "text"), "doc_id", "text")
    assert(store.expireBefore(Long.MaxValue) === 0L +
      0L + /* doc 3 rows are null-ts */ 4L /* doc 2's stamped rows age out */)
    // ---- split layout: expiry reaches bands through the sigs join ----
    val split = new SplitBandIndexStore(spark,
      bandsTable = "bspec_exp_bands", sigsTable = "bspec_exp_sigs", buckets = 4)
    split.publish(Seq((1L, texts(1L), 1000L)).toDF("doc_id", "text", "ts"),
      "doc_id", "text", tsCol = Some("ts"))
    split.publish(Seq((2L, texts(2L), 5000L)).toDF("doc_id", "text", "ts"),
      "doc_id", "text", tsCol = Some("ts"))
    assert(split.expireBefore(2000L) === 1L) // one sig row dropped
    assert(split.loadBands().filter(col("doc_id") === 1L).count() === 0,
      "expired doc's band rows must go with its signature")
    val sv = split.screen(
        Seq((10L, texts(1L)), (20L, texts(2L))).toDF("doc_id", "text"),
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(sv === Map(10L -> false, 20L -> true))
  }

  test("HashIndexStore: perceptual ingestion gate — screen/ingest/replay/expiry over a bucketed block table") {
    import graft.ops.{Dedup, ImageHash}
    def h(id: Long, p: Boolean = false): Long =
      ImageHash.dHash64(ImageHash.fixturePng(id, p)).get
    val store = new graft.sources.HashIndexStore(spark,
      table = "bspec_hash_index", buckets = 4)
    // day one: clean screens before any publish
    val day0 = store.screen(Seq((9L, h(62L))).toDF("media_id", "dhash"),
      "media_id", "dhash").collect()
    assert(day0.map(r => r.getLong(0) -> r.getBoolean(4)).toMap === Map(9L -> false))
    // publish history (stamped), then screen a batch holding one
    // perturbed copy of an indexed image and one novel image
    val history = Seq((62L, h(62L), 1000L), (93L, h(93L), 5000L))
      .toDF("media_id", "dhash", "ts")
    store.publish(history, "media_id", "dhash", tsCol = Some("ts"))
    val batch = Seq((1000L, h(62L, p = true)), (2000L, h(7777L)))
      .toDF("media_id", "dhash")
    val v = store.screen(batch, "media_id", "dhash").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(v(1000L) === ((Some(62L), true)), s"perturbed copy must flag: $v")
    assert(v(2000L) === ((None, false)))
    // verdict parity with the in-memory operator over the same frames
    val op = Dedup.hammingDedupAgainstIndex(batch,
        Dedup.hashBlockRows(history, "media_id", "dhash"), "media_id", "dhash")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(op === v)
    // ingest admits the batch; a REPLAY of the same batch against an
    // index now holding its own rows must not self-match (old==new
    // dropped) and still reports the true prior duplicate
    store.ingest(batch, "media_id", "dhash")
    val replay = store.screen(batch, "media_id", "dhash").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(replay(1000L) === ((Some(62L), true)), "replay keeps the real dup")
    assert(replay(2000L) === ((None, false)), "replay must not self-match")
    // expiry: drop history older than ts 2000 — the aged doc 62 stops
    // flagging its copies, doc 93 survives (batch rows are unstamped
    // and exempt)
    assert(store.expireBefore(2000L) === 4L) // 4 block rows of doc 62
    val after = store.screen(Seq((3000L, h(62L, p = true)), (4000L, h(93L)))
        .toDF("media_id", "dhash"), "media_id", "dhash").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // 3000 still matches batch doc 1000 (same perturbed hash, unstamped)
    assert(after(4000L) === true, "unexpired doc still screens")
    assert(store.load().filter(col("id") === 62L).count() === 0, "aged doc gone")
  }

  test("FrameSetIndexStore: batch frame-set gate — screen/ingest/replay over the STREAMING FrameSetStore table") {
    import graft.ops.Dedup
    val table = "bspec_frame_sets"
    // history written by the streaming sink's store (same table
    // layout: id, fhash, n bucketed by fhash) — the parity the split
    // batch/streaming stack promises
    val sinkStore = new graft.streaming.Streaming.FrameSetStore(spark, table, buckets = 4)
    def rows(id: Long, fs: Seq[Long]) = fs.map(f => (id, f, fs.size.toLong))
    sinkStore.save((rows(62L, 1L to 16L) ++ rows(93L, 101L to 116L))
      .toDF("id", "fhash", "n"))
    val gate = new FrameSetIndexStore(spark, table, buckets = 4)
    // batch: 1000 shares 15 of video 62's 16 frames plus one new
    // (J = 15/17 = 0.882); 2000 is disjoint
    val batch = ((1L to 15L) :+ 999L).map(f => (1000L, f)) ++
      (201L to 216L).map(f => (2000L, f))
    val v = gate.screen(batch.toDF("media_id", "fhash"), "media_id", "fhash")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(v(1000L) === ((Some(62L), Some(0.882353), true)), s"got $v")
    assert(v(2000L) === ((None, None, false)))
    // operator parity straight over the loaded table rows
    val op = Dedup.frameSetDedupAgainstIndex(
        batch.toDF("media_id", "fhash"), gate.load())
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(op === v)
    // ingest admits the batch; a REPLAY against an index now holding
    // its own rows re-emits the ORIGINAL verdicts (no self-match)
    gate.ingest(batch.toDF("media_id", "fhash"), "media_id", "fhash")
    val replay = gate.screen(batch.toDF("media_id", "fhash"), "media_id", "fhash")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(replay === v, "replay must re-emit original verdicts")
  }

  test("FrameSetIndexStore: stamped publishes age out whole videos atomically") {
    val gate = new FrameSetIndexStore(spark, "bspec_frame_sets_ts", buckets = 4)
    def frames(id: Long, base: Long, ts: Long) =
      (1L to 16L).map(f => (id, base + f, ts))
    gate.publish(frames(77L, 0L, 1000L).toDF("media_id", "fhash", "ts"),
      "media_id", "fhash", tsCol = Some("ts"))
    gate.publish(frames(88L, 500L, 5000L).toDF("media_id", "fhash", "ts"),
      "media_id", "fhash", tsCol = Some("ts"))
    assert(gate.expireBefore(2000L) === 16L, "all 16 rows of video 77 age together")
    def screenIds(base: Long) = gate.screen(
        (1L to 16L).map(f => (9000L + base, base + f)).toDF("media_id", "fhash"),
        "media_id", "fhash")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(screenIds(0L) === Map(9000L -> false), "aged video stops flagging copies")
    assert(screenIds(500L) === Map(9500L -> true), "unexpired video still screens")
  }

  test("gates are modality-agnostic: windowed audio screens through FrameSetIndexStore") {
    import graft.ops.AudioHash
    val gate = new FrameSetIndexStore(spark, "bspec_audio_windows",
      buckets = 4, threshold = 0.85)
    def wh(id: Long, trim: Int): Seq[Long] =
      AudioHash.windowHashes(AudioHash.fixtureWavTrimmed(id, trim)).get
    gate.publish(
      (wh(5L, 0).map(h => (5L, h)) ++ wh(6L, 0).map(h => (6L, h)))
        .toDF("media_id", "fhash"), "media_id", "fhash")
    // a copy of recording 5 trimmed by 3 frames shares 61 of its 64
    // windows (J = 61/64 = 0.953); recording 900 is novel
    val v = gate.screen(
        (wh(5L, 3).map(h => (300L, h)) ++ wh(900L, 0).map(h => (901L, h)))
          .toDF("media_id", "fhash"), "media_id", "fhash")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(v(300L) === ((Some(5L), true)), s"trimmed copy must flag: $v")
    assert(v(901L) === ((None, false)))
  }

  test("gates are modality-agnostic: stills screen against a published video FRAME-hash index") {
    import graft.ops.{ImageHash, VideoHash}
    // the q137 pairing as an INCREMENTAL gate: publish per-frame video
    // hashes into the ordinary HashIndexStore (multiple hashes per id
    // is just more block rows), screen still images against it — one
    // 64-bit hash space end to end
    val xstore = new graft.sources.HashIndexStore(spark,
      table = "bspec_xmodal_index", buckets = 4)
    val frameRows = Seq(7L, 8L).flatMap(v =>
      VideoHash.frameDHashes(VideoHash.fixtureMp4(v)).get.distinct.map(h => (v, h)))
    xstore.publish(frameRows.toDF("media_id", "dhash"), "media_id", "dhash")
    val still = ImageHash.dHash64(ImageHash.fixturePng(7L * 131 + 3)).get   // IS frame 3 of video 7
    val edited = ImageHash.dHash64(
      ImageHash.fixturePng(8L * 131 + 5, perturb = true)).get               // edited frame 5 of video 8
    val novel = ImageHash.dHash64(ImageHash.fixturePng(999L)).get
    val v = xstore.screen(
        Seq((1L, still), (2L, edited), (3L, novel)).toDF("media_id", "dhash"),
        "media_id", "dhash")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(v(1L) === ((Some(7L), Some(0), true)), s"exact still must flag at 0 bits: $v")
    assert(v(2L)._1 === Some(8L) && v(2L)._3 === true, s"edited still must flag: $v")
    assert(v(3L) === ((None, None, false)))
  }

  test("LabelStore: a torn dual append cannot strand a co-member (cluster layout writes first)") {
    val store = new LabelStore(spark, "bspec_lbl_id", "bspec_lbl_cluster", buckets = 4)
    store.ingest(Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b"))
    // simulate the torn batch: the merge (2,100),(100,6) relabeled
    // {1,2,5,6,100}→1 but crashed AFTER the cluster append, BEFORE the
    // id append — the replay must converge, not strand member 5
    val relabel = Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (100L, 1L))
      .toDF("id", "cluster")
    Bucketed.appendAligned(spark, relabel, store.clusterTable,
      Seq("cluster"), 4, sortCols = Seq("cluster"))
    val replay = store.ingest(Seq((2L, 100L), (100L, 6L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L))
    // a later merge must relabel EVERYONE, including the co-member the
    // torn write could have stranded under id-first ordering
    val merged = store.ingest(Seq((0L, 1L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L,
      6L -> 0L, 100L -> 0L), s"co-member 5 must follow the merge: $merged")
    // compaction preserves the expiry-ready schema appendAligned set up
    store.compact()
    assert(spark.table(store.idTable).columns.contains("ts"),
      "compact must not downgrade to the legacy ts-less schema")
    // first-batch torn write: only the cluster table exists — replay
    // must not throw (membersOf guards on ITS table), just converge
    val store2 = new LabelStore(spark, "bspec_lbl2_id", "bspec_lbl2_cluster", 4)
    Bucketed.appendAligned(spark, Seq((7L, 7L), (8L, 7L)).toDF("id", "cluster"),
      store2.clusterTable, Seq("cluster"), 4, sortCols = Seq("cluster"))
    val r2 = store2.ingest(Seq((7L, 8L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(7L -> 7L, 8L -> 7L))
  }

  test("LabelStore.removeMembers: rewrite publishes the takedown labeling, removed ids leave BOTH layouts, store stays maintainable") {
    val store = new LabelStore(spark, "bspec_rm_id", "bspec_rm_cluster", buckets = 4)
    // chain 1-2-3-4-5 + pair 10-11, built through the normal fold path
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    store.ingest(edges.toDF("id_a", "id_b"))
    def pairsAmong(ms: org.apache.spark.sql.DataFrame) =
      edges.toDF("id_a", "id_b")
        .join(ms.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
        .join(ms.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // removing 3 splits the chain; removing 1 deletes the cluster's
    // min — labels must INCREASE, which only a rewrite can publish
    val got = store.removeMembers(Seq(1L, 3L).toDF("id"), pairsAmong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 2L, 4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L))
    // the published store reads back the same labeling
    assert(store.loadAll().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === got)
    // removed ids are gone from BOTH physical layouts — min-per-id
    // could not have hidden a stale smaller label anyway, but a
    // compliance wipe must not leave rows behind
    assert(spark.table(store.idTable).filter(col("id").isin(1L, 3L)).count() === 0)
    assert(spark.table(store.clusterTable).filter(col("id").isin(1L, 3L)).count() === 0)
    // the rewrite preserves the expiry-ready schema and the store
    // stays maintainable: a later merge folds normally
    assert(spark.table(store.idTable).columns.contains("ts"))
    val merged = store.ingest(Seq((2L, 4L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(2L -> 2L, 4L -> 2L, 5L -> 2L))
    // the completed removal left no pending marker behind
    assert(!store.removalPending)
  }

  test("LabelStore.removeMembers: a torn rewrite refuses maintenance and heals on re-run") {
    val store = new LabelStore(spark, "bspec_rm2_id", "bspec_rm2_cluster", buckets = 4)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    store.ingest(edges.toDF("id_a", "id_b"))
    def pairsAmong(ms: org.apache.spark.sql.DataFrame) =
      edges.toDF("id_a", "id_b")
        .join(ms.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
        .join(ms.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // simulate the torn removal of id 1 (the cluster's MIN): the
    // pending marker was written and the ID layout rewritten, but the
    // crash hit before the cluster layout — layouts now DISAGREE
    // (id layout says cluster 2; cluster layout still keys cluster 1)
    Seq(1L).toDF("id").write.mode("overwrite").saveAsTable(store.pendingTable)
    val torn = Seq((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster").withColumn("ts", lit(null).cast("long"))
    Bucketed.writeKeys(torn.repartition(4, col("id")), store.idTable,
      Seq("id"), 4, sortCols = Seq("id"))
    // maintenance over the torn state must refuse, not strand member 3
    assert(store.removalPending)
    val e = intercept[IllegalStateException] {
      store.ingest(Seq((2L, 100L)).toDF("id_a", "id_b"))
    }
    assert(e.getMessage.contains("unfinished member removal"))
    // the healing re-run with the marker's own ids republishes BOTH
    // layouts consistently and clears the marker
    val healed = store.removeMembers(store.pendingRemovalIds, pairsAmong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(healed === Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
    assert(!store.removalPending)
    // and the previously-refused merge now folds, pulling co-member 3
    val merged = store.ingest(Seq((2L, 100L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(2L -> 2L, 3L -> 2L, 100L -> 2L))
  }

  test("LabelStore.removeMembers: a NEW removal over a torn one UNIONS the pending ids, never overwrites them") {
    val store = new LabelStore(spark, "bspec_rm3_id", "bspec_rm3_cluster", buckets = 4)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    store.ingest(edges.toDF("id_a", "id_b"))
    def pairsAmong(ms: org.apache.spark.sql.DataFrame) =
      edges.toDF("id_a", "id_b")
        .join(ms.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
        .join(ms.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // removal of id 1 crashed right after writing its marker (layouts
    // untouched — id 1 is still stored)
    Seq(1L).toDF("id").write.mode("overwrite").saveAsTable(store.pendingTable)
    // an UNRELATED takedown arrives: it must also complete the
    // crashed one — overwriting the marker would resurrect id 1
    // forever (the marker is the only record of that takedown)
    val got = store.removeMembers(Seq(10L).toDF("id"), pairsAmong)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 2L, 3L -> 2L, 11L -> 11L),
      s"both the crashed removal's id 1 and the new id 10 must go: $got")
    assert(spark.table(store.idTable).filter(col("id").isin(1L, 10L)).count() === 0)
    assert(!store.removalPending)
  }

  test("appendAligned: legacy ts-less tables stay appendable unstamped; stamped publishes into them refuse loudly") {
    import graft.ops.Dedup
    // simulate a pre-retention-era published index: band rows WITHOUT
    // a ts column, written directly (what round-9 append produced)
    val legacy = "bspec_legacy_index"
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows1 = Dedup.minhashBandIndex(
      Seq((1L, text1)).toDF("doc_id", "text"), "doc_id", "text")
    graft.sources.Bucketed.writeKeys(
      rows1.repartition(4, col("band"), col("bucket")),
      legacy, Seq("band", "bucket"), 4, sortCols = Seq("band", "bucket"))
    assert(!spark.table(legacy).columns.contains("ts"))
    val store = new BandIndexStore(spark, table = legacy, buckets = 4)
    // a legacy table can't prove its construction — the store refuses
    // (fail-open hazard) until the verified one-time adoption
    val tagErr = intercept[IllegalStateException] {
      store.publish(Seq((2L, "nu xi")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(tagErr.getMessage.contains("predates construction tags"))
    Bucketed.setTag(spark, legacy, FrameSetIndexStore.TagKey, store.contentTag)
    // unstamped publish into the legacy table must append, not throw
    // on schema mismatch (the naive always-add-ts append did)
    store.publish(Seq((2L, "nu xi omicron pi rho sigma tau upsilon phi chi"))
      .toDF("doc_id", "text"), "doc_id", "text")
    assert(store.load().select("doc_id").distinct().count() === 2)
    // STAMPED publish must refuse loudly: dropping the stamps silently
    // would disable expiry without a trace
    val e = intercept[IllegalArgumentException] {
      store.publish(Seq((3L, text1, 1000L)).toDF("doc_id", "text", "ts"),
        "doc_id", "text", tsCol = Some("ts"))
    }
    assert(e.getMessage.contains("predates retention stamps"))
    // the documented migration: ONE compact() — compactRewrite adds the
    // null ts column (still horizon-exempt), then stamped publishes work
    store.compact()
    assert(spark.table(legacy).columns.contains("ts"), "compact migrates schema")
    store.publish(Seq((3L, text1, 1000L)).toDF("doc_id", "text", "ts"),
      "doc_id", "text", tsCol = Some("ts"))
    assert(store.load().select("doc_id").distinct().count() === 3)
    assert(store.expireBefore(2000L) === 4L, "migrated stamps drive expiry")
  }

  test("band stores refuse cross-construction screens loudly; HashIndexStore content tags gate hash families") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val store = new BandIndexStore(spark, table = "bspec_ctag_index",
      buckets = 4, k = 16, bands = 4)
    store.publish(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    // a k=24 handle on the k=16 table: band keys cut from 24-hash sigs
    // match NOTHING in a 16-hash index — every dup would pass as novel
    // (fails OPEN), so the mismatch must refuse instead
    val other = new BandIndexStore(spark, table = "bspec_ctag_index",
      buckets = 4, k = 24, bands = 6)
    val e1 = intercept[IllegalStateException] {
      other.screen(Seq((2L, text)).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e1.getMessage.contains("minhash:k16:b4:s3") &&
      e1.getMessage.contains("minhash:k24:b6:s3"))
    intercept[IllegalStateException] {
      other.publish(Seq((2L, text)).toDF("doc_id", "text"), "doc_id", "text")
    }
    // split store: same contract on the bands table
    val split = new SplitBandIndexStore(spark,
      bandsTable = "bspec_ctag_bands", sigsTable = "bspec_ctag_sigs", buckets = 4)
    split.publish(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val splitOther = new SplitBandIndexStore(spark,
      bandsTable = "bspec_ctag_bands", sigsTable = "bspec_ctag_sigs",
      buckets = 4, k = 24, bands = 6)
    intercept[IllegalStateException] {
      splitOther.ingest(Seq((2L, text)).toDF("doc_id", "text"), "doc_id", "text")
    }
    // hash index: the family is caller knowledge — Some(tag) gates,
    // a dhash handle on an audio-fp table refuses in both directions
    val hstore = new graft.sources.HashIndexStore(spark,
      table = "bspec_ctag_hash", buckets = 4, contentTag = Some("dhash:8x8"))
    hstore.publish(Seq((1L, 0x0F0FL)).toDF("id", "h"), "id", "h")
    val haudio = new graft.sources.HashIndexStore(spark,
      table = "bspec_ctag_hash", buckets = 4, contentTag = Some("audiofp:v1"))
    intercept[IllegalStateException] {
      haudio.screen(Seq((2L, 0x0F0FL)).toDF("id", "h"), "id", "h")
    }
    intercept[IllegalStateException] {
      haudio.publish(Seq((2L, 0x0F0FL)).toDF("id", "h"), "id", "h")
    }
    // the matching handle keeps working
    assert(hstore.screen(Seq((2L, 0x0F0FL)).toDF("id", "h"), "id", "h")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap === Map(2L -> true))
  }

  test("SplitBandIndexStore.ingest stamps event time so gate-admitted docs expire") {
    val store = new SplitBandIndexStore(spark,
      bandsTable = "bspec_ingts_bands", sigsTable = "bspec_ingts_sigs", buckets = 4)
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 1000L),
      (2L, "nu xi omicron pi rho sigma tau upsilon phi chi", 5000L))
      .toDF("doc_id", "text", "event_ms")
    val v = store.ingest(batch, "doc_id", "text", tsCol = Some("event_ms"))
    assert(v.count() === 2)
    // without the stamp these rows would be ts-null and PERMANENTLY
    // exempt from retention — the gate's documented release valve
    assert(store.expireBefore(2000L) === 1L, "doc 1's signature expires")
    assert(store.loadSigs().select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(2L))
    assert(store.loadBands().filter(col("doc_id") === 1L).count() === 0,
      "orphaned band rows follow the expired signature out")
  }

  test("SplitBandIndexStore: sigs write before bands; compact() detects and drops orphan band rows") {
    import graft.ops.Dedup
    val store = new SplitBandIndexStore(spark,
      bandsTable = "bspec_torn_bands", sigsTable = "bspec_torn_sigs", buckets = 4)
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    store.publish(b1, "doc_id", "text")
    assert(store.compact() === 0L, "healthy store: no orphans")
    // simulate a torn publish under the OLD bands-first order: band
    // rows for doc 99 exist with no signature anywhere
    val orphanSigs = Dedup.minhashSignatures(
        Seq((99L, "nu xi omicron pi rho sigma tau upsilon phi chi"))
          .toDF("doc_id", "text"), "doc_id", "text", 16)
      .select(col("id").as("doc_id"), col("sig"))
    Bucketed.writeKeys(
      Dedup.bandRowsFromSigs(orphanSigs, 4, 4)
        .repartition(4, col("band"), col("bucket")),
      store.bandsTable, Seq("band", "bucket"), 4,
      sortCols = Seq("band", "bucket"), mode = "append")
    // the orphan silently drops its candidates at the sig join (the
    // failure mode); compact must detect it, drop exactly those rows,
    // and leave the healthy doc's coverage intact
    assert(store.compact() === 4L) // 4 bands × 1 doc
    assert(store.loadBands().filter(col("doc_id") === 99L).count() === 0)
    val v = store.screen(b1.select(col("doc_id") + 10 as "doc_id", col("text")),
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v === Map(11L -> true), "healthy doc still screens as dup after repair")
  }
  test("construction tags: a gate refuses an index built under a different window framing") {
    import graft.ops.AudioHash
    val table = "bspec_tagged_windows"
    val tagged = new FrameSetIndexStore(spark, table, buckets = 4,
      threshold = 0.85, contentTag = Some(AudioHash.windowFramingTag()))
    def wh(id: Long): Seq[Long] =
      AudioHash.windowHashes(AudioHash.fixtureWavTrimmed(id, 0)).get
    // first publish stamps the fresh table with the construction
    tagged.publish(wh(5L).map(h => (5L, h)).toDF("media_id", "fhash"),
      "media_id", "fhash")
    assert(Bucketed.getTag(spark, table, FrameSetIndexStore.TagKey)
      === Some("audio-window:t10ms:w65"))
    // a same-construction handle keeps working (publish AND screen)
    val again = new FrameSetIndexStore(spark, table, buckets = 4,
      threshold = 0.85, contentTag = Some(AudioHash.windowFramingTag()))
    again.publish(wh(6L).map(h => (6L, h)).toDF("media_id", "fhash"),
      "media_id", "fhash")
    assert(again.screen(wh(5L).map(h => (300L, h)).toDF("media_id", "fhash"),
      "media_id", "fhash").collect().map(r => r.getLong(0) -> r.getBoolean(4))
      .toMap === Map(300L -> true))
    // a LEGACY-framing handle refuses both directions — the old
    // fixed-160 fingerprints hash differently, so screening across
    // the constructions would fail OPEN (copies pass as novel)
    val legacyFraming = new FrameSetIndexStore(spark, table, buckets = 4,
      threshold = 0.85,
      contentTag = Some(AudioHash.windowFramingTag(frameSamples = 160)))
    val eScreen = intercept[IllegalStateException] {
      legacyFraming.screen(wh(5L).map(h => (301L, h)).toDF("media_id", "fhash"),
        "media_id", "fhash")
    }
    assert(eScreen.getMessage.contains("audio-window:s160:w65")
      && eScreen.getMessage.contains("audio-window:t10ms:w65"))
    intercept[IllegalStateException] {
      legacyFraming.publish(wh(7L).map(h => (7L, h)).toDF("media_id", "fhash"),
        "media_id", "fhash")
    }
    // compaction must not drop the stamp (overwrite recreates the
    // catalog entry) — and an untagged handle still reads the store
    tagged.compact()
    assert(Bucketed.getTag(spark, table, FrameSetIndexStore.TagKey)
      === Some("audio-window:t10ms:w65"))
    assert(new FrameSetIndexStore(spark, table, buckets = 4)
      .load().count() > 0)
  }

  test("construction tags: an untagged legacy store refuses a tagged gate until adopted") {
    import graft.ops.AudioHash
    val table = "bspec_untagged_windows"
    // legacy store: published before construction tags existed
    new FrameSetIndexStore(spark, table, buckets = 4).publish(
      (1L to 70L).map(h => (5L, h)).toDF("media_id", "fhash"),
      "media_id", "fhash")
    val tagged = new FrameSetIndexStore(spark, table, buckets = 4,
      contentTag = Some(AudioHash.windowFramingTag()))
    val e = intercept[IllegalStateException] {
      tagged.screen((1L to 70L).map(h => (300L, h)).toDF("media_id", "fhash"),
        "media_id", "fhash")
    }
    assert(e.getMessage.contains("predates construction tags"))
    // the one-time migration after out-of-band verification
    tagged.adoptTag()
    assert(tagged.screen((1L to 70L).map(h => (300L, h)).toDF("media_id", "fhash"),
        "media_id", "fhash")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      === Map(300L -> true))
  }

  test("construction tags: the streaming FrameSetStore verifies the same stamp as the batch gate") {
    import graft.ops.AudioHash
    val table = "bspec_stream_tagged"
    val sink = new graft.streaming.Streaming.FrameSetStore(spark, table,
      buckets = 4, contentTag = Some(AudioHash.windowFramingTag()))
    sink.save((1L to 70L).map(h => (5L, h, 70L)).toDF("id", "fhash", "n"))
    // the batch handle sees the streaming sink's stamp
    assert(Bucketed.getTag(spark, table, FrameSetIndexStore.TagKey)
      === Some("audio-window:t10ms:w65"))
    val mismatched = new graft.streaming.Streaming.FrameSetStore(spark, table,
      buckets = 4, contentTag = Some(AudioHash.windowFramingTag(160)))
    intercept[IllegalStateException] {
      mismatched.save((1L to 70L).map(h => (6L, h, 70L)).toDF("id", "fhash", "n"))
    }
    intercept[IllegalStateException] { mismatched.load(spark) }
  }

  test("LabelStore.compact and maybeCompact hold the removal-pending line") {
    val store = new LabelStore(spark, "bspec_cpend_id", "bspec_cpend_cluster",
      buckets = 4)
    store.ingest(Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"))
    Seq(1L).toDF("id").write.mode("overwrite").saveAsTable(store.pendingTable)
    val e = intercept[IllegalStateException] { store.compact() }
    assert(e.getMessage.contains("unfinished member removal"))
    // the streaming release valve reports "no compaction" rather than
    // crashing the valve check
    assert(store.maybeCompact(ratio = 1.5, floor = 0L) === false)
    spark.sql(s"DROP TABLE IF EXISTS ${store.pendingTable}")
    store.compact() // healed store compacts normally
    assert(store.loadAll().count() === 4L)
  }

  test("SrpIndexStore: semantic gate — screen/ingest/replay, construction tag, orphan repair, expiry") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // deterministic 8-dim embeddings: vec k = unit-ish vector leaning
    // along axis k%4 with a k-dependent wobble; copies are exact
    def vec(axis: Int, wobble: Float): Seq[Float] =
      (0 until 8).map(d => if (d == axis) 1f else if (d == (axis + 4)) wobble else 0.01f * d)
    def frame(rows: Seq[(Long, Seq[Float])]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }, 2),
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
    val store = new SrpIndexStore(spark, "bspec_srp_buckets", "bspec_srp_vecs",
      buckets = 4, planes = 6, tables = 2, threshold = 0.95)
    // day one: publish 8 distinct vectors
    val history = (0L until 8L).map(k => (k, vec((k % 4).toInt, 0.1f * k)))
    store.publish(frame(history), "vec_id", "embedding")
    assert(Bucketed.getTag(spark, "bspec_srp_buckets",
      FrameSetIndexStore.TagKey) === Some("srp:p6:t2"))
    // batch: 100 is an exact copy of vector 3 (cosine 1.0); 200 is a
    // fresh direction nothing indexed resembles
    val batch = frame(Seq((100L, vec(3, 0.3f)),
      (200L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f))))
    val v = store.screen(batch, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(v(100L) === ((1L, Some(3L), true)), s"exact copy must flag: $v")
    assert(v(200L) === ((0L, None, false)))
    // ingest admits; replay re-emits ORIGINAL verdicts (self-dup belt)
    store.ingest(batch, "vec_id", "embedding")
    val replay = store.screen(batch, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(replay === v, "replay must re-emit original verdicts")
    // MUTUAL in-batch near-dups: the gate screens against HISTORY, so
    // two identical batch vectors are both clean on first contact —
    // and a crash-replay against their own published rows must
    // re-emit clean, not flag them against each other (the batch-id
    // anti-join, not just a self filter)
    val twinVec: Seq[Float] = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 1f)
    val twins = frame(Seq((300L, twinVec), (301L, twinVec)))
    val vTwins = store.screen(twins, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(vTwins === Map(300L -> false, 301L -> false), s"got $vTwins")
    store.ingest(twins, "vec_id", "embedding")
    val replayTwins = store.screen(twins, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(replayTwins === vTwins,
      s"mutual-twin replay must re-emit original verdicts: $replayTwins")
    // a DIFFERENT construction refuses loudly in both directions
    val other = new SrpIndexStore(spark, "bspec_srp_buckets", "bspec_srp_vecs",
      buckets = 4, planes = 8, tables = 2)
    val e = intercept[IllegalStateException] {
      other.screen(batch, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("srp:p8:t2")
      && e.getMessage.contains("srp:p6:t2"))
    intercept[IllegalStateException] {
      other.publish(batch, "vec_id", "embedding")
    }
    // the r15 default bump's migration hazard, pinned: a store
    // published under an OLD construction must refuse a handle opened
    // at the current DEFAULTS (8,4) — never silently screen at the
    // wrong construction; explicit old params remain the opt-in
    val defHandle = new SrpIndexStore(spark, "bspec_srp_buckets",
      "bspec_srp_vecs", buckets = 4)
    val eDef = intercept[IllegalStateException] {
      defHandle.screen(batch, "vec_id", "embedding")
    }
    assert(eDef.getMessage.contains("srp:p8:t4")
      && eDef.getMessage.contains("srp:p6:t2"))
    // recall-targeted construction resolves from the audited table:
    // cheapest row meeting the target, loud refusal past the table
    assert(SrpIndexStore.forRecall(spark, 0.93).contentTag === "srp:p8:t4")
    assert(SrpIndexStore.forRecall(spark, 0.80).contentTag === "srp:p8:t2")
    intercept[IllegalArgumentException] {
      SrpIndexStore.forRecall(spark, 0.99)
    }
    // orphan repair: plant bucket rows with no vector; compact drops
    // exactly them and keeps the gate's verdicts intact (+ the tag)
    import org.apache.spark.sql.functions.col
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(999L, 0, 42L), Row(999L, 1, 43L)), 1),
        StructType(Seq(StructField("vec_id", LongType),
          StructField("t", IntegerType), StructField("bucket", LongType))))
      .write.mode("append").format("parquet")
      .insertInto("bspec_srp_buckets")
    assert(store.compact() === 2L)
    assert(Bucketed.getTag(spark, "bspec_srp_buckets",
      FrameSetIndexStore.TagKey) === Some("srp:p6:t2"),
      "compaction must preserve the construction tag")
    // 100 still matches old vector 3; 200's own admitted copy is
    // excluded by id (the self-dup belt) and nothing else resembles it
    assert(store.screen(batch, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      === Map(100L -> true, 200L -> false),
      "post-compact screen still verifies")
  }
}
