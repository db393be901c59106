package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Contrastive, Curation, Dedup, Graph, Multimodal, Selection, Sharding, Sketches, Stats, TextOps}

/** Stats / sketches / sharding / graph / multimodal-plumbing family: quantiles, heavy hitters, KMV/HLL/count-min, profiles, balance, drift, PSI, shards, shuffles, Z-order, rendezvous, manifests, as-of, sessionize, PageRank, diffs, media features.
  *
  * Split from the monolithic TrainingData registry by domain (round
  * 10, maintainability only): every query's Spark definition and its
  * DuckDB oracle SQL live in THIS file, in the same key order, so a
  * semantics change cannot land on one side without the other being
  * one screen away. Registered through [[TrainingData]]. */
private[queries] object TrainingStats {
  import TrainingShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal: REAL header decode through the mapPartitions path —
    // WAV duration (data len ÷ byte rate), MP4 duration + dimensions
    // (mvhd/tkhd box walk); image rows carry undecodable raw bytes →
    // null dims. The synth containers' parameters are arithmetic in
    // (byte length, doc_id), so the oracle reproduces every decoded
    // value without parsing binary.
    "q28_media_features" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(t(s, d, "documents"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("duration_ms"))
        .orderBy(col("media_id"))
    }),

    // Multimodal frame sampling over the real decoded MP4 durations.
    "q29_frame_sample" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(t(s, d, "documents"))
      Multimodal.sampleFrames(Multimodal.extractFeatures(media))
        .orderBy(col("media_id"), col("frame_ix"))
    }),

    // As-of (point-in-time) join: every click event attaches the latest
    // prior-or-equal purchase of the same user — one union + one
    // keyed window, never a range join. (user_id, ts) is unique in the
    // events table, so the backward match is deterministic.
    "q58_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      AsOfJoin.asofBackward(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          keyCol = "user_id", tsCol = "ts", rightCols = Seq("value"))
        .select(col("event_id"), col("user_id"), col("asof_value"), col("asof_ts"))
        .orderBy(col("event_id"))
    }),

    // Gap-based sessionization: per-user sessions split on >30-min
    // silences; per-session event counts and integer-exact durations.
    "q61_sessionize" -> ((s, d) => {
      // ONE pinned user-keyed exchange serves the session window AND
      // the per-session aggregation (hash(user_id) satisfies both;
      // AQE coalesced the implied exchanges to single tasks)
      AsOfJoin.sessionize(
          t(s, d, "events").repartition(s.sparkContext.defaultParallelism,
            col("user_id")),
          "user_id", "ts", gapMillis = 30L * 60L * 1000L)
        .groupBy(col("user_id"), col("session_ix"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          // `div`, not `/` — the Tables.load ns lesson (long `/` is
          // double division)
          expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 1000")
            .as("duration_ms"))
        .orderBy(col("user_id"), col("session_ix"))
    }),

    // KMV distinct-count sketch over part keys: md5-derived hashes make
    // the ESTIMATE itself oracle-checkable (engine HLLs are not).
    "q62_kmv_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Sketches.kmvDistinct(li, "l_partkey", k = 64)
        .crossJoin(broadcast(li.agg(
          countDistinct(col("l_partkey")).as("true_distinct"))))
    }),

    // Contiguous 0-based ids in a nontrivial deterministic order
    // (u60 of md5-of-text, doc_id tiebreak) — assigned by the
    // range-partitioned two-pass zip over LONG keys, never a
    // single-partition window; persist off (cheap deterministic scan).
    "q64_contiguous_ids" -> ((s, d) => {
      val keyed = t(s, d, "documents")
        .select(col("doc_id"), Sketches.hash60(col("text")).as("ord_key"))
      Sketches.contiguousIds(keyed, Seq("ord_key", "doc_id"),
          partitions = 0, persist = false)
        .select(col("row_ix"), col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Exact length deciles (PERCENTILE_DISC semantics) — the "where do
    // I cut?" pass before a length gate; ranks via the range-partitioned
    // two-pass zip, never a single-partition window.
    "q66_exact_quantiles" -> ((s, d) => {
      Stats.exactQuantiles(t(s, d, "documents"), "n_chars",
          Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0))
        .orderBy(col("q"))
    }),

    // Exact heavy-hitter tokens at >= 2% corpus share: one corpus walk,
    // map-side-combined counts; the total reuses the counts exchange.
    "q67_heavy_hitters" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      Stats.heavyHitters(toks, "tok", minShare = 0.02)
        .orderBy(col("value"))
    }),

    // k-anonymity suppression over (user, event_type) quasi-groups:
    // groups thinner than k=12 drop; payload rows never ride the
    // counting shuffle (left-semi join back).
    "q69_k_anonymity" -> ((s, d) => {
      Curation.kAnonymize(t(s, d, "events"), Seq("user_id", "event_type"),
          k = 12)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // Contrastive (anchor, positive, negative) triplets: positives are
    // the q23 MinHash-LSH near-dup pairs, negatives draw md5-
    // deterministically from the rank-addressed corpus.
    "q70_contrastive_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // repartition BEFORE the minhash kernel (the q130 doctrine)
      val pairs = Dedup.lshCandidatePairs(
        docs.widenedScan, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      Contrastive.contrastivePairs(docs, "doc_id", pairs)
        .orderBy(col("anchor"), col("positive"))
    }),

    // Leakage-safe split: q23's near-dup pairs resolve to clusters and
    // each CLUSTER (not doc) draws its train/val/test assignment — a
    // near-twin can never sit across train and test.
    "q71_leakage_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // repartition BEFORE the minhash kernel (the q130 doctrine)
      val pairs = Dedup.lshCandidatePairs(
        docs.widenedScan, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      Dedup.leakageSafeSplit(docs.select(col("doc_id")), "doc_id", pairs,
          trainFrac = 0.7, valFrac = 0.15)
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Per-language length quartiles — the per-domain calibration form
    // of q66; one shuffle on the group key feeds rank + size windows.
    "q72_grouped_quantiles" -> ((s, d) => {
      Stats.groupedQuantiles(t(s, d, "documents"), "lang", "n_chars",
          Seq(0.25, 0.5, 0.75))
        .orderBy(col("lang"), col("q"))
    }),

    // Snake-order balanced sharding: size-ranked docs deal into 8
    // shards in alternating direction — near-equal token totals per
    // shard, rank from the range-partitioned two-pass zip.
    "q85_snake_shards" -> ((s, d) => {
      Selection.snakeShards(t(s, d, "documents"), "doc_id", "text", nShards = 8)
        .orderBy(col("doc_id"))
    }),

    // PageRank centrality over the near-dup graph (exact pico-unit
    // arithmetic, 4 rounds): central docs are their neighborhoods'
    // representatives — a data-selection signal.
    "q78_pagerank" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // repartition BEFORE the minhash kernel (the q130 doctrine: the
      // single-row-group scan runs the 1.5 s signature pass on ONE
      // task) and checkpoint the pairs ONCE — the rank loop's every-
      // 3rd-round lineage checkpoint is its own job, so a lazy edge
      // frame re-ran the whole LSH pipeline per job (stage probe: two
      // 1.5 s single-task minhash stages).
      val pairs = Dedup.lshCandidatePairs(
          docs.widenedScan,
          "doc_id", "text", k = 16, bands = 4, shingleSize = 3)
        .transform(graft.core.Materialize.frame)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      Graph.pageRank(docs.select(col("doc_id")), edges, iterations = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // PageRank with dangling-mass redistribution, over the DIRECTED
    // candidate pairs (id_a→id_b): most docs have out-degree 0, the
    // dangling-heavy shape of real link graphs — each round their
    // damped mass is shared uniformly, so total rank is conserved and
    // scores stay comparable across domains.
    "q79_pagerank_dangling" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // same single-split accommodation as q78 — see the note there
      // (pageRank's redistribution mode already checkpoints the edge
      // frame, so no query-level checkpoint needed)
      val pairs = Dedup.lshCandidatePairs(
          docs.widenedScan,
          "doc_id", "text", k = 16, bands = 4, shingleSize = 3)
      Graph.pageRank(docs.select(col("doc_id")),
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          iterations = 4, redistributeDangling = true)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Snapshot diff (the grow → promote audit): src0 docs removed,
    // English lengths perturbed (changed), French clones appended
    // (added) — every id classified against the previous version.
    "q77_snapshot_diff" -> ((s, d) => {
      val prev = t(s, d, "documents")
      val next = prev.filter(col("source") =!= "src0")
        .withColumn("n_chars", when(col("lang") === "en",
          col("n_chars") + 1).otherwise(col("n_chars")))
        .unionByName(prev.filter(col("lang") === "fr")
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.model.DumpIO.diffSnapshots(prev, next, "doc_id",
          Seq("lang", "source", "n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Single-pass table profile (the trust-the-data query): per column
    // nulls, KMV distinct estimate (the native aggregate riding the
    // same scan as the ordinary aggregates), min/max.
    "q76_profile" -> ((s, d) => {
      Stats.profile(t(s, d, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"), k = 256)
        .orderBy(col("column"))
    }),

    // Content-defined chunking (native graft_cdc_chunks): hash-gated
    // trailing windows place the boundaries, so chunk hashes survive
    // prefix insertions — the chunk-level dedup primitive.
    "q74_cdc_chunks" -> ((s, d) => {
      // spread: the sf0.1 documents file is ONE input split, and this
      // operator is md5-per-character compute-bound
      Curation.cdcChunks(t(s, d, "documents"), "doc_id", "text",
          window = 8, divisor = 64, spreadPartitions = 32)
        .select(col("doc_id"), col("chunk_ix"),
          md5(col("chunk")).as("chunk_hash"), col("n_chars"))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    // Deterministic seeded global corpus shuffle: positions from the
    // md5(id:seed) order via the range-partitioned two-pass id zip —
    // the reproducible "shuffle before training" permutation.
    "q89_global_shuffle" -> ((s, d) => {
      // persist=false: the input is a one-column parquet scan
      Selection.globalShuffle(t(s, d, "documents").select(col("doc_id")),
          "doc_id", seed = 42L, persist = false)
        .select(col("doc_id"), col("pos"))
        .orderBy(col("doc_id"))
    }),

    // Z-order locality audit on events: per fixed-width Morton-key
    // bucket, the (user, hour) envelope — tight on BOTH dims = min-max
    // stats that prune scans filtered on either column. 6-bit dims
    // (user mod 64, epoch-hour mod 64) fill a 12-bit key; 64 buckets
    // = 8×8 (user, hour) tiles.
    "q90_zorder_stats" -> ((s, d) => {
      val ev = t(s, d, "events")
      Selection.zorderStats(ev,
          col("user_id") % 64,
          floor(unix_seconds(col("ts")) / 3600).cast("long") % 64,
          bucketBits = 6, keyBits = 12)
        .orderBy(col("bucket"))
    }),

    // Mergeable per-source vocabulary sketches + their union: each
    // source carries one bounded 64-long KMV min-set; the global row
    // is merged from the SKETCHES (groups × k longs), never a corpus
    // re-scan — and equals the direct single-pass estimate exactly.
    "q95_kmv_merge" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tk"))
      val perSource = Sketches.kmvSketchGrouped(tok, "source", "tk", k = 64)
      perSource
        .select(col("source"), col("n_mins"), col("kth_hash"), col("estimate"))
        .unionByName(Sketches.kmvMergeSketches(perSource, k = 64)
          .select(lit("__merged__").as("source"), col("n_mins"),
            col("kth_hash"), col("estimate")))
        .orderBy(col("source"))
    }),

    // Mergeable per-source HyperLogLog vocabulary sketches + their
    // union: each source carries one dense 64-register array; the
    // global row merges the REGISTERS (elementwise max over sketch
    // rows, never a corpus re-scan) and — because every token hashes
    // identically — equals the direct single-pass registers exactly.
    // KMV's (q95) counterpart with O(2^p) state and max-merge instead
    // of min-set union. Registers ride as a csv string (driver-
    // comparator shape); v_zero/s_int expose the integer internals so
    // any float drift would be attributable.
    "q98_hll_merge" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tk"))
      // no checkpoint: both union branches contain the IDENTICAL
      // per-source aggregation subtree, so ReuseExchange evaluates the
      // corpus pass once inside one job — cheaper than materializing
      // a checkpoint in a separate job (the bench rebuilds per rep)
      val perSource = Sketches.hllSketchGrouped(tok, "source", "tk", p = 6)
      perSource
        .select(col("source"), col("v_zero"), col("s_int"),
          col("registers"), col("estimate"))
        .unionByName(Sketches.hllMergeSketches(perSource, p = 6)
          .select(lit("__merged__").as("source"), col("v_zero"),
            col("s_int"), col("registers"), col("estimate")))
        .withColumn("registers",
          concat_ws(",", col("registers").cast("array<string>")))
        .orderBy(col("source"))
    }),

    // Mergeable per-source count-min sketches: 4×64 cells per source,
    // merged by cell-wise SUM into the global sketch, then point-
    // estimated for the 20 most frequent tokens against their true
    // counts — the one-sided estimate ≥ true guarantee, oracle-exact
    // (all-integer, no float discipline needed).
    "q99_countmin" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tk"))
        .localCheckpoint(true)
      val perSource = Sketches.cmSketchGrouped(tok, "source", "tk",
        depth = 4, width = 64)
      val merged = Sketches.cmMergeSketches(perSource)
      val top = tok.groupBy(col("tk"))
        .agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("tk")).limit(20)
      Sketches.cmPointEstimate(merged, top, "tk", depth = 4, width = 64)
        .select(col("tk").as("token"), col("true_n"), col("cm_estimate"))
        .orderBy(col("true_n").desc, col("token"))
    }),

    // Rendezvous-hash sharding + grow-by-one audit: assignment is a
    // pure per-row expression (no shuffle, no directory), and growing
    // 8 → 9 shards must move ~1/9 of each shard's docs — every one TO
    // the new shard (n_moved_elsewhere = 0, measured not assumed).
    "q100_rendezvous" -> ((s, d) => {
      Sharding.shardMoveAudit(t(s, d, "documents"), "doc_id", nShards = 8)
        .orderBy(col("shard"))
    }),

    // Mergeable histogram quantiles: per-source fixed-width (64-char)
    // length histograms, merged by per-bin sum, bracket the p50/p90/p99
    // — and the EXACT quantile (q66's machinery) must land inside each
    // bracket, verified as a column, not assumed.
    "q101_histogram_quantiles" -> ((s, d) => {
      // ONE corpus aggregation — the (source, value, n) reduction —
      // feeds BOTH the sketch path and the exact side (the weightCol
      // form of each operator); the LAZY checkpoint pins the corpus to
      // a single scan (materialized inside the query's own action, no
      // separate blocking job) and every stage after it moves kilobytes
      val sv = t(s, d, "documents").select(col("source"), col("n_chars"))
        .filter(col("n_chars").isNotNull)
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint(false)
      val merged = Stats.histogramMergeSketches(
        Stats.histogramSketchGrouped(sv, "source", "n_chars", binWidth = 64L,
          weightCol = Some("w")))
      val brackets = Stats.histogramQuantiles(merged, Seq(0.5, 0.9, 0.99), 64L)
      // n_chars is discrete: the exact side rides the value-level
      // histogram (weighted by the same reduction), not a corpus sort
      val exact = Stats.exactQuantilesDiscrete(sv, "n_chars",
          Seq(0.5, 0.9, 0.99), weightCol = Some("w"))
        .select(col("q"), col("value").cast("long").as("exact"))
      brackets.join(exact, Seq("q"))
        .select(col("q"), col("bin_lo"), col("bin_hi"), col("exact"),
          (col("exact") >= col("bin_lo") && col("exact") <= col("bin_hi"))
            .as("contained"))
        .orderBy(col("q"))
    }),

    // Cross-source vocabulary-overlap matrix: KMV-sketch Jaccard
    // estimates for all 190 source pairs (sketch rows only — the
    // corpus is touched once to build sketches) next to the EXACT
    // pairwise Jaccard, so sketch accuracy is a measured column. The
    // dedup-planning heatmap: which sources share vocabulary enough
    // to cross-dedup.
    "q107_source_overlap" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tk"))
        .distinct()
        .localCheckpoint(true)
      val est = Sketches.kmvPairwiseJaccard(
        Sketches.kmvSketchGrouped(tok, "source", "tk", k = 64),
        k = 64, groupCol = "source")
      val sizes = tok.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = tok.select(col("source").as("g_a"), col("tk"))
        .join(tok.select(col("source").as("g_b"), col("tk")), Seq("tk"))
        .filter(col("g_a") < col("g_b"))
        .groupBy(col("g_a"), col("g_b")).agg(count(lit(1)).as("inter"))
      est
        .join(inter, Seq("g_a", "g_b"), "left")
        .join(sizes.select(col("source").as("g_a"), col("n").as("n_a")), Seq("g_a"))
        .join(sizes.select(col("source").as("g_b"), col("n").as("n_b")), Seq("g_b"))
        .select(col("g_a").as("src_a"), col("g_b").as("src_b"),
          col("est_jaccard"),
          round(coalesce(col("inter"), lit(0L)).cast("double") /
            (col("n_a") + col("n_b") - coalesce(col("inter"), lit(0L))), 6)
            .as("exact_jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Release manifest: per rendezvous shard, counts + id range + an
    // order-insensitive additive-mod content checksum — the
    // reproducible-release artifact any consumer can re-derive and
    // byte-verify; checksums merge across sub-shards.
    "q110_release_manifest" -> ((s, d) => {
      Sharding.releaseManifest(t(s, d, "documents"), "doc_id", "text",
          nShards = 8)
        .orderBy(col("shard"))
    }),

    // Source-balance audit: Lorenz curve + Gini + entropy of the
    // per-source token mass — the "is the mixture dominated?" table.
    "q116_source_balance" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("w"))
      Stats.balanceAudit(docs, "source", "w").orderBy(col("rank"))
    }),

    // The per-source dataset card: doc/token/char mass, token range,
    // mean stopword score, corpus-wide exact-dup incidence, langid
    // counts — the auditable datasheet a release publishes.
    "q120_dataset_card" -> ((s, d) => {
      Stats.datasetCard(t(s, d, "documents"), "source", "doc_id", "text")
        .orderBy(col("source"))
    }),

    // Per-source distribution drift: KL(source || corpus) over
    // add-1-smoothed hashed-unigram buckets, full domain, pico-nat
    // integer sums — which source reads least like the corpus.
    "q125_source_drift" -> ((s, d) => {
      Selection.sourceDriftKl(t(s, d, "documents"), "source", "text",
          buckets = 1024)
        .orderBy(col("source"))
    }),

    // Ingest-batch drift monitor: PSI of the token-count distribution,
    // new batch (doc_id % 5 == 0) vs the reference corpus — the
    // number checked before a batch is admitted (q117's split).
    "q128_psi" -> ((s, d) => {
      val scored = t(s, d, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_toks"))
      Stats.psi(scored.filter(col("doc_id") % 5 =!= 0),
        scored.filter(col("doc_id") % 5 === 0), "n_toks", binWidth = 8L)
    })
  )

  val oracles: Map[String, String] = Map(
    // q85: snake deal over the (n_tokens DESC, doc_id) rank.
    "q85_snake_shards" ->
      s"""WITH t AS (SELECT doc_id, len($tokensSql)::BIGINT AS n FROM documents),
         |r AS (SELECT doc_id, n,
         |        ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) - 1 AS rk FROM t)
         |SELECT doc_id, n AS n_tokens,
         |  (CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - (rk % 8) END)::BIGINT AS shard
         |FROM r ORDER BY doc_id""".stripMargin,
    "q29_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id, strlen(text)::BIGINT * 40 AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 2),
        |nf AS (SELECT media_id,
        |       greatest(floor(duration_ms / 1000 * 1)::INT, 1) AS n_frames FROM f),
        |frames AS (
        |  SELECT media_id, unnest(range(0, n_frames::BIGINT, 10)) AS frame_ix FROM nf)
        |SELECT media_id, frame_ix, frame_ix * 1000 / 1 AS ts_ms
        |FROM frames ORDER BY media_id, frame_ix""".stripMargin,
    // q28 decoded-value arithmetic (mediaFromDocuments synth params):
    // audio = 16 kHz mono 16-bit WAV (44-byte header, byte rate 32000),
    // video = MP4 with 244 bytes of boxes, duration len·40 ms, dims
    // (id%1280+16, id%720+16); image = raw bytes (no container).
    "q28_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  (strlen(text) + CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 44 ELSE 244 END)::BIGINT AS n_bytes,
        |  CASE WHEN doc_id % 3 = 2 THEN (doc_id % 1280 + 16)::INT END AS width,
        |  CASE WHEN doc_id % 3 = 2 THEN (doc_id % 720 + 16)::INT END AS height,
        |  CASE doc_id % 3 WHEN 1 THEN strlen(text)::BIGINT * 1000 // 32000
        |       WHEN 2 THEN strlen(text)::BIGINT * 40 END AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    // q58: DuckDB's native ASOF JOIN is the oracle for the union+window
    // Spark form — inclusive backward match per (user_id, ts).
    "q58_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS asof_value, r.ts AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // q62: kth-smallest distinct 60-bit md5 hash → (k−1)/u_k estimate.
    "q62_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::UBIGINT AS h
        |  FROM lineitem),
        |mins AS (SELECT h::BIGINT AS h FROM h ORDER BY h ASC LIMIT 64),
        |agg AS (SELECT COUNT(*) AS n_mins, max(h) AS kth_hash FROM mins)
        |SELECT 64::BIGINT AS k, kth_hash,
        |  CASE WHEN n_mins < 64 THEN n_mins::DOUBLE
        |       ELSE round(63.0 / ((kth_hash::DOUBLE + 1.0) / 1152921504606846976.0), 6)
        |  END AS estimate,
        |  (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)::BIGINT AS true_distinct
        |FROM agg""".stripMargin,
    // q64: ROW_NUMBER over the same (u60(md5), id) long-pair order.
    "q64_contiguous_ids" ->
      """SELECT (ROW_NUMBER() OVER (ORDER BY
        |          ('0x' || substr(md5(text), 1, 15))::UBIGINT, doc_id)
        |        - 1)::BIGINT AS row_ix, doc_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q61: same lag + running-sum session derivation over epoch-µs
    // longs; (user_id, ts) is unique so ordering is total.
    "q61_sessionize" ->
      """WITH s AS (
        |  SELECT event_id, user_id, ts, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 0
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |x AS (
        |  SELECT user_id, ts, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_ix
        |  FROM s)
        |SELECT user_id, session_ix::BIGINT AS session_ix,
        |  COUNT(*) AS n_events, min(ts) AS session_start,
        |  ((max(us) - min(us)) // 1000)::BIGINT AS duration_ms
        |FROM x GROUP BY user_id, session_ix
        |ORDER BY user_id, session_ix""".stripMargin,

    // Exact PERCENTILE_DISC: both engines compute the SAME epsilon-
    // corrected rank (ceil(q·n − 1e-9) − 1) — q·n in doubles can land
    // an ulp above the exact-rational integer it means, and relying on
    // each engine's internal quantile rounding would tie parity to
    // implementation details.
    "q66_exact_quantiles" ->
      """WITH n AS (SELECT count(*) AS n FROM documents WHERE n_chars IS NOT NULL),
        |qs AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]::DOUBLE[]) AS q),
        |tgt AS (SELECT q, CAST(ceil(q * n.n - 1e-9) AS BIGINT) - 1 AS ix FROM qs, n),
        |r AS (SELECT n_chars AS value, row_number() OVER (ORDER BY n_chars) - 1 AS ix
        |      FROM documents WHERE n_chars IS NOT NULL)
        |SELECT q, value FROM tgt JOIN r USING (ix) ORDER BY q""".stripMargin,

    "q67_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($tokensSql) AS value FROM documents),
         |c AS (SELECT value, count(*) AS cnt FROM toks
         |      WHERE value IS NOT NULL GROUP BY value),
         |tot AS (SELECT sum(cnt) AS total FROM c)
         |SELECT value, cnt,
         |  round(cnt::DOUBLE / total::DOUBLE, 6) AS share
         |FROM c, tot WHERE cnt >= total * 0.02 ORDER BY value""".stripMargin,

    "q69_k_anonymity" ->
      """WITH g AS (SELECT user_id, event_type FROM events
        |  GROUP BY user_id, event_type HAVING count(*) >= 12),
        |kept AS (SELECT e.user_id, e.event_type FROM events e
        |  JOIN g ON e.user_id = g.user_id AND e.event_type = g.event_type)
        |SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_users
        |FROM kept GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Positives = q23's MinHash-LSH pairs (same CTEs); the negative is
    // the corpus doc at sorted-rank (u60(md5("a|b")) + j) mod n for the
    // first j in {0,1,2} that collides with neither pair member.
    "q70_contrastive_pairs" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |n AS (SELECT count(*) AS n FROM documents),
         |ranked AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY doc_id) - 1 AS ix FROM documents),
         |cand AS (SELECT p.id_a AS anchor, p.id_b AS positive, js.j,
         |    CAST(((('0x' || substr(md5(p.id_a::VARCHAR || '|' || p.id_b::VARCHAR), 1, 15))::UBIGINT
         |      + js.j) % n.n) AS BIGINT) AS nix
         |  FROM pairs p, n, (SELECT unnest([0,1,2]) AS j) js),
         |valid AS (SELECT c.anchor, c.positive, c.j, r.doc_id AS neg
         |  FROM cand c JOIN ranked r ON c.nix = r.ix
         |  WHERE r.doc_id <> c.anchor AND r.doc_id <> c.positive)
         |SELECT anchor, positive, min_by(neg, j) AS negative
         |FROM valid GROUP BY anchor, positive ORDER BY anchor, positive""".stripMargin,

    // q39's reachability CTEs resolve the clusters; the split is the
    // same u60 arithmetic as q63/q68 over the CLUSTER id.
    "q71_leakage_split" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(n, m) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m),
         |labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n),
         |assigned AS (SELECT d.doc_id,
         |    COALESCE(l.cluster, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |u AS (SELECT doc_id, cluster_id,
         |    ((('0x' || substr(md5(cluster_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
         |     / 1152921504606846976.0) AS uu FROM assigned)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN uu < 0.7 THEN 'train'
         |       WHEN uu < 0.85 THEN 'val' ELSE 'test' END AS split
         |FROM u ORDER BY doc_id""".stripMargin,

    "q72_grouped_quantiles" ->
      """WITH r AS (SELECT lang, n_chars AS value,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL),
        |qs AS (SELECT unnest([0.25,0.5,0.75]::DOUBLE[]) AS q)
        |SELECT lang, q, value FROM r, qs
        |WHERE rk = CAST(ceil(q * n - 1e-9) AS BIGINT)
        |ORDER BY lang, q""".stripMargin,

    // q23's pair CTEs feed a 4-round unrolled PageRank: identical
    // pico-unit integer arithmetic per round (the contribution sum is
    // a BIGINT sum — order-exact in both engines). Every CTE is
    // MATERIALIZED: the round CTEs chain, and DuckDB's inlining
    // otherwise re-evaluates the md5 pair pipeline per reference —
    // super-linear at sf0.1 (measured 4.5× at sf0.01 on the q79
    // variant, worse with scale).
    "q78_pagerank" -> {
      val iter = (i: Int) =>
        s"""r$i AS MATERIALIZED (
           |  SELECT n.id, (SELECT b FROM consts) + COALESCE(s.c, 0) AS pico
           |  FROM ids n LEFT JOIN (
           |    SELECT e.dst AS id,
           |      SUM(CAST(round(r.pico * 0.85 / o.outdeg, 0) AS BIGINT)) AS c
           |    FROM edges e JOIN r${i - 1} r ON e.src = r.id
           |    JOIN outdeg o ON e.src = o.src
           |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
      s"""WITH sh AS MATERIALIZED (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS MATERIALIZED (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS MATERIALIZED (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |ids AS MATERIALIZED (SELECT doc_id AS id FROM documents),
         |outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |consts AS MATERIALIZED (SELECT
         |  CAST(round(1e12 * (1 - 0.85) / count(*), 0) AS BIGINT) AS b,
         |  CAST(round(1e12 / count(*), 0) AS BIGINT) AS ini FROM documents),
         |r0 AS MATERIALIZED (SELECT id, (SELECT ini FROM consts) AS pico FROM ids),
         |${(1 to 4).map(iter).mkString(",\n")}
         |SELECT id AS doc_id, round(pico::DOUBLE / 1e12, 9) AS rank
         |FROM r4 ORDER BY doc_id""".stripMargin
    },

    // q78's CTEs with DIRECTED edges and per-round dangling-mass
    // redistribution: d_i sums the prior round's rank over
    // out-degree-0 nodes; every node gains
    // round(dang * 0.85 / n) pico — the identical double-then-round
    // arithmetic as the Spark operator, so the hash compare is exact.
    "q79_pagerank_dangling" -> {
      val iter = (i: Int) =>
        s"""d$i AS MATERIALIZED (
           |  SELECT COALESCE(SUM(r.pico), 0) AS dang FROM r${i - 1} r
           |  WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.id)),
           |r$i AS MATERIALIZED (
           |  SELECT n.id, (SELECT b FROM consts) + COALESCE(s.c, 0)
           |    + CAST(round((SELECT dang FROM d$i) * 0.85
           |        / (SELECT n FROM consts), 0) AS BIGINT) AS pico
           |  FROM ids n LEFT JOIN (
           |    SELECT e.dst AS id,
           |      SUM(CAST(round(r.pico * 0.85 / o.outdeg, 0) AS BIGINT)) AS c
           |    FROM edges e JOIN r${i - 1} r ON e.src = r.id
           |    JOIN outdeg o ON e.src = o.src
           |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
      s"""WITH sh AS MATERIALIZED (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS MATERIALIZED (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS MATERIALIZED (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |pairs AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs),
         |ids AS MATERIALIZED (SELECT doc_id AS id FROM documents),
         |outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |consts AS MATERIALIZED (SELECT
         |  CAST(round(1e12 * (1 - 0.85) / count(*), 0) AS BIGINT) AS b,
         |  CAST(round(1e12 / count(*), 0) AS BIGINT) AS ini,
         |  count(*) AS n FROM documents),
         |r0 AS MATERIALIZED (SELECT id, (SELECT ini FROM consts) AS pico FROM ids),
         |${(1 to 4).map(iter).mkString(",\n")}
         |SELECT id AS doc_id, round(pico::DOUBLE / 1e12, 9) AS rank
         |FROM r4 ORDER BY doc_id""".stripMargin
    },

    "q77_snapshot_diff" ->
      """WITH next AS (
        |  SELECT doc_id, lang, source,
        |    CASE WHEN lang = 'en' THEN n_chars + 1 ELSE n_chars END AS n_chars
        |  FROM documents WHERE source <> 'src0'
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, source, n_chars
        |  FROM documents WHERE lang = 'fr'),
        |hp AS (SELECT doc_id, md5(concat_ws(chr(1), COALESCE(lang, chr(0)),
        |    COALESCE(source, chr(0)), COALESCE(n_chars::VARCHAR, chr(0)))) AS h
        |  FROM documents),
        |hn AS (SELECT doc_id, md5(concat_ws(chr(1), COALESCE(lang, chr(0)),
        |    COALESCE(source, chr(0)), COALESCE(n_chars::VARCHAR, chr(0)))) AS h
        |  FROM next)
        |SELECT COALESCE(hp.doc_id, hn.doc_id) AS doc_id,
        |  CASE WHEN hp.h IS NULL THEN 'added'
        |       WHEN hn.h IS NULL THEN 'removed'
        |       WHEN hp.h <> hn.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM hp FULL OUTER JOIN hn ON hp.doc_id = hn.doc_id
        |ORDER BY doc_id""".stripMargin,

    // One UNION ALL branch per profiled column; the KMV estimate
    // replays q62's relational form per column.
    "q76_profile" -> Seq("doc_id", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS "column",
         |  (SELECT count(*) FROM documents)::BIGINT AS n_rows,
         |  (SELECT count(*) - count($c) FROM documents)::BIGINT AS n_nulls,
         |  (WITH h AS (SELECT DISTINCT
         |      ('0x' || substr(md5($c::VARCHAR), 1, 15))::UBIGINT AS h
         |    FROM documents WHERE $c IS NOT NULL),
         |  mins AS (SELECT h::BIGINT AS h FROM h ORDER BY h ASC LIMIT 256),
         |  a AS (SELECT count(*) AS n_mins, max(h) AS kth FROM mins)
         |  SELECT CASE WHEN n_mins < 256 THEN n_mins::DOUBLE
         |    ELSE round(255.0 / ((kth::DOUBLE + 1.0) / 1152921504606846976.0), 6)
         |  END FROM a) AS distinct_est,
         |  (SELECT min($c)::VARCHAR FROM documents) AS min,
         |  (SELECT max($c)::VARCHAR FROM documents) AS max""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),

    // The boundary rule relationally: cut after char i (w <= i < n)
    // iff u32(md5(chars i-7..i)) % 64 == 0; chunks between cuts.
    "q74_cdc_chunks" ->
      """WITH b AS (SELECT doc_id, text, len(text) AS n
        |  FROM documents WHERE len(text) > 0),
        |cuts AS (SELECT doc_id, text, n,
        |  list_prepend(0::BIGINT, list_append(
        |    list_filter(range(8, n), i ->
        |      (('0x' || substr(md5(substr(text, (i-7)::INT, 8)), 1, 8))::UBIGINT % 64) = 0),
        |    n)) AS cs
        |  FROM b),
        |chunks AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(cs)), j ->
        |      struct_pack(ix := j - 1,
        |        chunk := substr(text, (cs[j] + 1)::INT, (cs[j+1] - cs[j])::INT)))) AS c
        |  FROM cuts)
        |SELECT doc_id, c.ix::BIGINT AS chunk_ix, md5(c.chunk) AS chunk_hash,
        |  len(c.chunk)::BIGINT AS n_chars
        |FROM chunks ORDER BY doc_id, chunk_ix""".stripMargin,
    // q89: positions in (u60(md5(id:seed)), id) order — the engine's
    // long-pair key replayed exactly (id tiebreak = collision-proof
    // total order).
    "q89_global_shuffle" ->
      """SELECT doc_id,
        |  (row_number() OVER (ORDER BY
        |     ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 15))::UBIGINT,
        |     doc_id)
        |   - 1)::BIGINT AS pos
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q90: the same five-step bit spread replayed textually; epoch_us
    // floor-division for the hour bucket (unix_seconds truncates the
    // same way on non-negative input).
    "q90_zorder_stats" -> {
      val morton =
        s"(${spreadSql("x")} | (${spreadSql("y")} << 1))"
      s"""WITH v AS (
         |  SELECT (user_id % 64)::BIGINT AS x,
         |         ((epoch_us(ts) // 1000000 // 3600) % 64)::BIGINT AS y
         |  FROM events),
         |z AS (SELECT x, y, $morton AS morton FROM v)
         |SELECT (morton >> 6)::BIGINT AS bucket, count(*)::BIGINT AS n,
         |  min(x)::BIGINT AS x_min, max(x)::BIGINT AS x_max,
         |  min(y)::BIGINT AS y_min, max(y)::BIGINT AS y_max
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    // q95: per-source top-64 distinct hashes, then the union's top-64
    // re-ranked — the same dedup-on-merge the TreeSet buffer does.
    "q95_kmv_merge" ->
      s"""WITH tok AS (SELECT source, unnest($tokensSql) AS tk FROM documents),
         |h AS (SELECT DISTINCT source,
         |        ('0x' || substr(md5(tk), 1, 15))::UBIGINT::BIGINT AS h FROM tok),
         |ranked AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
         |mins AS (SELECT source, h FROM ranked WHERE rn <= 64),
         |per AS (SELECT source, count(*)::BIGINT AS n_mins, max(h)::BIGINT AS kth_hash
         |        FROM mins GROUP BY source),
         |g AS (SELECT h FROM (SELECT DISTINCT h FROM mins) ORDER BY h LIMIT 64),
         |gm AS (SELECT count(*)::BIGINT AS n_mins, max(h)::BIGINT AS kth_hash FROM g),
         |allrows AS (
         |  SELECT source, n_mins, kth_hash FROM per
         |  UNION ALL SELECT '__merged__', n_mins, kth_hash FROM gm)
         |SELECT source, n_mins, kth_hash,
         |  CASE WHEN n_mins < 64 THEN n_mins::DOUBLE
         |       ELSE round(63.0 / ((kth_hash::DOUBLE + 1.0) / 1152921504606846976.0), 6)
         |  END AS estimate
         |FROM allrows ORDER BY source""".stripMargin,

    // q98: per-source + global HLL replayed register for register.
    // The global rows ARE the merged rows by construction (max over
    // (source, bucket) == max over bucket), so the hash compare pins
    // merge ≡ direct. α·m² and 2^{61−p} are interpolated from the SAME
    // Scala doubles the engine folds into its plan — identical literal,
    // identical one-divide arithmetic.
    "q98_hll_merge" -> {
      val p = 6; val m = 1 << p
      val aM2 = Sketches.hllAlphaM2(p)        // exact double literal
      val twoPow = math.pow(2.0, 61 - p)      // 2^55, exact in double
      val est = s"round(CASE WHEN ($aM2 * $twoPow) / s_int <= ${2.5 * m} AND v_zero > 0" +
        s" THEN $m * ln($m / v_zero::DOUBLE)" +
        s" ELSE ($aM2 * $twoPow) / s_int END, 6) AS estimate"
      s"""WITH tok AS (SELECT source, unnest($tokensSql) AS tk FROM documents),
         |h AS (SELECT source, ('0x' || substr(md5(tk), 1, 15))::UBIGINT AS h FROM tok),
         |br AS (SELECT source, h >> ${60 - p} AS bucket,
         |  CASE WHEN (h & ((1::UBIGINT << ${60 - p}) - 1)) = 0 THEN ${61 - p}
         |       ELSE ${61 - p} - length(bin(h & ((1::UBIGINT << ${60 - p}) - 1))) END AS rho
         |  FROM h),
         |r AS (SELECT source, bucket, max(rho) AS rho FROM br GROUP BY source, bucket
         |      UNION ALL
         |      SELECT '__merged__' AS source, bucket, max(rho) AS rho FROM br GROUP BY bucket),
         |dense AS (
         |  SELECT s.source, t.i AS bucket, coalesce(r.rho, 0) AS reg
         |  FROM (SELECT DISTINCT source FROM r) s
         |  CROSS JOIN range($m) t(i)
         |  LEFT JOIN r ON r.source = s.source AND r.bucket = t.i),
         |agg AS (
         |  SELECT source,
         |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero,
         |    sum(1::UBIGINT << (${61 - p} - reg))::BIGINT AS s_int,
         |    array_to_string(list(reg ORDER BY bucket), ',') AS registers
         |  FROM dense GROUP BY source)
         |SELECT source, v_zero, s_int, registers, $est
         |FROM agg ORDER BY source""".stripMargin
    },

    // q99: global count-min cells recomputed directly (cell-wise sum of
    // per-source sketches == the direct global sketch — counts are
    // additive); top-20 true counts, then min over the 4 hash rows.
    "q99_countmin" ->
      s"""WITH tok AS (SELECT unnest($tokensSql) AS tk FROM documents),
         |top AS (SELECT tk, count(*)::BIGINT AS true_n FROM tok
         |        GROUP BY tk ORDER BY true_n DESC, tk LIMIT 20),
         |cells AS (SELECT i, ('0x' || substr(md5(i::VARCHAR || '|' || tk), 1, 15))::UBIGINT % 64 AS bucket,
         |                 count(*)::BIGINT AS cnt
         |          FROM tok CROSS JOIN range(4) t(i) GROUP BY 1, 2),
         |est AS (SELECT top.tk, min(coalesce(cells.cnt, 0))::BIGINT AS cm_estimate
         |        FROM top CROSS JOIN range(4) t(i)
         |        LEFT JOIN cells ON cells.i = t.i
         |          AND cells.bucket = ('0x' || substr(md5(t.i::VARCHAR || '|' || top.tk), 1, 15))::UBIGINT % 64
         |        GROUP BY top.tk)
         |SELECT top.tk AS token, top.true_n, est.cm_estimate
         |FROM top JOIN est ON top.tk = est.tk
         |ORDER BY top.true_n DESC, token""".stripMargin,

    // q100: the 9-hash array replayed; the 8-shard view is the prefix
    // slice, argmax by first-occurrence list_position both sides.
    "q100_rendezvous" ->
      """WITH h AS (SELECT doc_id,
        |    list_transform(range(9), s ->
        |      ('0x' || substr(md5(s::VARCHAR || '|' || doc_id::VARCHAR), 1, 15))::UBIGINT) AS hs
        |  FROM documents),
        |a AS (SELECT doc_id,
        |    list_position(hs[1:8], list_max(hs[1:8])) - 1 AS s_old,
        |    list_position(hs, list_max(hs)) - 1 AS s_new
        |  FROM h)
        |SELECT s_old::BIGINT AS shard, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END)::BIGINT AS n_moved,
        |  sum(CASE WHEN s_old <> s_new AND s_new <> 8 THEN 1 ELSE 0 END)::BIGINT AS n_moved_elsewhere
        |FROM a GROUP BY s_old ORDER BY shard""".stripMargin,

    // q101: direct global histogram (== per-bin sum of per-source
    // histograms by additivity), cumulative bracket, and the same
    // epsilon-corrected PERCENTILE_DISC rank for the exact value.
    "q101_histogram_quantiles" ->
      """WITH v AS (SELECT n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
        |n AS (SELECT count(*)::BIGINT AS n FROM v),
        |t AS (SELECT q, CEIL(q * n - 0.000000001)::BIGINT AS target
        |      FROM (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q) CROSS JOIN n),
        |hist AS (SELECT v // 64 AS bin, count(*)::BIGINT AS cnt FROM v GROUP BY 1),
        |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum FROM hist),
        |br AS (SELECT t.q, c.bin FROM t JOIN cum c
        |       ON c.cum >= t.target AND c.cum - c.cnt < t.target),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM v),
        |ex AS (SELECT t.q, rk.v AS exact FROM t JOIN rk ON rk.r = t.target)
        |SELECT br.q, (br.bin * 64)::BIGINT AS bin_lo,
        |  (br.bin * 64 + 63)::BIGINT AS bin_hi, ex.exact,
        |  ex.exact BETWEEN br.bin * 64 AND br.bin * 64 + 63 AS contained
        |FROM br JOIN ex USING (q) ORDER BY q""".stripMargin,

    // q107: per-source top-64 min-hashes replayed, pairwise union
    // re-rank (k smallest of the DISTINCT union), membership in both
    // sketches; exact side from the (source, token) distinct frame.
    "q107_source_overlap" ->
      s"""WITH tok AS (SELECT DISTINCT source, tk FROM (
         |    SELECT source, unnest($tokensSql) AS tk FROM documents)),
         |sizes AS (SELECT source, count(*)::BIGINT AS n FROM tok GROUP BY source),
         |inter AS (
         |  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS inter
         |  FROM tok a JOIN tok b ON a.tk = b.tk AND a.source < b.source
         |  GROUP BY 1, 2),
         |topk AS (SELECT source, h FROM (
         |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |    FROM (SELECT DISTINCT source,
         |            ('0x' || substr(md5(tk), 1, 15))::UBIGINT AS h FROM tok))
         |  WHERE rn <= 64),
         |pairs AS (SELECT s1.source AS src_a, s2.source AS src_b
         |          FROM sizes s1 JOIN sizes s2 ON s1.source < s2.source),
         |pair_h AS (SELECT DISTINCT p.src_a, p.src_b, t.h
         |           FROM pairs p JOIN topk t ON t.source IN (p.src_a, p.src_b)),
         |u AS (SELECT src_a, src_b, h FROM (
         |    SELECT src_a, src_b, h,
         |      row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
         |    FROM pair_h) WHERE rn <= 64),
         |m AS (SELECT u.src_a, u.src_b,
         |        sum(CASE WHEN ta.h IS NOT NULL AND tb.h IS NOT NULL
         |                 THEN 1 ELSE 0 END)::BIGINT AS matches,
         |        count(*)::BIGINT AS denom
         |      FROM u
         |      LEFT JOIN topk ta ON ta.source = u.src_a AND ta.h = u.h
         |      LEFT JOIN topk tb ON tb.source = u.src_b AND tb.h = u.h
         |      GROUP BY 1, 2)
         |SELECT m.src_a, m.src_b,
         |  round(matches::DOUBLE / denom, 6) AS est_jaccard,
         |  round(COALESCE(i.inter, 0)::DOUBLE /
         |    (sa.n + sb.n - COALESCE(i.inter, 0)), 6) AS exact_jaccard
         |FROM m
         |LEFT JOIN inter i ON i.src_a = m.src_a AND i.src_b = m.src_b
         |JOIN sizes sa ON sa.source = m.src_a
         |JOIN sizes sb ON sb.source = m.src_b
         |ORDER BY m.src_a, m.src_b""".stripMargin,

    // q110: rendezvous assignment replayed + the same additive-mod
    // checksum (DuckDB sums to HUGEINT, so the outer mod is exact).
    "q110_release_manifest" ->
      s"""WITH a AS (SELECT
         |    list_position(hs, list_max(hs)) - 1 AS shard, doc_id,
         |    len($tokensSql) AS tc,
         |    ('0x' || substr(md5(text), 1, 15))::UBIGINT % 1000000007 AS h
         |  FROM (SELECT doc_id, text,
         |      list_transform(range(8), s ->
         |        ('0x' || substr(md5(s::VARCHAR || '|' || doc_id::VARCHAR), 1, 15))::UBIGINT) AS hs
         |    FROM documents))
         |SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
         |  sum(tc)::BIGINT AS n_tokens,
         |  min(doc_id)::BIGINT AS min_id, max(doc_id)::BIGINT AS max_id,
         |  (sum(h) % 1000000007)::BIGINT AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,

    // q116: Lorenz/Gini/entropy replay — integer Gini numerator
    // Σ(2i−1)wᵢ (HUGEINT-capped ::BIGINT), entropy terms rounded to
    // micro-nats BEFORE the sum (the order-free float discipline).
    "q116_source_balance" ->
      s"""WITH w AS (
         |  SELECT source, sum(len($tokensSql))::BIGINT AS weight
         |  FROM documents GROUP BY source),
         |r AS (
         |  SELECT source, weight,
         |    row_number() OVER (ORDER BY weight, source) AS rank,
         |    sum(weight) OVER (ORDER BY weight, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_w
         |  FROM w),
         |s AS (
         |  SELECT count(*)::BIGINT AS n, sum(weight)::BIGINT AS total,
         |    sum((2 * rank - 1) * weight)::BIGINT AS g_num
         |  FROM r),
         |h AS (
         |  SELECT (sum(round(-(weight::DOUBLE / total) *
         |      ln(weight::DOUBLE / total) * 1000000))::BIGINT::DOUBLE
         |    / 1000000.0) AS hval
         |  FROM r CROSS JOIN s)
         |SELECT source, weight,
         |  round(weight::DOUBLE / total, 6) AS share,
         |  round(cum_w::DOUBLE / total, 6) AS cum_share,
         |  rank::BIGINT AS rank,
         |  round((g_num - n * total)::DOUBLE / (n * total), 6) AS gini,
         |  round(hval, 6) AS entropy_nats
         |FROM r CROSS JOIN s CROSS JOIN h ORDER BY rank""".stripMargin,

    // q120: the card replayed — per-doc scalars (q19/q20 fragments),
    // corpus-wide md5 dup window, per-source aggregation with floor
    // mean (// matches Spark's double-div + long truncation on
    // non-negative values).
    "q120_dataset_card" ->
      s"""WITH pd AS (
         |  SELECT source,
         |    len($tokensSql)::BIGINT AS n_toks,
         |    length(text)::BIGINT AS n_chars,
         |    ((1000 * len(list_filter($tokensSql,
         |        t -> list_contains(['the','and','of','to','in','is','that','for','with','a'], t))))
         |      // greatest(len($tokensSql), 1))::BIGINT AS stop_milli,
         |    len(list_intersect($tokensSql, ['the','and','of','to','in','is','that','for','with','a'])) AS en,
         |    len(list_intersect($tokensSql, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS de,
         |    len(list_intersect($tokensSql, ['le','la','les','et','est','pas','une','pour','dans','que'])) AS fr,
         |    len(list_intersect($tokensSql, ['el','la','los','y','es','no','una','para','en','que'])) AS es,
         |    md5(text) AS h
         |  FROM documents),
         |lang AS (
         |  SELECT *, CASE WHEN greatest(en, de, fr, es) >= 1 THEN
         |      CASE WHEN es > greatest(en, de, fr) THEN 'es'
         |           WHEN fr > greatest(en, de) THEN 'fr'
         |           WHEN de > en THEN 'de' ELSE 'en' END
         |    ELSE 'und' END AS lang
         |  FROM pd),
         |wd AS (SELECT *, count(*) OVER (PARTITION BY h) AS hc FROM lang)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_toks)::BIGINT AS n_tokens,
         |  sum(n_chars)::BIGINT AS n_chars,
         |  min(n_toks)::BIGINT AS min_tokens,
         |  max(n_toks)::BIGINT AS max_tokens,
         |  (sum(stop_milli) // count(*))::BIGINT AS mean_stop_milli,
         |  sum(CASE WHEN hc > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
         |  round(sum(CASE WHEN hc > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS dup_ratio,
         |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en
         |FROM wd GROUP BY source ORDER BY source""".stripMargin,

    // q125: KL replay over the full (source x bucket) domain —
    // add-1 smoothing, per-cell pico-nat terms rounded to BIGINT
    // before the sum, exactly the engine's integer discipline.
    "q125_source_drift" ->
      s"""WITH sb AS (
         |  SELECT source,
         |    ('0x' || substr(md5(tk), 1, 15))::UBIGINT % 1024 AS bkt,
         |    count(*)::BIGINT AS n_sb
         |  FROM (SELECT source, unnest($tokensSql) AS tk FROM documents)
         |  GROUP BY 1, 2),
         |st AS (SELECT source, sum(n_sb)::BIGINT AS n_s FROM sb GROUP BY 1),
         |cb AS (SELECT bkt, sum(n_sb)::BIGINT AS n_b FROM sb GROUP BY 1),
         |nt AS (SELECT sum(n_b)::BIGINT AS n FROM cb),
         |dom AS (
         |  SELECT st.source, st.n_s, r.range::BIGINT AS bkt
         |  FROM st CROSS JOIN range(1024) r),
         |cells AS (
         |  SELECT d.source, d.n_s,
         |    (coalesce(s.n_sb, 0) + 1)::DOUBLE / (d.n_s + 1024) AS p,
         |    (coalesce(c.n_b, 0) + 1)::DOUBLE / (nt.n + 1024) AS q
         |  FROM dom d
         |  LEFT JOIN sb s ON d.source = s.source AND d.bkt = s.bkt
         |  LEFT JOIN cb c ON d.bkt = c.bkt
         |  CROSS JOIN nt)
         |SELECT source, max(n_s)::BIGINT AS n_tokens,
         |  round(sum(round(p * ln(p / q) * 1e12)::BIGINT)::DOUBLE / 1e12, 6)
         |    AS kl_nats
         |FROM cells GROUP BY source ORDER BY source""".stripMargin,

    // q128: PSI replay — shared bin domain, add-1 smoothing, pico
    // terms rounded to BIGINT before the sum.
    "q128_psi" ->
      s"""WITH sc AS (
         |  SELECT doc_id, len($tokensSql)::BIGINT AS n_toks FROM documents),
         |rb AS (SELECT n_toks // 8 AS bin, count(*)::BIGINT AS n_r
         |       FROM sc WHERE doc_id % 5 <> 0 GROUP BY 1),
         |nb AS (SELECT n_toks // 8 AS bin, count(*)::BIGINT AS n_n
         |       FROM sc WHERE doc_id % 5 = 0 GROUP BY 1),
         |dom AS (SELECT bin FROM rb UNION SELECT bin FROM nb),
         |tot AS (
         |  SELECT (SELECT sum(n_r) FROM rb)::BIGINT AS tr,
         |    (SELECT sum(n_n) FROM nb)::BIGINT AS tn,
         |    (SELECT count(*) FROM dom)::BIGINT AS nbins),
         |cells AS (
         |  SELECT (coalesce(n_r, 0) + 1)::DOUBLE / (tr + nbins) AS pr,
         |    (coalesce(n_n, 0) + 1)::DOUBLE / (tn + nbins) AS pn,
         |    tr, tn, nbins
         |  FROM dom LEFT JOIN rb USING (bin) LEFT JOIN nb USING (bin)
         |  CROSS JOIN tot)
         |SELECT max(tr)::BIGINT AS n_ref, max(tn)::BIGINT AS n_new,
         |  max(nbins)::BIGINT AS n_bins,
         |  round(sum(round((pn - pr) * ln(pn / pr) * 1e12)::BIGINT)::DOUBLE / 1e12, 6)
         |    AS psi
         |FROM cells""".stripMargin
  )
}
