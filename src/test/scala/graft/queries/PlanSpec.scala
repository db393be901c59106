package graft.queries

import graft.SparkTestBase
import graft.sources.FileResources

/** Plan-hygiene specs: the physical plans the 100 TB design depends on
  * must actually materialize — filter/column pushdown into the parquet
  * scan, broadcast joins for small dims, whole-stage codegen spans.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q2 filter+projection push into the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), "filters must reach the scan")
    assert(p.contains("GreaterThan(l_discount") || p.contains("l_discount"), p.take(500))
    // column pruning: the scan reads only the 4 projected + filter columns
    val readSchema = "ReadSchema: struct<" + Seq("l_orderkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount").mkString("[^>]*")
    assert(readSchema.r.findFirstIn(p).isDefined, "scan must prune to needed columns")
    assert(!p.contains("l_comment"), "unneeded columns must not be read")
  }

  test("q3 small dims broadcast; no shuffle of the fact side for the dim join") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), "nation/customer joins should broadcast")
  }

  test("q1 aggregation is hash-based with map-side partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), "hash aggregation expected")
    assert(p.contains("partial_sum"), "map-side combine before the shuffle")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial + final aggregate")
  }

  test("q23 minhash plan is a single hash aggregation over exploded shingles") {
    val p = plan("q23_minhash_lsh")
    assert(p.contains("Generate explode"), "shingles exploded once")
    assert(p.contains("HashAggregate"), "k mins in one aggregation")
  }

  test("q22 blocking runs group-and-pair: native pairs, no self-join of shingle rows") {
    val p = plan("q22_ngram_jaccard")
    assert(p.contains("graft_pairs"), "pair generation must be the native expression")
    assert(!p.contains("lambdafunction"), "no interpreted HOF lambdas in the hot path")
    assert("SortMergeJoin".r.findAllIn(p).isEmpty, "size joins broadcast; no SMJ of shingles")
    assert(p.contains("collect_list"), "one grouping by shingle replaces the self-join")
  }

  test("q35 IVF: per-row native assignment — no codebook join, no assignment window") {
    val p = plan("q35_ivf_ann")
    assert(p.contains("graft_ivf_nearest"), "assignment must be the native argmin kernel")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "no corpus×codebook row materialization (×|codebook| blowup at a real codebook)")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cross product")
    assert(p.contains("WindowGroupLimit"), "final top-k rank is limit-pushed, not full sort")
    // exactly ONE window (the top-k rank): the probe/corpus assignment
    // windows of the joined form are gone
    assert("Window\\b".r.findAllIn(p).size <= 2, // logical+physical mention
      "assignment must not reintroduce per-row windows")
  }

  test("q40 greedy packing: no window, no global serialization") {
    // the shard hash-shuffle lives in the RDD lineage feeding the
    // ExistingRDD scan (the sequential pass), upstream of the SQL plan
    val p = plan("q40_greedy_packing")
    assert(!p.contains("Window"), "the fill recurrence must not fall back to a window")
    assert(p.contains("ExistingRDD"), "the per-shard sequential pass feeds the plan")
    assert(!p.contains("SinglePartition"), "shards pack in parallel, never one partition")
  }

  test("q39 cluster resolution: label join only — no cartesian, no window") {
    // connectedComponents runs eagerly (checkpointed label frame); the
    // remaining plan must be the docs↔labels join
    val p = plan("q39_dedup_clusters")
    assert(p.contains("Join"), "docs join their component labels")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
  }

  test("q80 dup spans: h-keyed hotness window only; SINGLE window-hash explode; " +
      "local per-doc interval union") {
    val p = plan("q80_dup_spans")
    // every window function must be KEY-partitioned (an unpartitioned
    // window = all rows to ONE task — the 100 TB killer WindowExec
    // warns about). r15: the per-doc lag/coverage windows are GONE —
    // the interval union runs locally over each doc's collected hot
    // starts (state bounded by doc length) — so the hotness gate's
    // h-keyed window is the only one left.
    assert("windowspecdefinition\\((?!h#)".r.findAllIn(p).isEmpty,
      "the only window is the h-keyed hotness gate")
    assert(p.contains("windowspecdefinition(h#"), "hotness rides the hash key")
    // the window-hash explode runs EXACTLY once: hotness is computed
    // on the same pass, so there is no hot-set/flag-side recompute
    assert("Generate posexplode".r.findAllIn(p).size === 1,
      "one single-evaluation window-hash explode — never a ×L position explode")
    assert(!p.contains("CartesianProduct"))
    // hotness state is BOUNDED (min/max or first-flag sum): a per-key
    // collected doc-id set grows with the hottest key — the skewed
    // license-block posting list that kills a 100 TB run
    assert(!p.contains("collect_set"),
      "the hotness gate must never materialize a per-key distinct set")
  }

  test("q81 span removal: h-keyed hotness window only; no token-row explode; " +
      "local per-doc splice") {
    val p = plan("q81_remove_dup_spans")
    // r15: the token explode + hit join + running-max window tail is
    // gone — survivors splice locally per doc from one collected
    // hot-start list, so the ONLY explode left is the window-hash one
    // and the ONLY window is the h-keyed hotness gate.
    assert("windowspecdefinition\\((?!h#)".r.findAllIn(p).isEmpty,
      "the only window is the h-keyed hotness gate")
    assert("Generate posexplode".r.findAllIn(p).size === 1,
      "ONE window-hash explode — token rows never explode into the shuffle")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("collect_set"),
      "the hotness gate must never materialize a per-key distinct set")
  }

  test("q147/q148 byte-grain ExactSubstr: partitioned windows, bounded hot-gate state") {
    for (q <- Seq("q147_exactsubstr_bytes", "q148_remove_exactsubstr")) {
      val p = plan(q)
      // both hotness gates (anchor + refined window) and every per-doc
      // pass ride a key partition — no unpartitioned window anywhere
      assert("windowspecdefinition\\((?!doc_id|h#)".r.findAllIn(p).isEmpty,
        s"$q: every window must be partitioned by doc_id or the hash key")
      assert(p.contains("windowspecdefinition(h#"),
        s"$q: hotness rides the hash key")
      assert(!p.contains("CartesianProduct"), q)
      // bounded hot-gate state: min/max (df=2 fast path) over the key
      // partition, never a collected doc-id set — the one unbounded
      // per-hot-key state the r13 audit flagged
      assert(!p.contains("collect_set"),
        s"$q: the hotness gate must never materialize a per-key distinct set")
    }
  }

  test("q41 boilerplate: flag-join shape — shingles exploded twice, ONE doc-keyed agg") {
    val p = plan("q41_boilerplate")
    // scan 1 derives the hot set (map-side combined), scan 2 flag-joins
    // it; n_shingles and n_boiler come from a single conditional-count
    // aggregation — no sizes↔overlap join of per-doc frames
    assert("Generate explode".r.findAllIn(p).size === 2, "hot-set scan + flag-join scan only")
    assert("keys=\\[doc_id".r.findAllIn(p).size === 2, "one per-doc agg (partial+final)")
    assert(p.contains("BroadcastHashJoin"), "the hot set broadcasts")
    assert(!p.contains("SortMergeJoin"), "no wide join of shingle rows")
  }

  test("q32 decontaminate: candidate shingles exploded once, counted in one agg") {
    val p = plan("q32_decontaminate")
    assert("Generate explode".r.findAllIn(p).size === 2, "one candidate + one benchmark explode")
    assert("keys=\\[doc_id".r.findAllIn(p).size === 2, "one per-doc agg (partial+final)")
    assert(p.contains("BroadcastHashJoin"), "the benchmark shingle set broadcasts")
  }

  test("q43 repetition: tokenizer feeds one explode; gram metrics stay per-row") {
    val p = plan("q43_repetition")
    assert("Generate explode".r.findAllIn(p).size === 1, "tokens exploded once for top-token")
    assert(!p.contains("Window"), "no window in the repetition path")
    assert(p.contains("BroadcastHashJoin"), "top-count frame broadcasts back to the gram side")
  }

  test("q36 pipeline composes without any collect or cartesian stage") {
    val p = plan("q36_curation_pipeline")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("MapPartitions"), "pure declarative plan end-to-end")
    assert(p.contains("BroadcastHashJoin"), "the benchmark shingle set broadcasts")
  }

  test("q150 scoring: no cartesian; one bounded-parallelism exchange feeds the scorer") {
    val p = plan("q150_model_quality_gate")
    assert(!p.contains("CartesianProduct"))
    // the distinct-text dedupe and the scoring parallelism share ONE
    // hash exchange (repartition-then-dropDuplicates): no RoundRobin
    // repartition stacked on top of the dedup's own exchange
    assert(!p.contains("RoundRobinPartitioning"),
      "scoring parallelism rides the dedup's hash exchange, not a second shuffle")
    assert(p.contains("ExistingRDD"), "batched mapPartitions feeds the plan")
    assert(!p.contains("collect_set") && !p.contains("collect_list"), p.take(200))
  }

  test("q151 gate recall: tagged single-pass constructions — no cartesian except the broadcast truth") {
    val p = plan("q151_gate_recall")
    // two deliberate broadcast crossings only: the truth pass (batch
    // side broadcast, old_id != new_id condition) and the 1-row n_true
    // spine cross (the q91 pattern); candidate generation must never
    assert(!p.contains("CartesianProduct"), "only broadcast crossing allowed")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "only the truth pass and the 1-row n_true cross; candidates ride " +
        "the (cons,t,bucket) join")
    assert(p.contains("graft_srp_bucket"), "bucket rows come from the native kernel")
  }

  test("q26 compact LSH: one bucket shuffle, in-group cosine kernel — no joins at all") {
    val p = plan("q26_embed_neardup")
    assert(!p.contains("Join"), "in-group verification — no embedding re-joins")
    assert(p.contains("graft_cosine_pairs"), "the native in-group cosine kernel")
    assert(!p.contains("CartesianProduct"), "never all-pairs")
    assert(!p.contains("SinglePartition"), "no constant-key single partition")
    assert(!p.contains("MapPartitions"), "no driver-collect exact path in the registered query")
  }

  test("exact near-dup operator (planes=0): broadcast-corpus mapPartitions, no join") {
    import spark.implicits._
    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val p = graft.ops.Similarity.nearDuplicates(vecs, threshold = 0.9, planes = 0)
      .queryExecution.executedPlan.toString
    assert(p.contains("MapPartitions"), "exact all-pairs runs as a tight partition loop")
    assert(!p.contains("Join"), "no n²/2-row join materialization")
    assert(!p.contains("SinglePartition"), "no constant-key single partition")
  }

  test("q51 tf-idf: one explode into a map-side-combined count; window prunes per partition") {
    val p = plan("q51_tfidf")
    assert(p.contains("Generate explode"), "tokens explode once")
    assert(p.contains("partial_count"), "tf counts combine map-side")
    assert(p.contains("WindowGroupLimit"), "top-k prunes before the final window sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q52 bm25: global top-k is a TakeOrdered, never a corpus-wide window sort") {
    val p = plan("q52_bm25")
    assert(p.contains("TakeOrderedAndProject"), "per-partition heaps + driver merge of k")
    assert(!p.contains("CartesianProduct"))
  }

  test("q55 PQ encode is join-free: codes are per-row expressions over the codebook literal") {
    val p = plan("q55_pq_encode")
    assert(!p.contains("Join"), "no corpus×codebook materialization")
    // the only Exchange is the output-presentation orderBy (range); the
    // encode itself must not hash-shuffle anything
    assert(!p.contains("Exchange hashpartitioning"), "encoding shuffles nothing")
    assert(p.contains("graft_ivf_nearest"), "the native argmin kernel runs per subspace")
    assert(!p.contains("+- Filter"), "posexplode_outer: no size>0 re-evaluation of the kernels")
  }

  test("q56 PQ ADC: broadcast probe scan of the codes table — no SMJ, no cartesian") {
    val p = plan("q56_pq_adc")
    assert(p.contains("BroadcastNestedLoopJoin"), "the ADC scan broadcasts probes+LUTs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "the corpus never shuffles to be scored")
  }

  test("q57 bloom decontamination never joins: bitmap literal + one doc-keyed agg") {
    val p = plan("q57_bloom_decontam")
    assert(!p.contains("Join"), "membership is an expression, not a join")
    assert(p.contains("partial_count"), "totals and maybe-hits combine map-side")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial + final aggregate")
  }

  test("q53 paragraph dedup: flag-join shape, no cartesian, bounded per-doc rebuild") {
    val p = plan("q53_paragraph_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate posexplode"), "paragraphs explode with their index")
    assert(p.contains("collect_list"), "reassembly is one per-doc aggregation")
  }

  test("q58 as-of join is a keyed window carry, never a range join") {
    val p = plan("q58_asof_join")
    assert(p.contains("Window"), "last-value carry within the key")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), "no O(l·r) range explosion")
    assert(!p.contains("SortMergeJoin"), "the sides union; they never join")
  }

  test("q59 semantic dedup: label join only in the final plan — no cartesian, no window") {
    // the CC closure runs eagerly (checkpointed rounds), so the final
    // plan is the survivor filter: corpus ⋈ labels — same shape as q39
    val p = plan("q59_semantic_dedup")
    assert(!p.contains("CartesianProduct"), "pairs are in-cluster only")
    assert(!p.contains("Window"), "no corpus-wide window anywhere")
    assert(p.contains("Join"), "survivors = corpus left-joined to component labels")
  }

  test("q60 IVF-PQ: probe side broadcasts on the cluster key; codes never shuffle wide") {
    val p = plan("q60_ivfpq")
    assert(p.contains("BroadcastHashJoin"), "probe LUTs broadcast; the join key is the cluster id")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), "IVF lists prune the scan — no full ADC sweep")
  }

  test("q62/q63 sketches: bounded-state aggregate / TakeOrdered heaps — no global sort") {
    val kmv = plan("q62_kmv_distinct")
    assert(kmv.contains("partial_graft_kmv_mins"),
      "k minimums via the native bounded-buffer aggregate, map-side combined")
    assert(!kmv.contains("TakeOrderedAndProject") && !kmv.contains("Sort "),
      "no distinct+sort pass over the hash set")
    val ws = plan("q63_weighted_sample")
    assert(ws.contains("TakeOrderedAndProject"), "top-n keys via per-partition heaps")
    assert(!ws.contains("Window"), "no rank window anywhere")
  }

  test("q64 contiguous ids never collapse to a single partition") {
    val p = plan("q64_contiguous_ids")
    assert(!p.contains("Window"), "no row_number window — two-pass range zip instead")
    assert(!p.contains("SinglePartition"), "the classic global-row_number scale-killer")
  }

  test("q66 exact quantiles: two-pass range ranks, q->rank targets broadcast") {
    val p = plan("q66_exact_quantiles")
    assert(!p.contains("Window"), "ranks come from the range zip, not a global window")
    assert(p.contains("BroadcastHashJoin"), "rank targets (|qs| rows) must broadcast")
  }

  test("q67 heavy hitters: the total reuses the counts exchange — one corpus walk") {
    // exchange reuse is an AQE runtime decision: execute, then read the
    // final adaptive plan
    val df = graft.SparkEntry.queries("q67_heavy_hitters")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "final adaptive plan expected")
    assert(p.contains("ReusedExchange"),
      "the total must derive from the counts exchange, not a second corpus scan")
    assert(p.contains("partial_count"), "map-side combine on the value counts")
  }

  test("q68 mixture sample: per-domain rates broadcast; corpus never shuffles for the gate") {
    val p = plan("q68_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), "rates (|domains| rows) must broadcast")
    assert(!p.contains("SortMergeJoin"), "the corpus must not shuffle to meet its rates")
  }

  test("q69 k-anonymity: left-semi join back — payload never rides the counting shuffle") {
    val p = plan("q69_k_anonymity")
    assert(p.contains("LeftSemi"), "suppression joins back as a semi join")
  }

  test("q70 contrastive triplets: rank-addressed negatives, no window, no cartesian") {
    val p = plan("q70_contrastive_pairs")
    assert(!p.contains("Window"), "corpus ranks come from the range zip")
    assert(!p.contains("CartesianProduct"), "the one cross join is a 1-row broadcast")
  }

  test("q78 pagerank: keyed joins and map-combined sums — no cartesian, no window") {
    val p = plan("q78_pagerank")
    assert(!p.contains("CartesianProduct"), "iterations join on node keys only")
    assert(!p.contains("Window"), "pure join/aggregate rounds")
    assert(p.contains("partial_sum"), "per-destination contributions map-side combine")
  }

  test("q75 LM score: map-combined count tables, no cartesian beyond the 1-row vocab") {
    val p = plan("q75_lm_score")
    assert(p.contains("partial_count"), "bigram/unigram counts map-side combine")
    assert(!p.contains("CartesianProduct"), "only the broadcast 1-row vocab crosses")
    assert(!p.contains("Window"), "pure aggregate/join shape — no windows")
  }

  test("q72 grouped quantiles: windows keyed on the group — never a single partition") {
    val p = plan("q72_grouped_quantiles")
    assert(p.contains("Window"), "grouped ranks are the window idiom")
    assert(!p.contains("SinglePartition"), "the window key is the group, not global")
  }

  test("q73 vocab: corpus-side top-k is a TakeOrdered heap; the rank window sees 32 rows") {
    val p = plan("q73_vocab_build")
    assert(p.contains("TakeOrderedAndProject"),
      "the corpus reduces via per-partition heaps before any window")
    assert(p.contains("partial_count"), "token counts map-side combine")
  }

  test("q82 DSIR: map-combined bucket counts, no cartesian beyond the 1-row totals") {
    val p = plan("q82_dsir_weights")
    assert(p.contains("partial_count"), "bucket distributions map-side combine")
    assert(!p.contains("CartesianProduct"), "only the broadcast 1-row totals cross")
    // r15: the bucket total `cr` is a sum-over-bkt-partition window
    // riding the pre-agg's exchange — the old groupBy+join-back form
    // re-ran the corpus tokenize per consumer (Catalyst prunes each
    // branch's copy differently, so ReuseExchange never fired)
    assert("windowspecdefinition\\((?!bkt#)".r.findAllIn(p).isEmpty,
      "the only window is the bkt-keyed bucket total")
    assert("Generate explode".r.findAllIn(p).size <= 2,
      "raw + target tokenize exactly once each — no duplicated explode chains")
  }

  test("q83 NB classifier: one aggregation pass per distribution, 1-row prior broadcasts") {
    val p = plan("q83_nb_classifier")
    assert(p.contains("partial_sum"), "class-conditional counts map-side combine")
    assert(!p.contains("CartesianProduct"), "totals/prior cross only as 1-row broadcasts")
    assert(!p.contains("Window"), "closed-form training — no windows, no iterations")
  }

  test("q84 cross decontamination: bench buckets broadcast — corpus bands never self-join") {
    val p = plan("q84_cross_decontam")
    assert(p.contains("BroadcastHashJoin"), "the eval-set bucket probe must broadcast")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cross product")
    assert(p.contains("graft_minhash"), "signatures come from the native one-pass kernel")
  }

  test("q85 snake shards: rank from the range zip — no window, no single partition") {
    val p = plan("q85_snake_shards")
    assert(!p.contains("Window"), "the global rank is the two-pass zip, not a window")
    assert(!p.contains("SinglePartition"), "the classic global-row_number scale-killer")
  }

  test("q86 centroids: native assignment + native vec-sum — the only explode is the " +
      "clusters×dims result") {
    val p = plan("q86_cluster_centroids")
    assert(p.contains("graft_ivf_nearest"), "assignment is the per-row argmin kernel")
    assert(p.contains("graft_vec_sum"), "component sums are the dims+1-long-buffer kernel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "no corpus×codebook materialization")
    // exactly one Generate: the posexplode of the ALREADY-AGGREGATED
    // centroids (clusters×dims rows) — never of the corpus
    assert("Generate".r.findAllIn(p).length === 1, "corpus must not explode")
  }

  test("q88 selection pipeline: composed stages keep their shapes — no cartesian, " +
      "no global window, no single partition") {
    // the final executedPlan is the post-zip tail (contiguousIds' RDD
    // boundary hides the upstream stages, whose shapes q30/q82/q83/q85's
    // own pins cover); what must hold HERE is that the shard assignment
    // and final sort never collapse to one partition or a window
    val p = plan("q88_selection_pipeline")
    assert(!p.contains("CartesianProduct"), "only 1-row broadcast crosses")
    assert(!p.contains("SinglePartition"), "snake rank stays the two-pass zip")
    assert(!p.contains("Window"), "no global row_number anywhere in the tail")
  }

  test("q89 global shuffle: positions from the range zip — no window, no single partition") {
    val p = plan("q89_global_shuffle")
    assert(!p.contains("Window"), "the permutation index is the two-pass zip")
    assert(!p.contains("SinglePartition"), "never a global-row_number collapse")
  }

  test("q90 zorder stats: one map-combined aggregation, key arithmetic in codegen") {
    val p = plan("q90_zorder_stats")
    assert(p.contains("partial_min") || p.contains("partial_max"),
      "envelope min/max combine map-side")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
    // the morton spread must be built-in long arithmetic (codegen-able
    // shiftleft/and/or), never a UDF opaque to the optimizer
    assert(p.contains("shiftleft") && !p.toLowerCase.contains("batchevalpython")
      && !p.contains("UDF"), "bit spread stays a native expression")
  }

  test("q91 lsh audit: no self-join of shingle rows beyond the grouped pair " +
      "generation; only the 1-row n_true crosses") {
    val p = plan("q91_lsh_audit")
    assert(!p.contains("CartesianProduct"), "no all-pairs anywhere")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "the only cross is the broadcast 1-row truth count")
    // r15: signatures compute ONCE through the native per-row pass and
    // land in a checkpointed (id, sig) frame every band config reads —
    // the final plan shows the checkpoint scans, not the kernel (the
    // kernel pin lives in q23's plan, which shares lshPairsFromSigs)
    assert(p.contains("ExistingRDD"),
      "band configs derive from the ONE checkpointed signature frame")
    assert(p.contains("graft_pairs"), "candidates from in-bucket generation, not a self-join")
  }

  test("q92 bpe apply: vocab-side segmentation — one explode over word types, " +
      "map-combined weighted counts, cached word-count scan") {
    val p = plan("q92_bpe_vocab")
    assert(p.contains("Generate"), "subword segmentation is an explode, not a UDF loop")
    assert(p.contains("partial_sum"), "cnt-weighted token counts combine map-side")
    assert(p.contains("ExistingRDD") || p.contains("InMemoryTableScan"),
      "apply reads the SAME materialized word counts training used — " +
        "one corpus pass total (localCheckpoint surfaces as an RDD scan)")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("q93 inverted index: postings group on (term, block) — no single partition; " +
      "global-df gate is a term-keyed window on index rows") {
    val p = plan("q93_inverted_index")
    assert(!p.contains("SinglePartition"), "posting lists never collapse to one task")
    // r15: the minDf gate is a sum-over-term-partition window on the
    // AGGREGATED block rows (2^blockBits-fold smaller than postings) —
    // the old df-aggregate + left_semi re-shuffled the full posting
    // rows by term (a stopword's whole posting list to one reducer)
    assert("windowspecdefinition\\((?!term#)".r.findAllIn(p).isEmpty,
      "the only window is the term-keyed global-df gate")
    assert(!p.contains("LeftSemi"), "the df gate rides the index rows, not a posting re-shuffle")
    // (doc, term) dedup is per-row array_distinct — the corpus-wide
    // distinct() exchange is gone
    assert("Generate explode".r.findAllIn(p).size === 1, "one tokenize explode")
  }

  test("q94 ann recall audit: native IVF assignment, no cartesian, no brute-force " +
      "pass — truth falls out of the shared full-probe branch") {
    val p = plan("q94_ann_recall")
    assert(p.contains("graft_ivf_nearest"), "cluster assignment is the per-row kernel")
    assert(!p.contains("CartesianProduct"), "no unbroadcast all-pairs")
    // the widest config (nProbe = |centroids|) probes every list, so
    // ground truth needs NO separate theta-join scoring pass: the only
    // nest-loop allowed is the broadcast 1-row n_true total
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      "only the 1-row total may nest-loop — truth shares the candidate pass")
  }

  test("q96 bpe doc ids: doc-side segmentation joins the vocab-id frame — " +
      "no window, no cartesian, no single partition in the tail") {
    // (the vocab rank itself is contiguousIds' two-pass zip behind an
    // RDD boundary — its no-window shape is pinned by q64/q85/q89)
    val p = plan("q96_bpe_doc_ids")
    assert(!p.contains("Window"), "the id-sequence hash is a sorted collect_list, not a window")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SinglePartition"))
  }

  test("q97 stratified weighted sample: rank window keyed on the stratum — " +
      "never a single partition") {
    val p = plan("q97_stratified_weighted")
    assert(p.contains("Window"), "per-stratum rank IS a window — keyed, which is fine")
    assert(!p.contains("SinglePartition"),
      "the window must partition by lang, not collapse globally")
    assert(!p.contains("CartesianProduct"))
  }

  test("q95 kmv merge: bounded native sketch buffers end to end — no distinct " +
      "exchange, no k-minimum sort pass") {
    val p = plan("q95_kmv_merge")
    assert("graft_kmv_mins".r.findAllIn(p).length >= 2,
      "per-source sketches AND the merge both run the O(k)-buffer aggregate")
    assert(!p.contains("TakeOrderedAndProject"), "no global k-minimum sort")
    assert(!p.toLowerCase.contains("hashaggregate(keys=[h"),
      "hashes are never distinct-shuffled corpus-wide")
    assert(!p.contains("Window"))
  }

  test("semanticDedup pair stage: per-row assignment + in-cluster native pair generation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // repartition keeps the frame out of ConvertToLocalRelation, which
    // would otherwise evaluate the kernels at optimization time
    val vecs = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 13 + d) * 5).toFloat)))
      .toDF("vec_id", "embedding").repartition(2)
    val cents = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("cid"), col("embedding"))
    val assigned = graft.ops.Similarity.ivfAssign(vecs, cents)
    val pairs = assigned.select(col("cluster"), col("vec_id"))
      .groupBy(col("cluster"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .select(explode(graft.ops.Dedup.pairsFromSortedIds(col("ids"))).as("p"))
    val p = pairs.queryExecution.executedPlan.toString
    assert(p.contains("graft_ivf_nearest"), "coarse assignment is the per-row kernel")
    assert(p.contains("graft_pairs"), "ids-only group-and-pair inside each cluster")
    assert(!p.contains("Join"), "pair generation never joins the corpus to itself")
  }

  test("q98 hll merge: the per-source aggregation subtree is shared, not recomputed") {
    // exchange reuse is an AQE runtime decision: execute, then read
    // the final adaptive plan (the q67 discipline)
    val df = graft.SparkEntry.queries("q98_hll_merge")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "final adaptive plan expected")
    assert(p.contains("ReusedExchange"),
      "both union branches must consume ONE per-source aggregation")
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Window"))
  }

  test("q99 count-min: map-side partial counts; the sketch side broadcasts to the queries") {
    val p = plan("q99_countmin")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "cells must combine map-side before the shuffle")
    assert(p.contains("BroadcastHashJoin"), "the depth×width sketch rides a broadcast")
  }

  test("q101 histogram quantiles: the cumulative window runs over BINS, never the corpus") {
    val p = plan("q101_histogram_quantiles")
    // the only windows allowed are over the bins-sized histogram; the
    // corpus-sized stages are plain hash aggregations
    assert(p.contains("HashAggregate"), "binning is one keyed aggregation")
    assert(!p.contains("CartesianProduct"), "n rides broadcast one-row joins")
  }

  test("q102 posting bits: gaps fold in place — never exploded") {
    val p = plan("q102_posting_bits")
    // Generates may appear twice (the postings subtree feeds both the
    // df gate and the index — q93's shape); the gamma fold must NOT
    // add a GAPS explode on top
    assert(!p.contains("explode(gaps") && !p.contains("posexplode(gaps"),
      "the bit accounting folds the packed arrays in place")
    assert(!p.contains("CartesianProduct"))
  }

  test("q103 containment: native pair generation, no shingle self-join") {
    val p = plan("q103_containment")
    assert(p.contains("graft_pairs"), "pairs from the grouped shingle lists")
    assert("SortMergeJoin".r.findAllIn(p).isEmpty,
      "size joins broadcast; the shingle rows are never self-joined")
  }

  test("q106 deep bpe: the native rank-table kernel, not a replace cascade") {
    val p = plan("q106_bpe_deep")
    assert(p.contains("graft_bpe_segment"), "the kernel must plan")
    assert(!p.contains("replace("),
      "no nested-replace cascade anywhere in the deep-table plan")
  }

  test("q107 overlap: estimates come from sketch rows (native kmv aggregate); no window") {
    val p = plan("q107_source_overlap")
    assert(p.contains("graft_kmv_mins"), "sketches built by the bounded aggregate")
    assert(!p.contains("Window"), "no rank pass anywhere — set ops on arrays")
  }

  test("q142 scene segmentation: the OPERATOR is shuffle-free (walk fused into the decode)") {
    import org.apache.spark.sql.functions._
    // the registered query appends an orderBy (a range exchange, for
    // the oracle compare) — the claim is about the OPERATOR: scene
    // rows are emitted by the task that decoded the video, no
    // Exchange, no Window, no join anywhere in its plan
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"))
    val media = docs.select(col("doc_id").as("media_id"),
      graft.ops.VideoHash.fixtureSceneMp4Udf(col("doc_id")).as("bytes"))
    val p = graft.ops.VideoHash.sceneSegments(media)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scene segmentation must not shuffle:\n${p.take(800)}")
    assert(!p.contains("Window"), "no window formulation — the walk is in the decode")
    assert(!p.contains("Join"), "no join anywhere")
  }

  test("q144 member removal: semi/anti label probes, no corpus self-join, no window") {
    val p = plan("q144_member_removal")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
    assert(!p.contains("Window"), "no window pass")
  }
}

class FileResourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("hash-sharded download paths (files.py:108-119)") {
    val (dir, name, ext) = FileResources.fileInfo("http://example.com/a/b/report.pdf?x=1")
    assert(name === "report" && ext === ".pdf")
    assert(dir.matches("downloads/[0-9a-f]/[0-9a-f]{2}"))
    val (_, idxName, idxExt) = FileResources.fileInfo("http://example.com/")
    assert(idxName === "index" && idxExt === ".html")
  }

  test("concat_args batching joins N args per request (tasks.py:65-97)") {
    val reqs = (1 to 7).map(_.toString).toDF("arg")
    val out = FileResources.concatArgs(reqs, size = 3).collect().map(_.getString(0)).sorted
    assert(out.length === 3)
    assert(out.contains("1|2|3"))
    assert(out.map(_.split('\\'+"|").length).sum === 7)
  }
}
