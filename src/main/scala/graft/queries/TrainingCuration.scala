package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Selection, Sketches, Stats, TextOps}

/** Curation / selection family: gopher quality, PII scrub, decontamination (exact/bloom/cross), caps, sampling, chunking, packing, boilerplate, repetition, pipelines, DSIR, NB classifier, mixing and ensemble selection.
  *
  * Split from the monolithic TrainingData registry by domain (round
  * 10, maintainability only): every query's Spark definition and its
  * DuckDB oracle SQL live in THIS file, in the same key order, so a
  * semantics change cannot land on one side without the other being
  * one screen away. Registered through [[TrainingData]]. */
private[queries] object TrainingCuration {
  import TrainingShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style quality rules: word stats + keep decision, pure
    // integer-count arithmetic.
    "q30_gopher_quality" -> ((s, d) => {
      val m = Curation.gopherMetrics(col("text"))
      t(s, d, "documents").select(col("doc_id"),
          m.getField("word_count").as("word_count"),
          m.getField("mean_word_len").as("mean_word_len"),
          m.getField("frac_unique").as("frac_unique"),
          m.getField("keep").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing over synthesized contact strings (the corpus is
    // clean word-soup, so a deterministic email+phone is appended per
    // doc — the point is cross-engine regex parity on the same RE2-safe
    // patterns).
    "q31_pii_scrub" -> ((s, d) => {
      val contact = concat(col("text"), lit(" contact "), col("source"),
        lit("@example.com call 555-0199"))
      val p = Curation.scrubPii(contact)
      // repartition BEFORE the regex scrub (the q130 doctrine): the
      // single-split scan ran the scrub serial, TWICE (the final
      // sort's range sample re-executes the projection)
      t(s, d, "documents")
        .widenedScan
        .select(col("doc_id"),
          p.getField("n_emails").as("n_emails"),
          p.getField("n_phones").as("n_phones"),
          md5(p.getField("scrubbed")).as("scrub_hash"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: src0 documents stand in for an eval
    // set; every other doc reports its shingle-overlap fraction.
    "q32_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Curation.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", shingleSize = 3, threshold = 0.5)
        .orderBy(col("doc_id"))
    }),

    // Per-domain cap: top 5 docs per source by length, window-ranked.
    "q33_domain_cap" -> ((s, d) => {
      Curation.domainCap(t(s, d, "documents"), "source", "n_chars", "doc_id",
          maxPerDomain = 5)
        .select(col("doc_id"), col("source"), col("domain_rank"))
        .orderBy(col("doc_id"))
    }),

    // The full curation pipeline composed end-to-end — what a corpus
    // run actually executes: Gopher quality gate → exact dedup (min id
    // per text hash) → benchmark decontamination (drop overlap ≥ 0.5
    // vs the src0 eval set) → stratified sample. Every stage is one of
    // the oracled operators above; the composition itself is the test.
    "q36_curation_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val m = Curation.gopherMetrics(col("text"))
      val quality = docs
        .withColumn("word_count", m.getField("word_count"))
        .filter(m.getField("keep"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = quality.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val candidates = deduped.filter(col("source") =!= "src0")
      val decon = Curation.decontaminate(candidates,
        docs.filter(col("source") === "src0"), "doc_id", "text")
      val clean = candidates
        .join(decon.select(col("doc_id"), col("contaminated")), Seq("doc_id"))
        .filter(!col("contaminated"))
      Curation.stratifiedSample(clean, "lang", "doc_id",
          rates = Map("en" -> 10), defaultRate = 50)
        .select(col("doc_id"), col("lang"), col("word_count"))
        .orderBy(col("doc_id"))
    }),

    // Context-window chunking: 32-token chunks, 8-token overlap —
    // per-doc explode, no shuffle, integer boundaries.
    "q37_chunking" -> ((s, d) => {
      Curation.chunk(t(s, d, "documents"), "doc_id", "text", size = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_ix"), col("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    // Greedy sequence packing into 512-token windows, parallel per
    // language shard — integer running totals.
    "q38_seq_packing" -> ((s, d) => {
      Curation.packSequences(t(s, d, "documents"), "lang", "doc_id", "text",
          window = 512)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("bin_offset"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic hash-mod stratified sampling: 10% of English, 50%
    // of everything else — a pure function of doc_id.
    "q34_stratified_sample" -> ((s, d) => {
      Curation.stratifiedSample(t(s, d, "documents"), "lang", "doc_id",
          rates = Map("en" -> 10), defaultRate = 50)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Boundary-respecting greedy packing: first-fit per lang shard at a
    // 512-token window — a doc that would overflow starts a new bin
    // (q38 is the concat-and-split variant where docs straddle bins).
    "q40_greedy_packing" -> ((s, d) => {
      Curation.packSequencesGreedy(t(s, d, "documents"), "lang", "doc_id", "text",
          window = 512)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"), col("bin_offset"))
        .orderBy(col("doc_id"))
    }),

    // Round-3 end-to-end composition: gopher quality → corpus
    // boilerplate filter → normalized dedup → exact-count balanced
    // take. Every stage is one of the oracled operators above.
    "q46_full_curation" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val quality = docs.filter(Curation.gopherMetrics(col("text")).getField("keep"))
      val clean = quality.join(
        Curation.boilerplateMetrics(quality, "doc_id", "text", shingleSize = 3,
            minDocFreq = 5, threshold = 0.5)
          .filter(col("keep")).select("doc_id"),
        Seq("doc_id"))
      val reps = clean
        .select(col("doc_id"), Curation.normalizeText(col("text")).as("norm"))
        .groupBy(col("norm")).agg(min(col("doc_id")).as("doc_id"))
      val deduped = clean.join(reps.select("doc_id"), Seq("doc_id"))
      Curation.stratifiedTake(deduped, "lang", "doc_id", perStratum = 30)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Gopher §A1.1 repetition signals: top-token share + duplicate
    // 3-gram fraction per doc.
    "q43_repetition" -> ((s, d) => {
      Curation.repetitionMetrics(t(s, d, "documents"), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // Exact-count per-stratum sampling: exactly 20 docs per lang,
    // chosen by stable md5 order — the balanced-mix primitive.
    "q44_stratified_take" -> ((s, d) => {
      Curation.stratifiedTake(t(s, d, "documents"), "lang", "doc_id", perStratum = 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-level boilerplate scoring: shingles in ≥5 distinct docs
    // are template junk; docs are scored by their boilerplate fraction.
    "q41_boilerplate" -> ((s, d) => {
      Curation.boilerplateMetrics(t(s, d, "documents"), "doc_id", "text",
          shingleSize = 3, minDocFreq = 5, threshold = 0.2)
        .orderBy(col("doc_id"))
    }),

    // End-to-end corpus prep — the round's operators composed the way a
    // pipeline runs them: paragraph-dedup the (3-token-paragraph)
    // corpus, quality-gate the CLEANED text, weighted-sample 100 docs
    // by kept-paragraph count, assign contiguous training indices.
    "q65_corpus_prep" -> ((s, d) => {
      // repartition BEFORE the paragraph explode (the q130 doctrine):
      // the single-row-group testdata parquet scans as ONE task
      val docs = t(s, d, "documents")
        .widenedScan
        .withColumn("ptext",
          regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n"))
      val cleaned = Dedup.paragraphDedup(docs, "doc_id", "ptext",
          splitPattern = "\n", minDocFreq = 2)
      val m = Curation.gopherMetrics(col("text_clean"))
      val quality = cleaned
        .withColumn("keep", m.getField("keep"))
        .filter(col("keep") && col("n_kept") > 0)
      val sampled = Sketches.weightedSample(quality, "doc_id", "n_kept", n = 100)
      // long-pair order key (u60 of md5, id tiebreak) — the q89 lesson;
      // persist stays on: the upstream (paragraphDedup + gates) is
      // expensive and the range-boundary sampling walk would re-run it
      Sketches.contiguousIds(
          sampled.select(col("doc_id"), col("n_kept"),
            Sketches.hash60(col("text_clean")).as("ord_key")),
          Seq("ord_key", "doc_id"), partitions = 0, persist = true)
        .select(col("row_ix"), col("doc_id"), col("n_kept"))
        .orderBy(col("row_ix"))
    }),

    // Deterministic weighted sampling (Efraimidis-Spirakis keys from
    // md5 uniforms): 25 documents, length-weighted.
    "q63_weighted_sample" -> ((s, d) => {
      Sketches.weightedSample(t(s, d, "documents"), "doc_id", "n_chars", n = 25)
        .select(col("doc_id"), col("sample_key"))
        .orderBy(col("doc_id"))
    }),

    // Bloom-filter decontamination: q32's benchmark membership replayed
    // through a 16384-bit md5-derived bloom — the candidate side never
    // joins; deterministic false positives are part of the contract.
    "q57_bloom_decontam" -> ((s, d) => {
      // widen BEFORE the candidate-side shingle/bloom probe (the q130
      // doctrine, r16): the probe pass ran 804 ms on ONE task of the
      // single-split scan (stage probe)
      val docs = t(s, d, "documents").widenedScan
      Curation.decontaminateBloom(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", shingleSize = 3, threshold = 0.5,
          nBits = 1 << 14, nHashes = 3)
        .orderBy(col("doc_id"))
    }),

    // Temperature-scaled language mixture (alpha = 0.5 up-weights rare
    // languages): per-domain rates broadcast onto the corpus — zero
    // corpus shuffles; the realized sample is md5-deterministic.
    "q68_mixture_sample" -> ((s, d) => {
      Curation.mixtureSample(t(s, d, "documents"), "lang", "doc_id",
          alpha = 0.5, targetRows = 200)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // DSIR importance weights: hashed-unigram log-likelihood ratio of
    // every doc under the English-slice target distribution vs the full
    // corpus — the distribution-reshaping selection signal.
    "q82_dsir_weights" -> ((s, d) => {
      // repartition BEFORE the tokenize explode (the q130 doctrine for
      // text): the single-row-group testdata parquet scans as ONE task
      // and the tokenize+bucket+pre-agg chain — q82's largest stage,
      // measured 730 ms single-task — runs serial without it. One
      // exchange of 5k skinny rows, shared by the raw AND target
      // subtrees (target derives from the same frame, so ReuseExchange
      // pays it once); at real scale the scan splits naturally and the
      // session width keeps this the normal shuffle fan-out.
      val docs = t(s, d, "documents")
        .widenedScan
      Selection.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 4096, k = 0.5)
        .orderBy(col("doc_id"))
    }),

    // Naive-Bayes quality classifier: closed-form training on the even
    // half (label = is-English), vocab-restricted scoring of the odd
    // half — the fastText-style linear filter, self-trained.
    "q83_nb_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("is_en", col("lang") === "en")
      val (model, prior) = Selection.naiveBayesTrain(train, "is_en", "text")
      Selection.naiveBayesScore(docs.filter(col("doc_id") % 2 === 1),
          model, prior, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Near-dup decontamination: corpus docs sharing any MinHash band
    // bucket with the held-out benchmark slice (doc_id % 97 = 0) —
    // the fuzzy counterpart of q32's exact n-gram overlap.
    "q84_cross_decontam" -> ((s, d) => {
      // repartition BEFORE the minhash kernel (the q130 doctrine)
      val docs = t(s, d, "documents")
        .widenedScan
      Dedup.crossContamination(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
          k = 16, bands = 4, shingleSize = 3)
        .orderBy(col("doc_id"))
    }),

    // Round-7 composed pipeline over the selection family: gopher
    // quality gate → self-trained NB classifier keeps predicted-English
    // → DSIR top-100 toward the English slice → snake-shard the
    // survivors into 4 balanced shards. Every stage is one of the
    // oracled operators above (q30/q83/q82/q85 machinery).
    "q88_selection_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val quality = docs.filter(Curation.gopherMetrics(col("text")).getField("keep"))
      val train = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("is_en", col("lang") === "en")
      val (model, prior) = Selection.naiveBayesTrain(train, "is_en", "text")
      val kept = quality.join(
        Selection.naiveBayesScore(quality, model, prior, "doc_id", "text")
          .filter(col("predicted")).select("doc_id"),
        Seq("doc_id"))
      val top = Selection.dsirSelect(kept, docs.filter(col("lang") === "en"),
        "doc_id", "text", n = 100)
      Selection.snakeShards(kept.join(top.select("doc_id"), Seq("doc_id")),
          "doc_id", "text", nShards = 4)
        .orderBy(col("doc_id"))
    }),

    // Stratified weighted sampling: 8 docs per language, drawn
    // ∝ length by deterministic ES keys — the per-stratum form of q63
    // (window keyed on the stratum: no global sort, no one-partition
    // collapse; the "N docs per language/domain" curation step).
    "q97_stratified_weighted" -> ((s, d) => {
      Sketches.weightedSampleGrouped(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars", nPerGroup = 8)
        .select(col("lang"), col("doc_id"), col("sample_key"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Training-mix epochs: the published-mix audit — per language,
    // actual tokens vs a 60/15/10/10/5 target mix at a 2M-token
    // budget; epochs > 1 flags the upsampled (repeated) slices.
    "q104_mix_epochs" -> ((s, d) => {
      Curation.mixtureEpochs(t(s, d, "documents"), "lang", "text",
          weights = Map("en" -> 0.60, "zh" -> 0.15, "de" -> 0.10,
            "es" -> 0.10, "fr" -> 0.05),
          budgetTokens = 2000000L)
        .orderBy(col("domain"))
    }),

    // Mixture materialization: q104's epochs table expanded into the
    // actual training list — floor full copies + an md5-gated
    // fractional copy per doc, deterministic engine-wide. Aggregated
    // per (domain, epoch_ix) so copy-count structure is fully pinned.
    "q108_epoch_expand" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val epochs = Curation.mixtureEpochs(docs, "lang", "text",
          weights = Map("en" -> 0.60, "zh" -> 0.15, "de" -> 0.10,
            "es" -> 0.10, "fr" -> 0.05),
          budgetTokens = 2000000L)
        .select(col("domain").as("lang"), col("epochs"))
      Curation.expandEpochs(docs.select(col("lang"), col("doc_id")),
          "lang", "doc_id", epochs)
        .groupBy(col("lang"), col("epoch_ix"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("epoch_ix"))
    }),

    // Per-source calibrated quality: CUME_DIST of an integer stopword
    // score WITHOUT a corpus window — (source, score) aggregation +
    // broadcast join back; "top 20% of each source" selection.
    "q113_calibrated_quality" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val stop = array(TextOps.DefaultProfiles.head._2.map(lit): _*)
      val scored = t(s, d, "documents").select(col("doc_id"), col("source"),
        (lit(1000L) * size(filter(toks, tk => array_contains(stop, tk))) /
          greatest(size(toks), lit(1))).cast("long").as("score_milli"))
      Stats.groupedCumeDist(scored, "source", "score_milli")
        .withColumn("selected", col("cume_dist") >= 0.8)
        .select(col("doc_id"), col("source"), col("score_milli"),
          col("cume_dist"), col("selected"))
        .orderBy(col("doc_id"))
    }),

    // Quantile-ensemble quality selection: three discrete signals
    // (token count, stopword milli-ratio, type-token milli-ratio)
    // each mapped to its corpus CUME_DIST via the aggregate+broadcast
    // trick, mean of quantiles, top-100.
    "q119_ensemble_quality" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val stop = array(TextOps.DefaultProfiles.head._2.map(lit): _*)
      val scored = t(s, d, "documents").select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (lit(1000L) * size(filter(toks, tk => array_contains(stop, tk))) /
          greatest(size(toks), lit(1))).cast("long").as("stop_milli"),
        (lit(1000L) * size(array_distinct(toks)) /
          greatest(size(toks), lit(1))).cast("long").as("ttr_milli"))
      Selection.ensembleCumeDist(scored, Seq("n_tokens", "stop_milli", "ttr_milli"))
        .orderBy(col("ensemble_score").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), col("n_tokens"), col("stop_milli"),
          col("ttr_milli"), col("q_n_tokens"), col("q_stop_milli"),
          col("q_ttr_milli"), col("ensemble_score"))
    }),

    // Model-based quality gate through the INJECTABLE Scorer contract
    // (ops/ModelScoring.scala — the reference's declared PromptResource
    // direction): every doc scored by the batched cache-first scoring
    // kernel with the deterministic closed-form default, gated at
    // 0.596 (the corpus median, so the verdict column discriminates).
    // The oracle replays the closed form in SQL (identical IEEE
    // op order), so the verdicts pin the WHOLE scoring path — keying,
    // batching, join-back — not just the default's arithmetic; the
    // store-backed behavior (exactly-once, signature keying,
    // cross-scorer verdict equivalence) is ModelScoringSpec's job.
    "q150_model_quality_gate" -> ((s, d) => {
      graft.ops.ModelScoring.gateByScore(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", graft.ops.Scorer.Default, threshold = 0.596,
          batchSize = 64)
        .select(col("doc_id"), round(col("score"), 6).as("score"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // The scorer contract composed the way a corpus run uses it:
    // model-score gate (q150's scorer + threshold) → exact dedup
    // (q36's min-id-per-text-hash window) → balanced per-lang take
    // (q44's stable md5 order). Every stage is an oracled operator;
    // the composition — scores surviving two downstream stages with
    // verdict-gated row loss in between — is the test.
    "q152_scored_corpus" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gated = graft.ops.ModelScoring.gateByScore(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("text")),
          "doc_id", "text", graft.ops.Scorer.Default, threshold = 0.596)
        .filter(col("keep"))
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = gated.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      Curation.stratifiedTake(deduped, "lang", "doc_id", perStratum = 25)
        .select(col("doc_id"), col("lang"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // q82: per-token hashed-bucket LLR in pico-units (the q75 ln
    // doctrine), target = English slice, raw = full corpus.
    "q82_dsir_weights" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS tk FROM documents),
         |b AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::UBIGINT % 4096 AS bkt
         |      FROM tok),
         |rawc AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
         |tgtc AS (SELECT bkt, count(*) AS ct
         |         FROM b JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY bkt),
         |tot AS (SELECT (SELECT sum(cr) FROM rawc) AS nr, (SELECT sum(ct) FROM tgtc) AS nt),
         |lp AS (
         |  SELECT doc_id,
         |    round((ln((COALESCE(ct, 0) + 0.5) / (nt + 0.5 * 4096))
         |         - ln((cr + 0.5) / (nr + 0.5 * 4096))) * 1e12)::BIGINT AS w
         |  FROM b JOIN rawc USING (bkt) LEFT JOIN tgtc USING (bkt) CROSS JOIN tot),
         |agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |               round(sum(w) / 1e12, 6) AS log_weight
         |        FROM lp GROUP BY doc_id)
         |SELECT doc_id, COALESCE(n_tokens, 0)::BIGINT AS n_tokens, log_weight
         |FROM documents LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q83: count-based NB — vocab LLR table from the even half, prior
    // log-odds, vocab-restricted scoring of the odd half.
    "q83_nb_classifier" ->
      s"""WITH train AS (
         |  SELECT doc_id, text, (lang = 'en') AS y FROM documents WHERE doc_id % 2 = 0),
         |tok AS (SELECT y, unnest($tokensSql) AS tk FROM train),
         |cnt AS (SELECT tk,
         |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS c_pos,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS c_neg
         |  FROM tok GROUP BY tk),
         |tot AS (SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg, count(*) AS v FROM cnt),
         |model AS (
         |  SELECT tk, round((ln((c_pos + 0.5) / (n_pos + 0.5 * v))
         |                  - ln((c_neg + 0.5) / (n_neg + 0.5 * v))) * 1e12)::BIGINT AS llr
         |  FROM cnt CROSS JOIN tot),
         |prior AS (
         |  SELECT round(ln(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
         |               / sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) * 1e12)::BIGINT AS p
         |  FROM documents WHERE doc_id % 2 = 0),
         |score AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_vocab_tokens, sum(llr)::BIGINT AS s
         |  FROM (SELECT doc_id, unnest($tokensSql) AS tk
         |        FROM documents WHERE doc_id % 2 = 1) dt
         |  JOIN model USING (tk) GROUP BY doc_id)
         |SELECT doc_id, COALESCE(n_vocab_tokens, 0)::BIGINT AS n_vocab_tokens,
         |  round((COALESCE(s, 0) + p) / 1e12, 6) AS log_odds,
         |  (COALESCE(s, 0) + p) > 0 AS predicted
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         |LEFT JOIN score USING (doc_id) CROSS JOIN prior
         |ORDER BY doc_id""".stripMargin,
    // q84: q23's band machinery split corpus-vs-benchmark — distinct
    // colliding bench docs per corpus doc, zero-match rows included.
    "q84_cross_decontam" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |matches AS (
         |  SELECT c.doc_id AS doc_id, count(DISTINCT b.doc_id)::BIGINT AS n_bench_matches
         |  FROM bands c JOIN bands b ON c.band = b.band AND c.bucket = b.bucket
         |  WHERE c.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
         |  GROUP BY c.doc_id)
         |SELECT doc_id, COALESCE(n_bench_matches, 0)::BIGINT AS n_bench_matches,
         |  COALESCE(n_bench_matches, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
         |LEFT JOIN matches USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q88: q30's gate + q83's NB train/score + q82's LLR (raw = the
    // kept set, target = the full-corpus English slice) + q85's snake,
    // composed.
    "q88_selection_pipeline" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    len($tokensSql)::BIGINT AS word_count,
         |    round(list_sum(list_transform($tokensSql, x -> length(x)))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS mean_word_len,
         |    round(len(list_distinct($tokensSql))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS frac_unique
         |  FROM documents),
         |quality AS (
         |  SELECT doc_id FROM m
         |  WHERE word_count >= 3 AND word_count <= 100000
         |    AND mean_word_len >= 1.0 AND mean_word_len <= 12.0
         |    AND frac_unique >= 0.2),
         |train AS (
         |  SELECT doc_id, text, (lang = 'en') AS y FROM documents WHERE doc_id % 2 = 0),
         |ttok AS (SELECT y, unnest($tokensSql) AS tk FROM train),
         |cnt AS (SELECT tk,
         |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS c_pos,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS c_neg
         |  FROM ttok GROUP BY tk),
         |tot AS (SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg, count(*) AS v FROM cnt),
         |model AS (
         |  SELECT tk, round((ln((c_pos + 0.5) / (n_pos + 0.5 * v))
         |                  - ln((c_neg + 0.5) / (n_neg + 0.5 * v))) * 1e12)::BIGINT AS llr
         |  FROM cnt CROSS JOIN tot),
         |prior AS (
         |  SELECT round(ln(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
         |               / sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) * 1e12)::BIGINT AS p
         |  FROM documents WHERE doc_id % 2 = 0),
         |nb AS (
         |  SELECT q.doc_id, COALESCE(s.s, 0) AS s
         |  FROM quality q
         |  LEFT JOIN (
         |    SELECT doc_id, sum(llr)::BIGINT AS s
         |    FROM (SELECT d.doc_id, unnest($tokensSql) AS tk
         |          FROM documents d JOIN quality USING (doc_id)) dt
         |    JOIN model USING (tk) GROUP BY doc_id) s USING (doc_id)),
         |kept AS (SELECT doc_id FROM nb CROSS JOIN prior WHERE s + p > 0),
         |ktok AS (SELECT d.doc_id, unnest($tokensSql) AS tk
         |         FROM documents d JOIN kept USING (doc_id)),
         |b AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::UBIGINT % 4096 AS bkt
         |      FROM ktok),
         |rawc AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
         |tgtb AS (SELECT ('0x' || substr(md5(tk), 1, 15))::UBIGINT % 4096 AS bkt
         |         FROM (SELECT unnest($tokensSql) AS tk FROM documents WHERE lang = 'en')),
         |tgtc AS (SELECT bkt, count(*) AS ct FROM tgtb GROUP BY bkt),
         |dtot AS (SELECT (SELECT sum(cr) FROM rawc) AS nr, (SELECT sum(ct) FROM tgtc) AS nt),
         |lp AS (
         |  SELECT doc_id,
         |    round((ln((COALESCE(ct, 0) + 0.5) / (nt + 0.5 * 4096))
         |         - ln((cr + 0.5) / (nr + 0.5 * 4096))) * 1e12)::BIGINT AS w
         |  FROM b JOIN rawc USING (bkt) LEFT JOIN tgtc USING (bkt) CROSS JOIN dtot),
         |wt AS (SELECT doc_id, round(sum(w) / 1e12, 6) AS lw FROM lp GROUP BY doc_id),
         |top AS (SELECT doc_id FROM wt WHERE lw IS NOT NULL
         |        ORDER BY lw DESC, doc_id LIMIT 100),
         |sized AS (SELECT doc_id, len($tokensSql)::BIGINT AS n
         |          FROM documents JOIN top USING (doc_id)),
         |r AS (SELECT doc_id, n,
         |        ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) - 1 AS rk FROM sized)
         |SELECT doc_id, n AS n_tokens,
         |  (CASE WHEN (rk // 4) % 2 = 0 THEN rk % 4 ELSE 3 - (rk % 4) END)::BIGINT AS shard
         |FROM r ORDER BY doc_id""".stripMargin,
    "q46_full_curation" ->
      s"""WITH m AS (
         |  SELECT doc_id, text, lang,
         |    len($tokensSql)::BIGINT AS word_count,
         |    round(list_sum(list_transform($tokensSql, x -> length(x)))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS mean_word_len,
         |    round(len(list_distinct($tokensSql))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS frac_unique
         |  FROM documents),
         |quality AS (
         |  SELECT doc_id, text, lang FROM m
         |  WHERE word_count >= 3 AND word_count <= 100000
         |    AND mean_word_len >= 1.0 AND mean_word_len <= 12.0
         |    AND frac_unique >= 0.2),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, unnest(list_transform(range(len($tokensSql)-2),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
         |  FROM quality)),
         |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 5),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |ov AS (SELECT doc_id, count(*) AS nb FROM sh JOIN hot USING (s) GROUP BY doc_id),
         |clean AS (
         |  SELECT q.doc_id, q.lang, q.text FROM quality q
         |  JOIN sizes ON q.doc_id = sizes.doc_id
         |  LEFT JOIN ov ON q.doc_id = ov.doc_id
         |  WHERE round(COALESCE(nb, 0)::DOUBLE / sizes.n, 6) < 0.5),
         |normd AS (SELECT doc_id, lang, trim(regexp_replace(regexp_replace(lower(text),
         |  '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM clean),
         |reps AS (SELECT min(doc_id) AS doc_id FROM normd GROUP BY norm),
         |ded AS (SELECT n.doc_id, n.lang FROM normd n JOIN reps ON n.doc_id = reps.doc_id),
         |r AS (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
         |  ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT, doc_id) AS rn
         |  FROM ded)
         |SELECT doc_id, lang FROM r WHERE rn <= 30 ORDER BY doc_id""".stripMargin,
    "q43_repetition" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |base AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  greatest(len(toks) - 2, 0)::BIGINT AS total_grams,
         |  len(list_distinct(list_transform(range(len(toks)-2),
         |    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])))::BIGINT AS distinct_grams,
         |  toks FROM t),
         |top AS (SELECT doc_id, max(c) AS top_count FROM (
         |  SELECT doc_id, tk, count(*) AS c FROM (
         |    SELECT doc_id, unnest(toks) AS tk FROM t) GROUP BY doc_id, tk)
         |  GROUP BY doc_id)
         |SELECT b.doc_id, n_tokens,
         |  round(COALESCE(top_count, 0)::DOUBLE / greatest(n_tokens, 1), 6) AS top_token_frac,
         |  CASE WHEN total_grams = 0 THEN 0.0
         |    ELSE round(1.0 - distinct_grams::DOUBLE / total_grams, 6) END AS dup_ngram_frac
         |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "q44_stratified_take" ->
      """WITH r AS (SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin,
    "q41_boilerplate" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 5),
         |sizes AS (
         |  SELECT d.doc_id, COALESCE(c.n, 0)::BIGINT AS n_shingles
         |  FROM documents d
         |  LEFT JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id) c
         |    USING (doc_id)),
         |ov AS (SELECT doc_id, count(*) AS n_boiler FROM sh JOIN hot USING (s)
         |       GROUP BY doc_id)
         |SELECT sizes.doc_id, n_shingles,
         |  COALESCE(n_boiler, 0)::BIGINT AS n_boiler,
         |  CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_boiler, 0)::DOUBLE / n_shingles, 6) END
         |    AS boiler_frac,
         |  COALESCE(CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_boiler, 0)::DOUBLE / n_shingles, 6) END
         |    < 0.2, true) AS keep
         |FROM sizes LEFT JOIN ov ON sizes.doc_id = ov.doc_id
         |ORDER BY sizes.doc_id""".stripMargin,
    // q40: the first-fit fill recurrence replayed as a per-shard
    // recursive CTE stepping one row_number at a time (all shards
    // advance together per iteration).
    "q40_greedy_packing" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, lang, len($tokensSql)::BIGINT AS n,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
         |  FROM documents),
         |pack AS (
         |  SELECT lang, rn, doc_id, n, 0::BIGINT AS bin, 0::BIGINT AS bin_offset,
         |    n AS fill
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.lang, t.rn, t.doc_id, t.n,
         |    CASE WHEN p.fill > 0 AND p.fill + t.n > 512 THEN p.bin + 1 ELSE p.bin END,
         |    CASE WHEN p.fill > 0 AND p.fill + t.n > 512 THEN 0::BIGINT ELSE p.fill END,
         |    CASE WHEN p.fill > 0 AND p.fill + t.n > 512 THEN t.n ELSE p.fill + t.n END
         |  FROM pack p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1)
         |SELECT doc_id, lang, n AS n_tokens, bin::BIGINT AS bin,
         |  bin_offset::BIGINT AS bin_offset
         |FROM pack ORDER BY doc_id""".stripMargin,
    "q30_gopher_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    len($tokensSql)::BIGINT AS word_count,
         |    round(list_sum(list_transform($tokensSql, x -> length(x)))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS mean_word_len,
         |    round(len(list_distinct($tokensSql))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS frac_unique
         |  FROM documents)
         |SELECT doc_id, word_count, mean_word_len, frac_unique,
         |  (word_count >= 3 AND word_count <= 100000
         |   AND mean_word_len >= 1.0 AND mean_word_len <= 12.0
         |   AND frac_unique >= 0.2) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "q31_pii_scrub" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    text || ' contact ' || source || '@example.com call 555-0199' AS t
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM c)
        |SELECT doc_id, n_emails,
        |  len(regexp_extract_all(t1, '[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
        |  md5(regexp_replace(t1, '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_hash
        |FROM e ORDER BY doc_id""".stripMargin,
    "q32_decontaminate" ->
      s"""WITH cand AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(range(len($tokensSql)-2),
         |      i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3]))) AS s
         |    FROM documents WHERE source <> 'src0')),
         |bench AS (
         |  SELECT DISTINCT unnest(list_transform(range(len($tokensSql)-2),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
         |  FROM documents WHERE source = 'src0'),
         |sizes AS (
         |  SELECT d.doc_id, COALESCE(c.n, 0)::BIGINT AS n_shingles
         |  FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
         |  LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cand GROUP BY 1) c
         |    USING (doc_id)),
         |overlap AS (
         |  SELECT cand.doc_id, COUNT(*) AS n_overlap
         |  FROM cand JOIN bench ON cand.s = bench.s GROUP BY 1)
         |SELECT sizes.doc_id, n_shingles,
         |  COALESCE(n_overlap, 0)::BIGINT AS n_overlap,
         |  CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_overlap, 0)::DOUBLE / n_shingles, 6) END
         |    AS overlap_frac,
         |  COALESCE(CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_overlap, 0)::DOUBLE / n_shingles, 6) END
         |    >= 0.5, false) AS contaminated
         |FROM sizes LEFT JOIN overlap ON sizes.doc_id = overlap.doc_id
         |ORDER BY sizes.doc_id""".stripMargin,
    "q33_domain_cap" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS domain_rank
        |  FROM documents)
        |SELECT doc_id, source, domain_rank FROM ranked
        |WHERE domain_rank <= 5 ORDER BY doc_id""".stripMargin,
    "q36_curation_pipeline" ->
      s"""WITH m AS (
         |  SELECT doc_id, text, lang, source,
         |    len($tokensSql)::BIGINT AS word_count,
         |    round(list_sum(list_transform($tokensSql, x -> length(x)))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS mean_word_len,
         |    round(len(list_distinct($tokensSql))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS frac_unique
         |  FROM documents),
         |quality AS (
         |  SELECT * FROM m
         |  WHERE word_count >= 3 AND word_count <= 100000
         |    AND mean_word_len >= 1.0 AND mean_word_len <= 12.0
         |    AND frac_unique >= 0.2),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
         |                                 ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |cand AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(range(len($tokensSql)-2),
         |      i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3]))) AS s
         |    FROM deduped WHERE source <> 'src0')),
         |bench AS (
         |  SELECT DISTINCT unnest(list_transform(range(len($tokensSql)-2),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
         |  FROM documents WHERE source = 'src0'),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM cand GROUP BY 1),
         |overlap AS (
         |  SELECT cand.doc_id, COUNT(*) AS n_overlap
         |  FROM cand JOIN bench ON cand.s = bench.s GROUP BY 1),
         |clean AS (
         |  SELECT d.doc_id, d.lang, d.word_count
         |  FROM deduped d JOIN sizes ON d.doc_id = sizes.doc_id
         |  LEFT JOIN overlap ON d.doc_id = overlap.doc_id
         |  WHERE round(COALESCE(n_overlap, 0)::DOUBLE / n_shingles, 6) < 0.5)
         |SELECT doc_id, lang, word_count FROM clean
         |WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)
         |      < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
         |ORDER BY doc_id""".stripMargin,
    "q37_chunking" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |nz AS (SELECT * FROM t WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s FROM nz)
         |SELECT doc_id, s // 24 AS chunk_ix,
         |  len(list_slice(toks, s + 1, s + 32))::BIGINT AS chunk_tokens,
         |  md5(array_to_string(list_slice(toks, s + 1, s + 32), ' ')) AS chunk_hash
         |FROM st ORDER BY doc_id, chunk_ix""".stripMargin,
    "q38_seq_packing" ->
      s"""WITH t AS (SELECT doc_id, lang, len($tokensSql)::BIGINT AS n_tokens
         |           FROM documents),
         |p AS (
         |  SELECT doc_id, lang, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bin_offset
         |  FROM t)
         |SELECT doc_id, lang, n_tokens, bin_offset::BIGINT AS bin_offset,
         |  (bin_offset // 512)::BIGINT AS bin
         |FROM p ORDER BY doc_id""".stripMargin,
    "q34_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)
        |      < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
        |ORDER BY doc_id""".stripMargin,
    // q65: q53's paragraph CTEs → gopher gate on the cleaned text →
    // A-ES top-100 by kept-paragraph weight → row_number indices.
    "q65_corpus_prep" ->
      s"""WITH p0 AS (SELECT doc_id,
         |  string_split(regexp_replace(text, '(\\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g'),
         |    chr(10)) AS l FROM documents),
         |paras AS (SELECT doc_id, unnest(l) AS para,
         |  generate_subscripts(l, 1) AS ix FROM p0),
         |pp AS (SELECT * FROM paras WHERE para <> ''),
         |hot AS (SELECT md5(para) AS h FROM pp GROUP BY md5(para)
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |kept AS (SELECT pp.doc_id, pp.para, pp.ix FROM pp
         |  LEFT JOIN hot ON md5(pp.para) = hot.h WHERE hot.h IS NULL),
         |k AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  string_agg(para, chr(10) ORDER BY ix) AS txt FROM kept GROUP BY doc_id),
         |toks AS (SELECT doc_id, n_kept, txt,
         |  list_filter(regexp_split_to_array(regexp_replace(txt,
         |    '([\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}])', ' \\1 ', 'g'),
         |    '[\\s　]+'), tk -> tk <> '') AS tk FROM k),
         |m AS (SELECT doc_id, n_kept, txt,
         |  len(tk)::BIGINT AS wc,
         |  round(list_sum(list_transform(tk, x -> length(x)))::DOUBLE
         |        / greatest(len(tk), 1), 6) AS mwl,
         |  round(len(list_distinct(tk))::DOUBLE / greatest(len(tk), 1), 6) AS fu
         |  FROM toks),
         |quality AS (SELECT doc_id, n_kept, txt FROM m
         |  WHERE wc >= 3 AND wc <= 100000 AND mwl >= 1.0 AND mwl <= 12.0
         |    AND fu >= 0.2 AND n_kept > 0),
         |sk AS (SELECT doc_id, n_kept, txt,
         |  round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
         |        / 1152921504606846976.0) / n_kept::DOUBLE, 6) AS sample_key
         |  FROM quality),
         |top AS (SELECT doc_id, n_kept, txt FROM sk
         |        ORDER BY sample_key DESC, doc_id LIMIT 100)
         |SELECT (ROW_NUMBER() OVER (ORDER BY
         |          ('0x' || substr(md5(txt), 1, 15))::UBIGINT, doc_id)
         |        - 1)::BIGINT AS row_ix, doc_id, n_kept
         |FROM top ORDER BY row_ix""".stripMargin,
    // q63: rank key = round(ln(u)/w, 6) with u = (h60+1)/2^60 — ln ulp
    // noise cannot reorder the ROUNDED keys.
    "q63_weighted_sample" ->
      """WITH k AS (SELECT doc_id,
        |    round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
        |          / 1152921504606846976.0) / n_chars::DOUBLE, 6) AS sample_key
        |  FROM documents),
        |top AS (SELECT doc_id, sample_key FROM k
        |        ORDER BY sample_key DESC, doc_id LIMIT 25)
        |SELECT doc_id, sample_key FROM top ORDER BY doc_id""".stripMargin,
    // q57: the bloom membership relationally — candidate shingle is a
    // maybe-hit iff ALL 3 md5-derived bit positions land in the bench
    // position set (identical positions → identical false positives).
    "q57_bloom_decontam" ->
      s"""WITH cand AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(range(len($tokensSql)-2),
         |      i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3]))) AS s
         |    FROM documents WHERE source <> 'src0')),
         |bench AS (
         |  SELECT DISTINCT unnest(list_transform(range(len($tokensSql)-2),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
         |  FROM documents WHERE source = 'src0'),
         |bpos AS (SELECT DISTINCT
         |    (('0x' || substr(md5(i::VARCHAR || '|' || s), 1, 15))::UBIGINT % 16384) AS pos
         |  FROM bench, range(3) t(i)),
         |cpos AS (SELECT doc_id, s, i,
         |    (('0x' || substr(md5(i::VARCHAR || '|' || s), 1, 15))::UBIGINT % 16384) AS pos
         |  FROM cand, range(3) t(i)),
         |maybe AS (
         |  SELECT doc_id, s FROM cpos JOIN bpos USING (pos)
         |  GROUP BY doc_id, s HAVING COUNT(DISTINCT i) = 3),
         |sizes AS (
         |  SELECT d.doc_id, COALESCE(c.n, 0)::BIGINT AS n_shingles
         |  FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
         |  LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cand GROUP BY 1) c
         |    USING (doc_id)),
         |mb AS (SELECT doc_id, COUNT(*) AS n_maybe FROM maybe GROUP BY 1)
         |SELECT sizes.doc_id, n_shingles,
         |  COALESCE(n_maybe, 0)::BIGINT AS n_maybe,
         |  CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_maybe, 0)::DOUBLE / n_shingles, 6) END
         |    AS maybe_frac,
         |  COALESCE(CASE WHEN n_shingles > 0
         |    THEN round(COALESCE(n_maybe, 0)::DOUBLE / n_shingles, 6) END
         |    >= 0.5, false) AS contaminated
         |FROM sizes LEFT JOIN mb ON sizes.doc_id = mb.doc_id
         |ORDER BY sizes.doc_id""".stripMargin,

    // Rates round to 9 decimals before the u60 gate so pow() ulp noise
    // between engines cannot flip a row; arithmetic order mirrors the
    // Spark side exactly ((target·w) / wsum / n, left to right).
    "q68_mixture_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, pow(n, 0.5) AS w FROM c),
        |s AS (SELECT sum(w) AS wsum FROM w),
        |r AS (SELECT lang, least(1.0::DOUBLE,
        |        round(200.0 * w / wsum / n, 9)) AS rate FROM w, s),
        |kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
        |  WHERE ((('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
        |         / 1152921504606846976.0) < r.rate)
        |SELECT lang, count(*) AS n_sampled FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // q97: q63's ES key with the rank window partitioned by stratum.
    "q97_stratified_weighted" ->
      """WITH k AS (SELECT lang, doc_id,
        |    round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
        |          / 1152921504606846976.0) / n_chars::DOUBLE, 6) AS sample_key
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT lang, doc_id, sample_key,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY sample_key DESC, doc_id) AS rank
        |  FROM k)
        |SELECT lang, doc_id, sample_key, rank::BIGINT AS rank
        |FROM r WHERE rank <= 8 ORDER BY lang, rank""".stripMargin,

    // q104: the published-mix table as VALUES, double arithmetic
    // mirrored (round-half-up targets, round(…,6) epochs).
    "q104_mix_epochs" ->
      s"""WITH tc AS (SELECT lang AS domain, sum(len($tokensSql))::BIGINT AS n_tokens
         |            FROM documents GROUP BY 1),
         |w AS (SELECT * FROM (VALUES ('en', 0.60), ('zh', 0.15), ('de', 0.10),
         |                           ('es', 0.10), ('fr', 0.05)) t(domain, weight)),
         |j AS (SELECT tc.domain, tc.n_tokens,
         |        coalesce(w.weight, 0.0)::DOUBLE AS weight,
         |        round(2000000.0 * coalesce(w.weight, 0.0)::DOUBLE)::BIGINT AS target_tokens
         |      FROM tc LEFT JOIN w USING (domain)),
         |e AS (SELECT *, CASE WHEN n_tokens > 0
         |        THEN round(target_tokens::DOUBLE / n_tokens, 6) END AS epochs FROM j)
         |SELECT domain, n_tokens, weight, target_tokens, epochs,
         |  epochs > 1.0 AS upsampled
         |FROM e ORDER BY domain""".stripMargin,

    // q108: q104's epochs replayed, then per-doc copies = floor +
    // (md5-uniform < frac), unnested as epoch indices.
    "q108_epoch_expand" ->
      s"""WITH tc AS (SELECT lang AS domain, sum(len($tokensSql))::BIGINT AS n_tokens
         |            FROM documents GROUP BY 1),
         |w AS (SELECT * FROM (VALUES ('en', 0.60), ('zh', 0.15), ('de', 0.10),
         |                           ('es', 0.10), ('fr', 0.05)) t(domain, weight)),
         |j AS (SELECT tc.domain, tc.n_tokens,
         |        round(2000000.0 * coalesce(w.weight, 0.0)::DOUBLE)::BIGINT AS target_tokens
         |      FROM tc LEFT JOIN w USING (domain)),
         |e AS (SELECT domain AS lang, CASE WHEN n_tokens > 0
         |        THEN round(target_tokens::DOUBLE / n_tokens, 6) END AS epochs FROM j),
         |x AS (SELECT d.lang, d.doc_id, e.epochs,
         |        (floor(e.epochs)::INT +
         |         CASE WHEN ((('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::DOUBLE + 1.0)
         |                    / 1152921504606846976.0) < (e.epochs - floor(e.epochs)::INT)
         |              THEN 1 ELSE 0 END) AS n
         |      FROM documents d JOIN e ON d.lang = e.lang
         |      WHERE e.epochs IS NOT NULL),
         |u AS (SELECT lang, doc_id, unnest(range(n)) AS epoch_ix FROM x WHERE n > 0)
         |SELECT lang, epoch_ix::BIGINT AS epoch_ix, count(*)::BIGINT AS n_docs
         |FROM u GROUP BY 1, 2 ORDER BY lang, epoch_ix""".stripMargin,

    // q113: CUME_DIST itself is the oracle — tie-insensitive, so the
    // engine's aggregation + broadcast-join-back form must agree
    // value-for-value. Integer milli score: occurrence-counted
    // stopword hits, floor division in both engines.
    "q113_calibrated_quality" ->
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |    ((1000 * len(list_filter($tokensSql,
         |        t -> list_contains(['the','and','of','to','in','is','that','for','with','a'], t))))
         |      // greatest(len($tokensSql), 1))::BIGINT AS score_milli
         |  FROM documents)
         |SELECT doc_id, source, score_milli,
         |  round(CUME_DIST() OVER (PARTITION BY source ORDER BY score_milli), 6) AS cume_dist,
         |  round(CUME_DIST() OVER (PARTITION BY source ORDER BY score_milli), 6) >= 0.8 AS selected
         |FROM s ORDER BY doc_id""".stripMargin,

    // q119: three CUME_DIST windows (tie-insensitive ≡ the engine's
    // aggregate+broadcast form), mean of quantiles in the same
    // left-to-right order, top-100 on the (score DESC, doc_id) total
    // order.
    "q119_ensemble_quality" ->
      s"""WITH s AS (
         |  SELECT doc_id, len($tokensSql)::BIGINT AS n_tokens,
         |    ((1000 * len(list_filter($tokensSql,
         |        t -> list_contains(['the','and','of','to','in','is','that','for','with','a'], t))))
         |      // greatest(len($tokensSql), 1))::BIGINT AS stop_milli,
         |    ((1000 * len(list_distinct($tokensSql)))
         |      // greatest(len($tokensSql), 1))::BIGINT AS ttr_milli
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, n_tokens, stop_milli, ttr_milli,
         |    round(CUME_DIST() OVER (ORDER BY n_tokens), 6) AS q_n_tokens,
         |    round(CUME_DIST() OVER (ORDER BY stop_milli), 6) AS q_stop_milli,
         |    round(CUME_DIST() OVER (ORDER BY ttr_milli), 6) AS q_ttr_milli
         |  FROM s)
         |SELECT doc_id, n_tokens, stop_milli, ttr_milli,
         |  q_n_tokens, q_stop_milli, q_ttr_milli,
         |  round((q_n_tokens + q_stop_milli + q_ttr_milli) / 3, 6) AS ensemble_score
         |FROM q ORDER BY ensemble_score DESC, doc_id LIMIT 100""".stripMargin,
    // q150: the closed-form default scorer replayed in SQL — same
    // IEEE double op order as Scorer.Default.score, keep on the RAW
    // score (bit-identical across engines), rounding for display only.
    "q150_model_quality_gate" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
        |         ELSE (2.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |                 / length(text)
        |               + least(length(text), 2000) / 2000.0) / 3.0 END AS score
        |  FROM documents)
        |SELECT doc_id, round(score, 6) AS score, score >= 0.596 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    // q152: q150's closed-form gate → q36's exact-dedup window →
    // q44's stable-md5 balanced take, replayed stage for stage.
    "q152_scored_corpus" ->
      """WITH s AS (
        |  SELECT doc_id, lang, text,
        |    CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
        |         ELSE (2.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |                 / length(text)
        |               + least(length(text), 2000) / 2000.0) / 3.0 END AS score
        |  FROM documents),
        |kept AS (SELECT * FROM s WHERE score >= 0.596),
        |dedup AS (
        |  SELECT doc_id, lang, score,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dn
        |  FROM kept),
        |r AS (
        |  SELECT doc_id, lang, score,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT,
        |        doc_id) AS rn
        |  FROM dedup WHERE dn = 1)
        |SELECT doc_id, lang, round(score, 6) AS score
        |FROM r WHERE rn <= 25 ORDER BY doc_id""".stripMargin
  )
}
