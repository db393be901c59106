package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOfJoin, Bpe, Contrastive, Curation, Dedup, Graph, Multimodal, Relevance, Selection, Sharding, Similarity, Sketches, Stats, TextOps}

/** Training-data pipeline operators as oracle-checkable queries:
  * dedup family (exact / MinHash+LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search, text analysis and multimodal
  * plumbing over the `documents` and `embeddings` tables.
  *
  * Portability conventions (DuckDB must reproduce the values): hashes
  * are md5/sha256 over explicit strings (SimHash token bits and SRP
  * plane components come from md5 hex prefixes, so DuckDB recomputes
  * them with `('0x' || substr(md5(s), 1, n))::UBIGINT`); floating point
  * goes through double with sequential aggregation and round(…, 6);
  * every result is ordered on a unique key. Integer aggregates in
  * oracle SQL must be cast `::BIGINT`: DuckDB widens SUM over BIGINT
  * (window sums included) to HUGEINT, and the driver's type-sensitive
  * result hash tolerates INTEGER-vs-BIGINT but NOT the int128 boundary
  * (the q38 lesson).
  */
object TrainingData {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Planted CJK documents for q47 — the regression fixture for the
    * CJK-aware tokenizer: a whitespace-only tokenizer sees each of these
    * as word_count ≈ 1 and `gopherMetrics.keep` silently discards whole
    * languages. Ids sit far above the parquet id range.
    *  - 1000001/1000002: Chinese near-dup pair (Thousand Character
    *    Classic opening — 40 DISTINCT Han chars; 1000002 appends one
    *    char, so trigram Jaccard = 38/39 ≈ 0.974);
    *  - 1000003: Japanese (iroha — all-distinct hiragana);
    *  - 1000004: Thai consonants (no word delimiters in Thai script);
    *  - 1000005: mixed Latin + Han tokenization;
    *  - 1000006: Korean (space-delimited Hangul — tokenizes by word,
    *    identifies by script). */
  /** Planted cross-source mirror documents for q121 — the synthetic
    * corpus has natural exact cross-source duplicates only at sf0.1,
    * so the dup matrix plants a known overlap pattern at every SF:
    * "mirror one" lives in mirror_a/b/c, "mirror two" in mirror_a/b,
    * and one unique text anchors mirror_c. Sources sit outside the
    * parquet source names (src0..src19). Expected planted pairs:
    * (a,b)=2 shared texts, (a,c)=1, (b,c)=1. */
  private val MirrorDocs: Seq[(String, String)] = Seq(
    "mirror_a" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_b" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_c" -> "planted mirror text one crawled from several feeds verbatim",
    "mirror_a" -> "planted mirror text two syndicated article body here",
    "mirror_b" -> "planted mirror text two syndicated article body here",
    "mirror_c" -> "a unique anchor document only mirror c carries")
  private def mirrorValuesSql: String =
    MirrorDocs.map { case (src, tx) => s"('$src', '$tx')" }.mkString(", ")

  /** [[graft.ops.ImageHash.fixtureGray]]'s un-perturbed pixel value as
    * DuckDB SQL over generate_series aliases x.x / y.y — one definition
    * shared by the q130/q131 oracles so the arithmetic cannot drift
    * from itself. */
  private def fixtureGraySql(id: String): String =
    s"(($id % 97 + 1)*x.x*x.x + ($id % 89 + 2)*y.y*y.y + ($id % 83 + 3)*x.x*y.y" +
      s" + (($id // 97) % 101)*x.x + (($id // 89) % 103)*y.y) % 256"

  private val CjkIdBase = 1000000L
  private val CjkDocs: Seq[(Long, String)] = Seq(
    1000001L -> "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往秋收冬藏闰余成岁律吕调阳云腾致雨露结为霜",
    1000002L -> "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往秋收冬藏闰余成岁律吕调阳云腾致雨露结为霜金",
    1000003L -> "いろはにほへとちりぬるをわかよたれそつねならむ",
    1000004L -> "กขคงจฉชซญดตถทธนบปผฝพฟภมยรลวสหอ",
    1000005L -> "mixed script doc 机器学习 data 模型",
    1000006L -> "한국어 텍스트 처리 시스템 테스트 문서 예제 데이터")
  private def cjkValuesSql: String =
    CjkDocs.map { case (id, text) => s"($id::BIGINT, '$text')" }.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Text quality scoring: length/punct/stopword heuristics.
    "q19_text_quality" -> ((s, d) => {
      val m = TextOps.qualityMetrics(col("text"), TextOps.DefaultProfiles.head._2)
      t(s, d, "documents")
        .select(col("doc_id"), m.getField("n_chars").as("n_chars"),
          m.getField("n_tokens").as("n_tokens"),
          m.getField("punct_ratio").as("punct_ratio"),
          m.getField("stopword_ratio").as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Language ID by stopword-profile scoring.
    "q20_langid" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.languageId(col("text")).as("lang_id"))
        .groupBy(col("lang_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_id"))
    }),

    // Canonical fingerprint + order-sensitive rolling hash.
    "q21_fingerprint" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // Exact n-gram Jaccard near-dups over shared-shingle candidates.
    // maxShingleFreq = 1000 bounds the hot-shingle pair blow-up at
    // scale (f² rows per shingle shared by f docs); the oracle mirrors
    // the cap (HAVING COUNT(*) <= 1000 on the shingle block), so parity
    // is cap-exact at ANY SF — not just while no trigram's
    // doc-frequency exceeds the cap (max observed at sf0.1 is 25).
    "q22_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardBlocked(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8, shingleSize = 3, maxShingleFreq = 1000)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash+LSH candidate pairs (16 hashes, 4 bands of 4).
    "q23_minhash_lsh" -> ((s, d) => {
      Dedup.lshCandidatePairs(t(s, d, "documents"), "doc_id", "text",
          k = 16, bands = 4, shingleSize = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash near-dups (md5-derived token bits → oracle-checkable;
    // the 4×16-bit block join is exact-recall at maxDistance 3 by
    // pigeonhole, so the oracle's all-pairs form agrees).
    "q24_simhash" -> ((s, d) => {
      Dedup.simhashNearDuplicates(t(s, d, "documents"), "doc_id", "text",
          maxDistance = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Brute-force exact cosine top-3 for a 5-vector probe set.
    "q25_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs via multi-table SRP LSH;
    // md5-derived planes keep the bucketing oracle-reproducible.
    // 6 tables × 3 planes = full recall on this corpus. The 64-dim
    // embeddings take the COMPACT path (vectors ride the one bucket
    // shuffle, in-group cosine kernel — two exchanges); the ids-only
    // nearDuplicates form is the high-dim default (SimilaritySpec
    // pins the two forms equal).
    "q26_embed_neardup" -> ((s, d) => {
      Similarity.nearDuplicatesCompact(t(s, d, "embeddings"), threshold = 0.45,
          planes = 3, tables = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed ANN (SRP buckets from md5-derived planes → oracle-
    // checkable); 2 hash tables double the candidate recall.
    "q27_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 50), emb, k = 3, planes = 4,
          tables = 2)
        .orderBy(col("probe_id"), col("rank"))
    }),

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
      t(s, d, "documents").select(col("doc_id"),
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

    // IVF ANN: 8 seed centroids (deterministic: lowest vec_ids stand in
    // for a trained codebook — the operator takes ANY centroid frame),
    // probes visit their 2 nearest inverted lists, exact cosine ranks.
    "q35_ivf_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfSearch(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbe = 2)
        .orderBy(col("probe_id"), col("rank"))
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

    // Exact dedup on NORMALIZED text (lowercase, punctuation stripped,
    // whitespace collapsed) — what real near-exact dedup hashes.
    "q45_normalized_dedup" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), Curation.normalizeText(col("text")).as("norm"))
        .groupBy(md5(col("norm")).as("norm_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // Symmetric int8 embedding quantization (4× storage at ~1% cosine
    // error): per-vector scale + floor codes, summarized per vector.
    "q42_quantize" -> ((s, d) => {
      val q = Similarity.quantize(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"), q.as("q"))
        .select(col("vec_id"),
          round(col("q.scale").cast("double"), 6).as("scale"),
          aggregate(col("q.codes"), lit(0L), (acc, c) => acc + c.cast("long")).as("qsum"),
          array_min(col("q.codes")).cast("long").as("qmin"),
          array_max(col("q.codes")).cast("long").as("qmax"))
        .orderBy(col("vec_id"))
    }),

    // Corpus-level boilerplate scoring: shingles in ≥5 distinct docs
    // are template junk; docs are scored by their boilerplate fraction.
    "q41_boilerplate" -> ((s, d) => {
      Curation.boilerplateMetrics(t(s, d, "documents"), "doc_id", "text",
          shingleSize = 3, minDocFreq = 5, threshold = 0.2)
        .orderBy(col("doc_id"))
    }),

    // Near-dup cluster resolution: q23's LSH candidate pairs closed
    // into connected components (iterative min-label propagation) —
    // the step that turns pair DETECTION into an actually deduplicated
    // corpus: one survivor (`keep`) per transitive near-dup cluster.
    "q39_dedup_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      Dedup.resolveClusters(docs.select(col("doc_id")), "doc_id", pairs)
        .orderBy(col("doc_id"))
    }),

    // The flagship dedup operator end-to-end: MinHash+LSH candidates →
    // exact-Jaccard verification → connected-components closure → ONE
    // survivor per cluster; output is the deduplicated corpus itself
    // (what a pipeline actually keeps).
    "q50_deduplicate" -> ((s, d) => {
      Dedup.deduplicate(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8, k = 16, bands = 4, shingleSize = 3)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Script-aware language ID over the mixed corpus: CJK documents
    // identify by character-script evidence (stopword profiles need
    // word boundaries and score CJK "und"); Latin text falls back to
    // the q20 profiles — their counts must be unchanged.
    "q49_script_langid" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(CjkDocs.toDF("doc_id", "text"))
      corpus
        .select(col("doc_id"), TextOps.languageIdScripted(col("text")).as("lang_id"))
        .groupBy(col("lang_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_id"))
    }),

    // Quantized IVF ANN: q35's index shape, but candidates ride the
    // join as int8 codes and scoring is the exact integer kernel —
    // per-vector scales cancel in cosine, so the search path never
    // touches float32 (4× less data at the 100 TB target).
    "q48_ivf_quantized" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfSearchQuantized(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbe = 2)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // CJK curation end-to-end: the ASCII corpus + planted CJK docs run
    // the quality gate and near-dup detection TOGETHER — the planted
    // docs must survive gopher filtering (character tokens, not
    // word_count ≈ 1) and the Chinese near-dup pair must be found by
    // trigram Jaccard over character shingles. Output: one row per
    // planted doc with its word_count and its detected partner (-1 =
    // none).
    "q47_cjk_curation" -> ((s, d) => {
      import s.implicits._
      val planted = CjkDocs.toDF("doc_id", "text")
      val corpus = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(planted)
      val m = Curation.gopherMetrics(col("text"))
      val quality = corpus
        .withColumn("word_count", m.getField("word_count"))
        .filter(m.getField("keep"))
      val pairs = Dedup.ngramJaccardBlocked(quality, "doc_id", "text",
        threshold = 0.8, shingleSize = 3, maxShingleFreq = 1000)
      val partners = pairs
        .select(col("id_a").as("doc_id"), col("id_b").as("partner_id"), col("jaccard"))
        .unionByName(pairs
          .select(col("id_b").as("doc_id"), col("id_a").as("partner_id"), col("jaccard")))
      quality.filter(col("doc_id") >= CjkIdBase)
        .join(partners, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("word_count"),
          coalesce(col("partner_id"), lit(-1L)).as("partner_id"),
          coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
        .orderBy(col("doc_id"))
    }),

    // Top-3 TF-IDF terms per document (smoothed idf, ranked on the
    // ROUNDED score so cross-engine ln ulp noise cannot flip order).
    "q51_tfidf" -> ((s, d) => {
      Relevance.tfIdf(t(s, d, "documents"), "doc_id", "text", topK = 3)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // BM25 retrieval: top-20 documents for a fixed 3-term query; the
    // cross-term sum pivots into fixed columns (float-order-safe).
    "q52_bm25" -> ((s, d) => {
      Relevance.bm25(t(s, d, "documents"), "doc_id", "text",
          Seq("spark", "join", "window"), topK = 20)
        .orderBy(col("rank"))
    }),

    // Paragraph-level exact dedup (CCNet-style): the corpus gets
    // deterministic paragraph boundaries (every 3 tokens — the
    // newline-free synthetic corpus needs synthesized structure; real
    // corpora pass the default \n split), then cross-doc repeated
    // paragraphs are dropped from every document.
    "q53_paragraph_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("ptext",
          regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n"))
      Dedup.paragraphDedup(docs, "doc_id", "ptext",
          splitPattern = "\n", minDocFreq = 2)
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("text_clean")).as("clean_hash"))
        .orderBy(col("doc_id"))
    }),

    // Cluster-balanced sampling (SemDeDup-style diverse subset):
    // IVF-assign to the 8 lowest-id seed centroids, then exactly 10
    // vectors per cluster by the stable md5-of-id order.
    "q54_cluster_sample" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.clusterBalancedSample(emb,
          emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          perCluster = 10)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }),

    // Product-quantization encoding: 64-dim float32 → 8 codes (one per
    // 8-dim subspace, argmin over the 4 lowest-id seed subvectors) —
    // 32× storage compression; one (vec, sub, code) row per code.
    "q55_pq_encode" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val book = Similarity.pqSeedCodebook(emb, m = 8, k = 4)
      // posexplode_outer: codes is a fixed-length literal array (never
      // empty), and the outer variant skips the size>0 Filter that
      // plain posexplode plans — which would re-evaluate all 8 argmin
      // kernels per row a second time
      Similarity.pqEncode(emb, book, m = 8)
        .select(col("vec_id"), posexplode_outer(col("codes")).as(Seq("sub", "code")))
        .select(col("vec_id"), col("sub").cast("long").as("sub"),
          col("code").cast("long").as("code"))
        .orderBy(col("vec_id"), col("sub"))
    }),

    // PQ ADC search: probes precompute per-subspace lookup tables and
    // every corpus vector scores from its 8 codes alone — the float-free
    // scan path over q55's codes.
    "q56_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val book = Similarity.pqSeedCodebook(emb, m = 8, k = 4)
      val codes = Similarity.pqEncode(emb, book, m = 8)
      Similarity.pqSearchADC(emb.filter(col("vec_id") < 10), codes, book,
          k = 3, m = 8)
        .orderBy(col("probe_id"), col("rank"))
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

    // Semantic dedup (SemDeDup): coarse IVF clusters scope the cosine
    // near-dup search; components collapse to one min-id survivor.
    "q59_semantic_dedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.semanticDedup(emb,
          emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          threshold = 0.4, maxClusterSize = 2000)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // Gap-based sessionization: per-user sessions split on >30-min
    // silences; per-session event counts and integer-exact durations.
    "q61_sessionize" -> ((s, d) => {
      AsOfJoin.sessionize(t(s, d, "events"), "user_id", "ts",
          gapMillis = 30L * 60L * 1000L)
        .groupBy(col("user_id"), col("session_ix"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          // `div`, not `/` — the Tables.load ns lesson (long `/` is
          // double division)
          expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 1000")
            .as("duration_ms"))
        .orderBy(col("user_id"), col("session_ix"))
    }),

    // End-to-end corpus prep — the round's operators composed the way a
    // pipeline runs them: paragraph-dedup the (3-token-paragraph)
    // corpus, quality-gate the CLEANED text, weighted-sample 100 docs
    // by kept-paragraph count, assign contiguous training indices.
    "q65_corpus_prep" -> ((s, d) => {
      val docs = t(s, d, "documents")
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

    // KMV distinct-count sketch over part keys: md5-derived hashes make
    // the ESTIMATE itself oracle-checkable (engine HLLs are not).
    "q62_kmv_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Sketches.kmvDistinct(li, "l_partkey", k = 64)
        .crossJoin(broadcast(li.agg(
          countDistinct(col("l_partkey")).as("true_distinct"))))
    }),

    // Deterministic weighted sampling (Efraimidis-Spirakis keys from
    // md5 uniforms): 25 documents, length-weighted.
    "q63_weighted_sample" -> ((s, d) => {
      Sketches.weightedSample(t(s, d, "documents"), "doc_id", "n_chars", n = 25)
        .select(col("doc_id"), col("sample_key"))
        .orderBy(col("doc_id"))
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

    // IVF-PQ: coarse inverted lists + PQ codes over float RESIDUALS
    // (FAISS IndexIVFPQ layout); search is per-list L2² ADC over the
    // stored codes, ranked ascending.
    "q60_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val coarse = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      // seed the residual book OUTSIDE the coarse set: vecs 0-7 are the
      // coarse centroids, so their residuals are zero vectors — a book
      // seeded from them scores everything 0 and discriminates nothing
      val resBook = Similarity.pqSeedCodebook(
        Similarity.coarseResiduals(emb, coarse).filter(col("vec_id") >= 8),
        m = 8, k = 4)
      val encoded = Similarity.ivfPqEncode(emb, coarse, resBook, m = 8)
      Similarity.ivfPqSearch(emb.filter(col("vec_id") < 10), encoded, coarse,
          resBook, k = 3, nProbe = 2, m = 8)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Bloom-filter decontamination: q32's benchmark membership replayed
    // through a 16384-bit md5-derived bloom — the candidate side never
    // joins; deterministic false positives are part of the contract.
    "q57_bloom_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Curation.decontaminateBloom(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", shingleSize = 3, threshold = 0.5,
          nBits = 1 << 14, nHashes = 3)
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

    // Temperature-scaled language mixture (alpha = 0.5 up-weights rare
    // languages): per-domain rates broadcast onto the corpus — zero
    // corpus shuffles; the realized sample is md5-deterministic.
    "q68_mixture_sample" -> ((s, d) => {
      Curation.mixtureSample(t(s, d, "documents"), "lang", "doc_id",
          alpha = 0.5, targetRows = 200)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("lang"))
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
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      Contrastive.contrastivePairs(docs, "doc_id", pairs)
        .orderBy(col("anchor"), col("positive"))
    }),

    // Leakage-safe split: q23's near-dup pairs resolve to clusters and
    // each CLUSTER (not doc) draws its train/val/test assignment — a
    // near-twin can never sit across train and test.
    "q71_leakage_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
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

    // Frequency-vocabulary construction: token counts -> top-32 by
    // (count desc, token) -> dense ids. The rank window touches only
    // the 32 survivors of a TakeOrdered (the bm25 k-bounded pattern).
    "q73_vocab_build" -> ((s, d) => {
      val counts = t(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val top = counts.orderBy(col("cnt").desc, col("token")).limit(32)
      // 32 survivors collapse to one sorted array; id = position (long
      // counts negate safely — no unpartitioned window)
      top.agg(sort_array(collect_list(struct((-col("cnt")).as("nc"),
          col("token").as("t"), col("cnt").as("c")))).as("__v"))
        .select(posexplode(col("__v")).as(Seq("__i", "__r")))
        .select(col("__i").cast("long").as("token_id"),
          col("__r.t").as("token"), col("__r.c").as("cnt"))
        .orderBy(col("token_id"))
    }),

    // DSIR importance weights: hashed-unigram log-likelihood ratio of
    // every doc under the English-slice target distribution vs the full
    // corpus — the distribution-reshaping selection signal.
    "q82_dsir_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
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
      val docs = t(s, d, "documents")
      Dedup.crossContamination(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0), "doc_id", "text",
          k = 16, bands = 4, shingleSize = 3)
        .orderBy(col("doc_id"))
    }),

    // Snake-order balanced sharding: size-ranked docs deal into 8
    // shards in alternating direction — near-equal token totals per
    // shard, rank from the range-partitioned two-pass zip.
    "q85_snake_shards" -> ((s, d) => {
      Selection.snakeShards(t(s, d, "documents"), "doc_id", "text", nShards = 8)
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

    // BPE merge induction: 8 merges learned from the corpus — one
    // corpus pass for word counts, then vocab-sized sentinel-replace
    // rounds with a 1-row argmax each. The merge table IS the output
    // (the artifact a subword tokenizer ships).
    "q87_bpe_merges" -> ((s, d) => {
      Bpe.trainBpe(t(s, d, "documents"), "text", merges = 8, minPairCount = 2)
        .orderBy(col("rank"))
    }),

    // Per-cluster embedding centroids via the native micro-unit vector
    // sum (buffer = dims+1 longs per group, no ×dims posexplode) —
    // the k-means M-step / cluster-diagnostics primitive. Exploded to
    // (cluster, dim) rows for the oracle compare.
    "q86_cluster_centroids" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val coarse = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      Similarity.clusterCentroids(Similarity.ivfAssign(emb, coarse),
          "cluster", "embedding")
        .select(col("cluster"), col("n_vecs"),
          posexplode_outer(col("centroid")).as(Seq("dim", "c")))
        .select(col("cluster"), col("n_vecs"), col("dim").cast("long").as("dim"),
          col("c"))
        .orderBy(col("cluster"), col("dim"))
    }),

    // PageRank centrality over the near-dup graph (exact pico-unit
    // arithmetic, 4 rounds): central docs are their neighborhoods'
    // representatives — a data-selection signal.
    "q78_pagerank" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
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
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      Graph.pageRank(docs.select(col("doc_id")),
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
          iterations = 4, redistributeDangling = true)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Duplicated-substring coverage (Lee et al. ExactSubstr at
    // 5-token-window grain): per doc, how much of it is a span that
    // also appears verbatim in ≥2 distinct documents — the
    // partial-copy signal whole-doc MinHash and paragraph-grain
    // md5 both miss. Interval-union semantics: overlapping hot
    // windows never double-count a token.
    "q80_dup_spans" -> ((s, d) => {
      Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text",
          windowTokens = 5, minDocFreq = 2)
        .orderBy(col("doc_id"))
    }),

    // The q80 signal turned into Lee et al.'s actual intervention:
    // delete every token covered by a cross-doc-hot 5-token window,
    // reassemble survivors in order (tokenizer-normalized re-join).
    "q81_remove_dup_spans" -> ((s, d) => {
      Dedup.removeDuplicateSpans(t(s, d, "documents"), "doc_id", "text",
          windowTokens = 5, minDocFreq = 2)
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

    // CCNet-style LM quality score: add-0.5-smoothed bigram model
    // trained on the src0-excluded corpus scores every document —
    // the "perplexity filter" with an honest self-trained model.
    "q75_lm_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Relevance.bigramLmScore(docs, docs.filter(col("source") =!= "src0"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
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

    // LSH parameter audit: measured precision/recall of 2/4/8-band
    // MinHash candidates against exact-Jaccard ≥ 0.8 ground truth —
    // the band config for the 100 TB dedup run, chosen on data.
    "q91_lsh_audit" -> ((s, d) => {
      Dedup.lshAudit(t(s, d, "documents"), "doc_id", "text",
          k = 16, bandConfigs = Seq(2, 4, 8), shingleSize = 3,
          threshold = 0.8, maxShingleFreq = 1000)
        .orderBy(col("bands"))
    }),

    // BPE APPLY cross-check: train the q87 merge table, then segment
    // the corpus with the INDEPENDENT applier (subwordTokens' rank-
    // order cascade) — the oracle replays training and unnests the
    // final vocab state, so applier ≡ trainer is verified under the
    // hash compare, token for token, count for count.
    "q92_bpe_vocab" -> ((s, d) => {
      // ONE corpus pass end-to-end: train and apply share the word-
      // count frame, and the applier segments word TYPES (cnt-weighted),
      // not occurrences — the at-scale tokenizer shape. localCheckpoint,
      // not persist: a query builder has no post-execution unpersist
      // hook, and checkpoint blocks are ContextCleaner-released once
      // the frame is unreachable (a persist would live in CacheManager
      // for the session). The frame is vocabulary-sized either way.
      val wc = Bpe.wordCounts(t(s, d, "documents"), "text")
        .localCheckpoint(true)
      val merges = Bpe.trainBpeFromCounts(wc, merges = 8, minPairCount = 2)
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
      Bpe.tokenCounts(wc, merges).orderBy(col("token"))
    }),

    // Blocked inverted index: per (term, 1024-id block), the
    // delta-encoded posting list — bounded groups regardless of term
    // frequency (the stopword-posting skew killer). The REGISTERED
    // query serializes the gap array to a comma string (the q96 id-
    // sequence discipline — the driver's comparator hashes scalar
    // cells); Relevance.invertedIndex stays array-valued for library
    // users.
    "q93_inverted_index" -> ((s, d) => {
      Relevance.invertedIndex(t(s, d, "documents"), "doc_id", "text",
          blockBits = 10, minDf = 100L)
        .withColumn("gaps", concat_ws(",", col("gaps").cast("array<string>")))
        .orderBy(col("term"), col("block"))
    }),

    // ANN recall audit: measured recall@3 of IVF search at nProbe
    // 1/2/4/8 against exact brute force — q91's counterpart for the
    // embedding side; nProbe=8 probes every list, recall must be 1.
    "q94_ann_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.annRecallAudit(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbeConfigs = Seq(1, 2, 4, 8))
        .orderBy(col("n_probe"))
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

    // The training-ready artifact: per-document BPE token-ID sequences
    // — train, build the frequency-ranked vocab, segment each doc with
    // the independent applier, map tokens to ids, and hash the ordered
    // id sequence. End-to-end: the corpus a trainer would actually
    // consume, oracle-checked id for id (via the sequence hash).
    "q96_bpe_doc_ids" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // localCheckpoint for the same reason as q92: no session-lifetime
      // CacheManager entry from inside a lazy query builder
      val wc = Bpe.wordCounts(docs, "text")
        .localCheckpoint(true)
      val merges = Bpe.trainBpeFromCounts(wc, merges = 8, minPairCount = 2)
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
      val ids = Bpe.vocabIds(Bpe.tokenCounts(wc, merges))
        .select(col("token_id"), col("token"))
      val perDoc = docs
        .select(col("doc_id"),
          posexplode(Bpe.subwordTokens(col("text"), merges))
            .as(Seq("ix", "token")))
        .join(ids, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(struct(col("ix"), col("token_id")))),
            p => p.getField("token_id").cast("string")))).as("ids_hash"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("ids_hash"))
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

    // Elias-γ storage accounting over the blocked inverted index: per
    // term, exact compressed posting bits vs the 64-bit-id baseline —
    // the "will the index fit" planning number, all-integer folds over
    // the packed gap arrays (no explode, no float discipline).
    "q102_posting_bits" -> ((s, d) => {
      Relevance.postingSizeStats(t(s, d, "documents"), "doc_id", "text",
          blockBits = 10, minDf = 100L)
        .orderBy(col("term"))
    }),

    // Asymmetric shingle containment (Broder): subset-duplication
    // pairs Jaccard can't see — either direction's |A∩B|/|A| over the
    // shared-shingle blocked pairs.
    "q103_containment" -> ((s, d) => {
      Dedup.containmentPairsBlocked(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
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

    // Codebook seeding A/B under the recall audit: lowest-id seeds vs
    // deterministic farthest-first (Gonzalez) at the same nProbe —
    // the seeding-quality question answered with a measured recall
    // column instead of folklore. Truth is seed-independent (brute
    // force), shared across both audits.
    "q105_ann_seeding" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val probes = emb.filter(col("vec_id") < 20)
      val naive = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      // sampled greedy (kmeans‖ shape): one sample job, constant in k
      val far = Similarity.seedCodebookFarthest(emb, k = 8, sampleSize = 256)
      // fused multi-codebook audit: one corpus pass, one join, one
      // window — not two stacked audits; truth rides INSIDE the same
      // action (two references — cheaper recomputed in-action than a
      // dedicated checkpoint job at this probe count)
      val truth = Similarity.bruteForceTopK(probes, emb, k = 3)
        .select(col("probe_id"), col("neighbor_id"))
      Similarity.annRecallAuditMulti(probes, emb,
          Seq("naive" -> naive, "farthest" -> far), k = 3, Seq(1, 2),
          truthOverride = Some(truth))
        .orderBy(col("seeding"), col("n_probe"))
    }),

    // Deep-vocabulary BPE apply: a 1024-merge table through the native
    // rank-table kernel — the nested-replace cascade is
    // unrepresentable at this depth; the oracle replays the table as
    // a literal 1024-replace chain (rule-built table, so the chain IS
    // the cascade). Corpus token counts segment the VOCABULARY, each
    // type weighted by its count (q92's shape).
    "q106_bpe_deep" -> ((s, d) => {
      val wc = Bpe.wordCounts(t(s, d, "documents"), "text")
      Bpe.tokenCounts(wc, Bpe.syntheticMerges(1024))
        .orderBy(col("token"))
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

    // Vocabulary coverage curve: corpus-token share of the top-N types
    // at N = 100 / 1000 / 10000 — bounded TakeOrdered cutoffs, no
    // corpus-wide rank window.
    "q109_vocab_coverage" -> ((s, d) => {
      Relevance.vocabCoverage(t(s, d, "documents"), "text",
          sizes = Seq(100, 1000, 10000))
        .orderBy(col("vocab_size"))
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

    // Edit-distance verification of LSH candidates: byte-level
    // Levenshtein similarity on the q23 band-bucket pairs — the
    // order-SENSITIVE verifier (a sentence-shuffled copy passes
    // Jaccard, fails this). Cost is bounded twice: pairs by LSH
    // banding, per-pair DP by the maxChars cap.
    "q111_edit_verify" -> ((s, d) => {
      Dedup.editVerifiedPairs(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Winnowing (MOSS) fingerprint overlap: window-min-selected shingle
    // hashes — a 4×-smaller index than full shingles that still
    // guarantees any ≥ w+n−1-token clone shares a fingerprint.
    "q112_winnowing" -> ((s, d) => {
      Dedup.winnowingOverlapPairs(t(s, d, "documents"), "doc_id", "text",
          n = 3, w = 4, minShared = 2L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Per-source calibrated quality: CUME_DIST of an integer stopword
    // score WITHOUT a corpus window — (source, score) aggregation +
    // broadcast join back; "top 20% of each source" selection.
    "q113_calibrated_quality" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val stop = array(TextOps.DefaultProfiles.head._2.map(lit): _*)
      val scored = t(s, d, "documents").select(col("doc_id"), col("source"),
        (lit(1000) * size(filter(toks, tk => array_contains(stop, tk))) /
          greatest(size(toks), lit(1))).cast("long").as("score_milli"))
      Stats.groupedCumeDist(scored, "source", "score_milli")
        .withColumn("selected", col("cume_dist") >= 0.8)
        .select(col("doc_id"), col("source"), col("score_milli"),
          col("cume_dist"), col("selected"))
        .orderBy(col("doc_id"))
    }),

    // Lloyd k-means convergence audit: 3 rounds from the 8 lowest-id
    // seeds — per-round exact micro-unit inertia (must fall),
    // reassignment count (must dwindle), live clusters. The "is the
    // codebook done?" table, every number oracle-replayed.
    "q114_kmeans_audit" -> ((s, d) => {
      Similarity.kmeansAudit(t(s, d, "embeddings"), k = 8, rounds = 3)
        .orderBy(col("round"))
    }),

    // URL-level dedup: canonicalization (scheme/host case, default
    // port, www, fragment, trailing slash, tracking params, param
    // order) collapses crawl-variant URLs into dup groups. The
    // documents table has no URL column, so both engines BUILD the
    // same messy synthetic URL from doc_id — the canonicalizer, not
    // the data, is what the oracle checks.
    "q115_url_dedup" -> ((s, d) => {
      val id = col("doc_id")
      val url = concat(
        lit("HTTP://"),
        when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
        lit("Example-"), (id % 7).cast("string"), lit(".COM"),
        when(id % 2 === 0, lit(":80")).otherwise(lit("")),
        lit("/path/"), (id % 50).cast("string"),
        when(id % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&b="), (id % 5).cast("string"), lit("&a=1"),
        when(id % 6 === 0, lit("&fbclid=xyz")).otherwise(lit("")),
        lit("#frag"))
      val canon = t(s, d, "documents")
        .select(id, TextOps.canonicalUrl(url).as("canonical_url"))
      val groups = canon.groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("rep_id"))
      canon.join(groups, Seq("canonical_url"))
        .select(col("doc_id"), col("canonical_url"), col("n_dups"),
          (col("doc_id") === col("rep_id")).as("is_rep"))
        .orderBy(col("doc_id"))
    }),

    // Source-balance audit: Lorenz curve + Gini + entropy of the
    // per-source token mass — the "is the mixture dominated?" table.
    "q116_source_balance" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("w"))
      Stats.balanceAudit(docs, "source", "w").orderBy(col("rank"))
    }),

    // Incremental dedup against the PUBLISHED MinHash index: batch =
    // doc_id % 5 == 0, corpus = the rest; the old corpus is
    // represented only by its (band, bucket, sig) index rows —
    // verification is signature-estimated Jaccard, no old text read.
    "q117_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val index = Dedup.minhashBandIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 5 === 0), index,
          "doc_id", "text", threshold = 0.5)
        .orderBy(col("new_id"))
    }),

    // q117 through the SPLIT index layout: skinny (doc_id, band,
    // bucket) rows + one signature row per doc, signatures joined only
    // for candidates — verdict-identical to q117 by construction
    // (IndexProbe measured the combined layout's screens dominated by
    // the bands x-duplicated signature decode; this is the production
    // artifact shape, sources/SplitBandIndexStore).
    "q129_split_index_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // one signature pass feeds both split frames (the store's shape)
      val sigs = Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", 16)
        .select(col("id").as("doc_id"), col("sig"))
        .localCheckpoint(false)
      Dedup.dedupAgainstIndexSplit(docs.filter(col("doc_id") % 5 === 0),
          Dedup.bandRowsFromSigs(sigs, 4, 4), sigs,
          "doc_id", "text", threshold = 0.5)
        .orderBy(col("new_id"))
    }),

    // Perceptual image hashing over REAL pixel decode: deterministic
    // 9x8 grayscale PNG fixtures (every pixel integer arithmetic in
    // (doc_id, x, y) — the q28 pattern for binary columns), encoded,
    // ImageIO-decoded, dHashed, and emitted as the 4 16-bit blocks the
    // Hamming-ball blocking uses. The oracle replays PNG encode →
    // decode → raster → bit packing from arithmetic alone — the whole
    // real pipeline is pinned bit-for-bit.
    "q130_image_dhash" -> ((s, d) => {
      val media = t(s, d, "documents").select(col("doc_id").as("media_id"),
        graft.ops.ImageHash.fixturePngUdf(col("doc_id"), lit(false)).as("bytes"))
      graft.ops.ImageHash.dhashFrame(media)
        .select(col("media_id"),
          col("dhash").bitwiseAND(lit(0xFFFFL)).as("b0"),
          shiftright(col("dhash"), 16).bitwiseAND(lit(0xFFFFL)).as("b1"),
          shiftright(col("dhash"), 32).bitwiseAND(lit(0xFFFFL)).as("b2"),
          shiftright(col("dhash"), 48).bitwiseAND(lit(0xFFFFL)).as("b3"))
        .orderBy(col("media_id"))
    }),

    // Perceptual image NEAR-DUP pairs: every 17th document gets a
    // lightly-edited copy (one perturbed pixel → ≤ 2 dHash bits), the
    // corpus is screened with the 16-bit-block Hamming-ball machinery
    // (exact for distance ≤ 3 by pigeonhole — shared with SimHash,
    // ops/Dedup.hammingNearDupPairs), pairs verified in-bucket. The
    // oracle blocks and verifies the same way from the arithmetic
    // fixture; at both SFs the measured accidental-pair count between
    // distinct base images is zero, so the result is exactly the
    // planted copies with their true bit distances.
    "q131_image_neardup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val base = docs.select(col("doc_id").as("media_id"),
        graft.ops.ImageHash.fixturePngUdf(col("doc_id"), lit(false)).as("bytes"))
      val variants = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + lit(1000000000L)).as("media_id"),
          graft.ops.ImageHash.fixturePngUdf(col("doc_id"), lit(true)).as("bytes"))
      graft.ops.ImageHash.nearDuplicates(base.unionByName(variants))
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Tokenizer fertility per source: bytes-per-subword and
    // subwords-per-word of a 256-merge table, computed over word
    // TYPES (Zipf: types ≪ tokens), one corpus explode.
    "q118_fertility" -> ((s, d) => {
      Bpe.fertilityAudit(t(s, d, "documents"), "source", "text",
          Bpe.syntheticMerges(256))
        .orderBy(col("source"))
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
        (lit(1000) * size(filter(toks, tk => array_contains(stop, tk))) /
          greatest(size(toks), lit(1))).cast("long").as("stop_milli"),
        (lit(1000) * size(array_distinct(toks)) /
          greatest(size(toks), lit(1))).cast("long").as("ttr_milli"))
      Selection.ensembleCumeDist(scored, Seq("n_tokens", "stop_milli", "ttr_milli"))
        .orderBy(col("ensemble_score").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), col("n_tokens"), col("stop_milli"),
          col("ttr_milli"), col("q_n_tokens"), col("q_stop_milli"),
          col("q_ttr_milli"), col("ensemble_score"))
    }),

    // The per-source dataset card: doc/token/char mass, token range,
    // mean stopword score, corpus-wide exact-dup incidence, langid
    // counts — the auditable datasheet a release publishes.
    "q120_dataset_card" -> ((s, d) => {
      Stats.datasetCard(t(s, d, "documents"), "source", "doc_id", "text")
        .orderBy(col("source"))
    }),

    // Cross-source exact-duplication matrix: which source pairs share
    // verbatim texts, and how much document mass sits on each side —
    // the provenance/priority table before a cross-source dedup run.
    // The synthetic corpus has natural cross-source dups only at
    // sf0.1, so both engines union the same planted mirror docs (the
    // q47 planted-fixture discipline) — the matrix is exercised at
    // every SF and the natural sf0.1 pairs still flow through.
    "q121_dup_matrix" -> ((s, d) => {
      import s.implicits._
      val planted = MirrorDocs.toDF("source", "text")
      Dedup.crossSourceDupMatrix(
          t(s, d, "documents").select(col("source"), col("text"))
            .unionByName(planted),
          "source", "text")
        .orderBy(col("src_a"), col("src_b"))
    }),

    // N-gram novelty: the fraction of each doc's distinct trigrams
    // found nowhere else in the corpus — the informativeness signal
    // between exact dedup and pairwise near-dup.
    "q122_novelty" -> ((s, d) => {
      Relevance.noveltyScores(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Cross-source NEAR-dup matrix: verified near-dup pairs by
    // unordered source pair with order-free mean Jaccard — the fuzzy
    // counterpart of q121 (light edits and template reuse show here).
    "q123_neardup_matrix" -> ((s, d) => {
      Dedup.crossSourceNearDupMatrix(t(s, d, "documents"), "doc_id",
          "source", "text", threshold = 0.8)
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Quality-aware dedup: keep the highest-quality doc of each
    // near-dup cluster (type-token-ratio milli score; tie = smallest
    // id) — "keep best, not first".
    "q124_quality_dedup" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val docs = t(s, d, "documents").select(col("doc_id"),
        (lit(1000) * size(array_distinct(toks)) /
          greatest(size(toks), lit(1))).cast("long").as("quality_milli"))
      val pairs = Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.resolveClustersByQuality(docs, "doc_id", "quality_milli", pairs)
        .select(col("doc_id"), col("cluster_id"), col("quality_milli"),
          col("keep"))
        .orderBy(col("doc_id"))
    }),

    // Per-source distribution drift: KL(source || corpus) over
    // add-1-smoothed hashed-unigram buckets, full domain, pico-nat
    // integer sums — which source reads least like the corpus.
    "q125_source_drift" -> ((s, d) => {
      Selection.sourceDriftKl(t(s, d, "documents"), "source", "text",
          buckets = 1024)
        .orderBy(col("source"))
    }),

    // Cluster purity vs labels: IVF assignment from the 8 lowest-id
    // seeds, per cluster the majority label and purity — "does
    // unsupervised structure recover the labels".
    "q126_cluster_purity" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cb = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("long").as("cid"), col("embedding"))
      Similarity.clusterPurity(
          Similarity.ivfAssign(e, cb).select(col("cluster"), col("label")),
          "cluster", "label")
        .orderBy(col("cluster"))
    }),

    // Label-centroid separation: pairwise cosine of per-label
    // centroids — class separability in embedding space.
    "q127_label_separation" -> ((s, d) => {
      Similarity.labelCentroidMatrix(t(s, d, "embeddings"), "label",
          "embedding")
        .orderBy(col("label_a"), col("label_b"))
    }),

    // Ingest-batch drift monitor: PSI of the token-count distribution,
    // new batch (doc_id % 5 == 0) vs the reference corpus — the
    // number checked before a batch is admitted (q117's split).
    "q128_psi" -> ((s, d) => {
      val scored = t(s, d, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_toks"))
      Stats.psi(scored.filter(col("doc_id") % 5 =!= 0),
        scored.filter(col("doc_id") % 5 === 0), "n_toks", binWidth = 8L)
    }))

  // THE tokenizer's oracle twin (graft.functions.Tokenize): space-pad
  // Han/Hiragana/Katakana/Thai code points, split on ASCII \s + U+3000.
  // Identity on the ASCII test corpus — q19-q46 hashes are unchanged.
  private val tokensSql =
    """list_filter(regexp_split_to_array(regexp_replace(text,
      | '([\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}])', ' \1 ', 'g'),
      | '[\s　]+'), tk -> tk <> '')""".stripMargin.replace("\n", "")

  /** SRP plane p as a DOUBLE list over the dims of `v` — component d =
    * first 8 md5 hex chars of "p|d" as u32, mod 1e6, into [-0.5, 0.5);
    * identical to Similarity.planeComponent. */
  private def srpPlaneSql(p: Int): String =
    s"list_transform(range(len(v)), d -> ((('0x' || substr(md5('$p|' || d::VARCHAR), 1, 8))::UBIGINT % 1000000)::DOUBLE / 1000000 - 0.5))"

  /** Packed SRP bucket key over `planes` hyperplanes (sign bits) at a
    * plane-family offset — the SQL twin of Similarity.srpBucket.
    * `list_dot_product` accumulates left-to-right like Spark's
    * `aggregate(zip_with(...))`. */
  private def srpBucketSql(planes: Int, planeOffset: Int = 0): String =
    (0 until planes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${srpPlaneSql(planeOffset + p)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  /** q87's oracle: every BPE round replayed verbatim — pair counts
    * from a struct unnest over the split symbol string, a 1-row argmax
    * (count DESC, l, r), and the same sentinel `replace`. `v_i` /
    * `w_i` are MATERIALIZED: each is referenced twice (by `p_{i+1}`
    * and `v_{i+1}`) and DuckDB's default inlining would otherwise
    * recompute the whole chain exponentially (the q79 lesson). An
    * exhausted round (no pair ≥ minCount) empties every later CTE, so
    * the UNION shrinks exactly like the engine's early stop. */
  private def bpeOracleSql(k: Int, minCount: Long): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH tok AS (SELECT unnest($tokensSql) AS w FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM tok WHERE NOT contains(w, chr(1)) GROUP BY w),
v0 AS MATERIALIZED (SELECT chr(1) || array_to_string(list_append(regexp_split_to_array(w,''),'</w>'), chr(1)||chr(1)) || chr(1) AS st, cnt FROM wc)""")
    for (i <- 1 to k) sb.append(s""",
p$i AS (
  SELECT s.l AS l, s.r AS r, sum(cnt)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(len(sy)-1), j -> {'l': sy[j+1], 'r': sy[j+2]})) AS s, cnt
    FROM (SELECT string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy, cnt FROM v${i - 1}))
  GROUP BY l, r),
w$i AS MATERIALIZED (SELECT l, r, c FROM p$i WHERE c >= $minCount ORDER BY c DESC, l, r LIMIT 1),
v$i AS MATERIALIZED (SELECT replace(st, chr(1)||l||chr(1)||chr(1)||r||chr(1), chr(1)||l||r||chr(1)) AS st, cnt
        FROM v${i - 1} CROSS JOIN w$i)""")
    val union = (1 to k).map(i =>
      s"SELECT ${i - 1}::BIGINT AS rank, l AS lhs, r AS rhs, l||r AS merged, c AS pair_count FROM w$i")
      .mkString("\nUNION ALL ")
    sb.append(s"\nSELECT * FROM (\n$union) ORDER BY rank")
    sb.toString
  }

  /** q92's oracle: the q87 training replay extended one step — the
    * FINAL vocab state's symbols, unnested and weighted by word count.
    * The Spark side segments with the independent applier
    * (Bpe.subwordTokens), so the hash compare pins applier ≡ trainer. */
  private def bpeApplyOracleSql(k: Int, minCount: Long): String = {
    val base = bpeOracleSql(k, minCount)
    // keep the CTE chain, swap the final merge-table SELECT for the
    // final-state token counts
    val cteEnd = base.lastIndexOf("\nSELECT * FROM (")
    base.substring(0, cteEnd) +
      s"""
         |SELECT sym AS token, sum(cnt)::BIGINT AS n FROM (
         |  SELECT unnest(string_split(trim(st, chr(1)), chr(1)||chr(1))) AS sym, cnt
         |  FROM v$k)
         |GROUP BY sym ORDER BY token""".stripMargin
  }

  /** q96's oracle: the q87 replay with the WORD carried through the
    * chain (the final state then maps word → symbol list directly —
    * no string surgery to recover the word), a frequency-ranked vocab
    * id table, and per-doc id sequences hashed in (word ix, symbol ix)
    * order — the exact order the engine's flattened applier emits. */
  private def bpeDocIdsOracleSql(k: Int, minCount: Long): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH tok AS (SELECT unnest($tokensSql) AS w FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM tok WHERE NOT contains(w, chr(1)) GROUP BY w),
v0 AS MATERIALIZED (SELECT w, chr(1) || array_to_string(list_append(regexp_split_to_array(w,''),'</w>'), chr(1)||chr(1)) || chr(1) AS st, cnt FROM wc)""")
    for (i <- 1 to k) sb.append(s""",
p$i AS (
  SELECT s.l AS l, s.r AS r, sum(cnt)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(len(sy)-1), j -> {'l': sy[j+1], 'r': sy[j+2]})) AS s, cnt
    FROM (SELECT string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy, cnt FROM v${i - 1}))
  GROUP BY l, r),
w$i AS MATERIALIZED (SELECT l, r, c FROM p$i WHERE c >= $minCount ORDER BY c DESC, l, r LIMIT 1),
v$i AS MATERIALIZED (SELECT w, replace(st, chr(1)||l||chr(1)||chr(1)||r||chr(1), chr(1)||l||r||chr(1)) AS st, cnt
        FROM v${i - 1} CROSS JOIN w$i)""")
    sb.append(s""",
wmap AS MATERIALIZED (
  SELECT w, string_split(trim(st, chr(1)), chr(1)||chr(1)) AS sy FROM v$k),
vc AS (SELECT sym AS token, sum(cnt)::BIGINT AS n FROM (
    SELECT unnest(m.sy) AS sym, cnt FROM wmap m JOIN wc USING (w))
  GROUP BY sym),
vid AS (SELECT token,
    (row_number() OVER (ORDER BY n DESC, token) - 1)::BIGINT AS token_id FROM vc),
dt AS (SELECT doc_id, unnest($tokensSql) AS tk,
    generate_subscripts($tokensSql, 1) AS wix FROM documents),
seq AS (
  SELECT d.doc_id, d.wix, generate_subscripts(m.sy, 1) AS six,
    unnest(m.sy) AS token
  FROM dt d JOIN wmap m ON d.tk = m.w),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
    md5(string_agg(token_id::VARCHAR, ' ' ORDER BY wix, six)) AS ids_hash
  FROM seq JOIN vid USING (token) GROUP BY doc_id)
SELECT doc_id, COALESCE(n_tokens, 0)::BIGINT AS n_tokens, ids_hash
FROM documents LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
    sb.toString
  }

  /** SQL twin of Selection.mortonKey's magic-mask bit spread (16 → 32
    * bits, value in the even bit positions). Textually nested — ~500
    * chars per spread, constant-folded by the oracle engine. */
  private def spreadSql(c: String): String = {
    val m = s"($c & 65535)"
    val a = s"(($m | ($m << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val d = s"(($b | ($b << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  private def shinglesSql(alias: String) =
    s"""(SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(range(len($tokensSql)-2),
       |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
       |  FROM documents)) $alias""".stripMargin

  val oracles: Map[String, String] = Map(
    "q19_text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len($tokensSql) AS n_tokens,
         |  round((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE
         |        / greatest(length(text), 1), 6) AS punct_ratio,
         |  round(len(list_intersect($tokensSql,
         |        ['the','and','of','to','in','is','that','for','with','a']))::DOUBLE
         |        / greatest(len(list_distinct($tokensSql)), 1), 6) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q20_langid" ->
      s"""WITH hits AS (
         |  SELECT doc_id,
         |    len(list_intersect($tokensSql, ['the','and','of','to','in','is','that','for','with','a'])) AS en,
         |    len(list_intersect($tokensSql, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS de,
         |    len(list_intersect($tokensSql, ['le','la','les','et','est','pas','une','pour','dans','que'])) AS fr,
         |    len(list_intersect($tokensSql, ['el','la','los','y','es','no','una','para','en','que'])) AS es
         |  FROM documents),
         |best AS (
         |  SELECT doc_id,
         |    CASE WHEN es > greatest(en, de, fr) THEN 'es'
         |         WHEN fr > greatest(en, de) THEN 'fr'
         |         WHEN de > en THEN 'de' ELSE 'en' END AS lang,
         |    greatest(en, de, fr, es) AS score
         |  FROM hits)
         |SELECT CASE WHEN score >= 1 THEN lang ELSE 'und' END AS lang_id, COUNT(*) AS n
         |FROM best GROUP BY 1 ORDER BY lang_id""".stripMargin,
    "q21_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($tokensSql)), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |-- mirror of the Spark side's maxShingleFreq = 1000 blocking
         |-- cap (no-op at test SFs, cap-exact at any SF)
         |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN ok ON a.s = ok.s GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(inter::DOUBLE / (s1.n + s2.n - inter), 6) AS jaccard
         |FROM pairs JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
         |WHERE inter::DOUBLE / (s1.n + s2.n - inter) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "q23_minhash_lsh" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,
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
    // q85: snake deal over the (n_tokens DESC, doc_id) rank.
    "q85_snake_shards" ->
      s"""WITH t AS (SELECT doc_id, len($tokensSql)::BIGINT AS n FROM documents),
         |r AS (SELECT doc_id, n,
         |        ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) - 1 AS rk FROM t)
         |SELECT doc_id, n AS n_tokens,
         |  (CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - (rk % 8) END)::BIGINT AS shard
         |FROM r ORDER BY doc_id""".stripMargin,
    "q87_bpe_merges" -> bpeOracleSql(8, 2),
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
    // q86: q35's argmin assignment + exact micro-unit component sums
    // (round-half-away-from-zero on the double product — both engines'
    // round()); dims come from the data via a struct unnest.
    "q86_cluster_centroids" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |assign AS (SELECT vec_id, cid AS cluster FROM dist WHERE rn = 1),
        |comp AS (
        |  SELECT a.cluster, s.i AS dim, round(s.x * 1000000)::BIGINT AS m
        |  FROM (SELECT vec_id,
        |          unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
        |        FROM e) u
        |  JOIN assign a USING (vec_id)),
        |agg AS (SELECT cluster, dim, count(*)::BIGINT AS n_vecs, sum(m)::BIGINT AS ms
        |        FROM comp GROUP BY cluster, dim)
        |SELECT cluster, n_vecs, dim::BIGINT AS dim,
        |  round(ms / 1000000.0 / n_vecs, 6) AS c
        |FROM agg ORDER BY cluster, dim""".stripMargin,
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
    "q45_normalized_dedup" ->
      """SELECT md5(norm) AS norm_hash, min(doc_id) AS keep_id,
        |  count(*)::BIGINT AS n_copies
        |FROM (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |  '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents)
        |GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // q42: floor (not round) codes — floor is bit-identical across
    // engines; the scale replays Spark's float truncation via ::REAL.
    "q42_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |  round(CAST(CAST(maxabs / 127.0 AS REAL) AS DOUBLE), 6) AS scale,
        |  CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> 0::BIGINT)
        |       ELSE list_transform(embedding,
        |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT)) END AS codes
        |  FROM s)
        |SELECT vec_id, scale, list_sum(codes)::BIGINT AS qsum,
        |  list_min(codes)::BIGINT AS qmin, list_max(codes)::BIGINT AS qmax
        |FROM q ORDER BY vec_id""".stripMargin,
    "q41_boilerplate" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 5),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |ov AS (SELECT doc_id, count(*) AS n_boiler FROM sh JOIN hot USING (s)
         |       GROUP BY doc_id)
         |SELECT sizes.doc_id, n_shingles::BIGINT AS n_shingles,
         |  COALESCE(n_boiler, 0)::BIGINT AS n_boiler,
         |  round(COALESCE(n_boiler, 0)::DOUBLE / n_shingles, 6) AS boiler_frac,
         |  round(COALESCE(n_boiler, 0)::DOUBLE / n_shingles, 6) < 0.2 AS keep
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
    // q39: q23's pair derivation + a recursive reachability closure;
    // min(m) over everything reachable from n = the component min label.
    "q39_dedup_clusters" ->
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
         |labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n)
         |SELECT d.doc_id, COALESCE(l.cluster, d.doc_id)::BIGINT AS cluster_id,
         |  d.doc_id = COALESCE(l.cluster, d.doc_id) AS keep
         |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q25_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(p.v, c.v) /
        |      (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        |  FROM e p JOIN e c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
    "q24_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokensSql) AS tk FROM documents),
         |th AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 16))::UBIGINT AS h FROM tok),
         |votes AS (
         |  -- left join from documents: a zero-token doc keeps all-zero
         |  -- bits (simhash 0), matching the Spark expression
         |  SELECT d.doc_id, i, SUM(CASE WHEN (th.h >> i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM documents d CROSS JOIN range(64) t(i)
         |  LEFT JOIN th ON th.doc_id = d.doc_id
         |  GROUP BY d.doc_id, i),
         |packed AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN v > 0 AND i < 32 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS lo,
         |    SUM(CASE WHEN v > 0 AND i >= 32 THEN (1::BIGINT << (i::INT - 32)) ELSE 0 END)::BIGINT AS hi
         |  FROM votes GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    bit_count(xor(a.lo, b.lo))::INT + bit_count(xor(a.hi, b.hi))::INT AS hamming
         |  FROM packed a JOIN packed b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q26_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |kb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
         |  ${(0 until 6).map(t => s"${srpBucketSql(3, t * 3)} AS b$t").mkString(",\n  ")}
         |  FROM e)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
         |FROM kb a JOIN kb b ON a.vec_id < b.vec_id
         |  AND (${(0 until 6).map(t => s"a.b$t = b.b$t").mkString(" OR ")})
         |WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,
    "q27_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |kb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
         |       ${srpBucketSql(4, 0)} AS b0, ${srpBucketSql(4, 4)} AS b1 FROM e),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(p.v, c.v) / (p.norm * c.norm), 6) AS cosine
         |  FROM kb p JOIN kb c ON (p.b0 = c.b0 OR p.b1 = c.b1) AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 50),
         |ranked AS (
         |  SELECT probe_id, neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
         |ORDER BY probe_id, rank""".stripMargin,
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
         |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM cand GROUP BY 1),
         |overlap AS (
         |  SELECT cand.doc_id, COUNT(*) AS n_overlap
         |  FROM cand JOIN bench ON cand.s = bench.s GROUP BY 1)
         |SELECT sizes.doc_id, n_shingles,
         |  COALESCE(n_overlap, 0)::BIGINT AS n_overlap,
         |  round(COALESCE(n_overlap, 0)::DOUBLE / n_shingles, 6) AS overlap_frac,
         |  round(COALESCE(n_overlap, 0)::DOUBLE / n_shingles, 6) >= 0.5 AS contaminated
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
    "q35_ivf_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |probe_clusters AS (
        |  SELECT vec_id AS probe_id, cid AS cluster FROM dist
        |  WHERE rn <= 2 AND vec_id < 20),
        |corpus AS (
        |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
        |    sqrt(list_dot_product(e.v, e.v)) AS norm
        |  FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    round(list_dot_product(pe.v, corpus.v) /
        |      (sqrt(list_dot_product(pe.v, pe.v)) * corpus.norm), 6) AS cosine
        |  FROM probe_clusters p
        |  JOIN corpus ON p.cluster = corpus.cluster AND p.probe_id <> corpus.neighbor_id
        |  JOIN e pe ON pe.vec_id = p.probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
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
    // q50: q39's candidate derivation + a jaccard gate on the pairs
    // before the reachability closure; survivors are docs that ARE
    // their component's min label.
    "q50_deduplicate" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |verified AS (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
         |  JOIN sizes s1 ON c.id_a = s1.doc_id JOIN sizes s2 ON c.id_b = s2.doc_id
         |  WHERE inter.i::DOUBLE / (s1.n + s2.n - inter.i) >= 0.8),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM verified
         |  UNION SELECT id_b, id_a FROM verified),
         |reach(n, m) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m),
         |labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n)
         |SELECT d.doc_id, d.lang
         |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |WHERE d.doc_id = COALESCE(l.cluster, d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q49_script_langid" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $cjkValuesSql) v(doc_id, text)),
         |scripts AS (
         |  SELECT doc_id, text,
         |    length(text) - length(regexp_replace(text, '[\\p{Hiragana}\\p{Katakana}]', '', 'g')) AS kana,
         |    length(text) - length(regexp_replace(text, '\\p{Hangul}', '', 'g')) AS hangul,
         |    length(text) - length(regexp_replace(text, '\\p{Thai}', '', 'g')) AS thai,
         |    length(text) - length(regexp_replace(text, '\\p{Han}', '', 'g')) AS han
         |  FROM corpus),
         |hits AS (
         |  SELECT doc_id, kana, hangul, thai, han,
         |    len(list_intersect($tokensSql, ['the','and','of','to','in','is','that','for','with','a'])) AS en,
         |    len(list_intersect($tokensSql, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS de,
         |    len(list_intersect($tokensSql, ['le','la','les','et','est','pas','une','pour','dans','que'])) AS fr,
         |    len(list_intersect($tokensSql, ['el','la','los','y','es','no','una','para','en','que'])) AS es
         |  FROM scripts),
         |best AS (
         |  SELECT doc_id, kana, hangul, thai, han,
         |    CASE WHEN es > greatest(en, de, fr) THEN 'es'
         |         WHEN fr > greatest(en, de) THEN 'fr'
         |         WHEN de > en THEN 'de' ELSE 'en' END AS plang,
         |    greatest(en, de, fr, es) AS score
         |  FROM hits),
         |labeled AS (
         |  SELECT doc_id,
         |    CASE WHEN kana >= 3 THEN 'ja'
         |         WHEN hangul >= 3 THEN 'ko'
         |         WHEN thai >= 3 THEN 'th'
         |         WHEN han >= 3 THEN 'zh'
         |         WHEN score >= 1 THEN plang ELSE 'und' END AS lang_id
         |  FROM best)
         |SELECT lang_id, COUNT(*) AS n FROM labeled
         |GROUP BY 1 ORDER BY lang_id""".stripMargin,
    // q48: assignment replays q35's float argmin; scoring replays q42's
    // floor codes and ranks by integer-dot cosine (exact below 2^53 in
    // DOUBLE, so both engines agree bit-for-bit).
    "q48_ivf_quantized" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        |q AS (SELECT vec_id,
        |  CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::BIGINT)
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT)) END AS codes
        |  FROM s),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |probe_clusters AS (
        |  SELECT vec_id AS probe_id, cid AS cluster FROM dist
        |  WHERE rn <= 2 AND vec_id < 20),
        |corpus AS (
        |  SELECT d.vec_id AS neighbor_id, cid AS cluster, q.codes,
        |    sqrt(list_dot_product(q.codes, q.codes)) AS qnorm
        |  FROM dist d JOIN q ON d.vec_id = q.vec_id WHERE rn = 1),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    CASE WHEN sqrt(list_dot_product(pq.codes, pq.codes)) = 0 OR corpus.qnorm = 0
        |         THEN 0.0
        |         ELSE round(list_dot_product(pq.codes, corpus.codes) /
        |           (sqrt(list_dot_product(pq.codes, pq.codes)) * corpus.qnorm), 6)
        |    END AS qcosine
        |  FROM probe_clusters p
        |  JOIN corpus ON p.cluster = corpus.cluster AND p.probe_id <> corpus.neighbor_id
        |  JOIN q pq ON pq.vec_id = p.probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, qcosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY qcosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, qcosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
    "q47_cjk_curation" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $cjkValuesSql) v(doc_id, text)),
         |m AS (
         |  SELECT doc_id, text,
         |    len($tokensSql)::BIGINT AS word_count,
         |    round(list_sum(list_transform($tokensSql, x -> length(x)))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS mean_word_len,
         |    round(len(list_distinct($tokensSql))::DOUBLE
         |          / greatest(len($tokensSql), 1), 6) AS frac_unique
         |  FROM corpus),
         |quality AS (
         |  SELECT doc_id, text, word_count FROM m
         |  WHERE word_count >= 3 AND word_count <= 100000
         |    AND mean_word_len >= 1.0 AND mean_word_len <= 12.0
         |    AND frac_unique >= 0.2),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, unnest(list_transform(range(len($tokensSql)-2),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3])) AS s
         |  FROM quality)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |-- the Spark side caps blocking at maxShingleFreq = 1000: a
         |-- shingle shared by more docs joins no pairs and adds no
         |-- intersection counts (per-doc sizes stay FULL) — mirrored
         |-- here so parity is cap-exact at any SF, not just while no
         |-- trigram exceeds the cap
         |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1000),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN ok ON a.s = ok.s GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b, round(inter::DOUBLE / (s1.n + s2.n - inter), 6) AS jaccard
         |  FROM pr JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
         |  WHERE inter::DOUBLE / (s1.n + s2.n - inter) >= 0.8),
         |partners AS (
         |  SELECT id_a AS doc_id, id_b AS partner_id, jaccard FROM pairs
         |  UNION ALL SELECT id_b, id_a, jaccard FROM pairs)
         |SELECT q.doc_id, q.word_count,
         |  COALESCE(partner_id, -1)::BIGINT AS partner_id,
         |  COALESCE(jaccard, 0.0) AS jaccard
         |FROM quality q LEFT JOIN partners p ON q.doc_id = p.doc_id
         |WHERE q.doc_id >= $CjkIdBase
         |ORDER BY q.doc_id""".stripMargin,
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
    // q51: smoothed idf (sklearn convention); rank on the ROUNDED score
    // so a sub-ulp ln() difference between engines cannot reorder.
    "q51_tfidf" ->
      s"""WITH tc AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($tokensSql) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |df_t AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tc.term, tf,
         |    round(tf::DOUBLE * (ln((1 + n_docs)::DOUBLE / (1 + df)::DOUBLE) + 1.0), 6) AS score
         |  FROM tc JOIN df_t ON tc.term = df_t.term, n),
         |r AS (
         |  SELECT doc_id, term, tf, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tf::BIGINT AS tf, score, rank::BIGINT AS rank
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // q52: BM25 with k1=1.2, b=0.75. Literal arithmetic mirrors the
    // Spark expression tree exactly — (1.2 + 1.0) not 2.2, because the
    // Scala side computes k1+1 in doubles and 2.2 parses to a different
    // double; avgdl = exact integer sum / count; the cross-term total
    // sums fixed pivoted columns in query-term order.
    "q52_bm25" ->
      s"""WITH dl AS (SELECT doc_id, len($tokensSql)::BIGINT AS dl FROM documents),
         |st AS (SELECT COUNT(*) AS n_docs, SUM(dl)::BIGINT AS dlsum FROM dl),
         |tc AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($tokensSql) AS term FROM documents) u
         |  WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term),
         |df_t AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term),
         |sc AS (
         |  SELECT tc.doc_id, tc.term,
         |    round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
         |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / (dlsum::DOUBLE / n_docs))), 6) AS score
         |  FROM tc JOIN df_t ON tc.term = df_t.term
         |  JOIN dl ON tc.doc_id = dl.doc_id, st),
         |pv AS (
         |  SELECT doc_id,
         |    max(CASE WHEN term = 'spark' THEN score END) AS s1,
         |    max(CASE WHEN term = 'join' THEN score END) AS s2,
         |    max(CASE WHEN term = 'window' THEN score END) AS s3
         |  FROM sc GROUP BY doc_id),
         |tot AS (SELECT doc_id,
         |  round(COALESCE(s1, 0.0) + COALESCE(s2, 0.0) + COALESCE(s3, 0.0), 6) AS score
         |  FROM pv),
         |r AS (SELECT doc_id, score,
         |  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM tot)
         |SELECT doc_id, score, rank::BIGINT AS rank FROM r WHERE rank <= 20
         |ORDER BY rank""".stripMargin,
    // q53: paragraph boundaries synthesized every 3 tokens (RE2 and
    // java.util.regex segment this pattern identically), then cross-doc
    // repeated paragraphs (md5 groups, distinct-doc count >= 2) drop
    // from every doc; survivors re-join in original order.
    "q53_paragraph_dedup" ->
      """WITH p0 AS (SELECT doc_id,
        |  string_split(regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g'),
        |    chr(10)) AS l FROM documents),
        |paras AS (SELECT doc_id, unnest(l) AS para,
        |  generate_subscripts(l, 1) AS ix FROM p0),
        |pp AS (SELECT * FROM paras WHERE para <> ''),
        |hot AS (SELECT md5(para) AS h FROM pp GROUP BY md5(para)
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |kept AS (SELECT pp.doc_id, pp.para, pp.ix FROM pp
        |  LEFT JOIN hot ON md5(pp.para) = hot.h WHERE hot.h IS NULL),
        |np AS (SELECT doc_id, COUNT(*) AS n_paras FROM pp GROUP BY doc_id),
        |k AS (SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(para, chr(10) ORDER BY ix) AS txt FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(np.n_paras, 0)::BIGINT AS n_paras,
        |  COALESCE(k.n_kept, 0)::BIGINT AS n_kept,
        |  md5(COALESCE(k.txt, '')) AS clean_hash
        |FROM documents d
        |LEFT JOIN np ON d.doc_id = np.doc_id
        |LEFT JOIN k ON d.doc_id = k.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // q54: q35's argmin assignment + q44's stable md5-order take.
    "q54_cluster_sample" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, cid AS cluster FROM dist WHERE rn = 1),
        |r AS (SELECT vec_id, cluster,
        |  ROW_NUMBER() OVER (PARTITION BY cluster
        |    ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT, vec_id) AS rn
        |  FROM a)
        |SELECT vec_id, cluster FROM r WHERE rn <= 10 ORDER BY vec_id""".stripMargin,
    // q55: per-subspace argmin over the 4 lowest-id vectors' subvector
    // slices — q35's distance arithmetic on 8-dim slices.
    "q55_pq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |sv AS (SELECT vec_id, sub, list_slice(v, sub * 8 + 1, sub * 8 + 8) AS vs
        |       FROM e, range(8) s(sub)),
        |c AS (SELECT sub, vec_id AS cid, vs AS cs FROM sv WHERE vec_id < 4),
        |dist AS (
        |  SELECT sv.vec_id, sv.sub, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
        |      list_dot_product(sv.vs, sv.vs) - 2 * list_dot_product(sv.vs, c.cs)
        |        + list_dot_product(c.cs, c.cs), c.cid) AS rn
        |  FROM sv JOIN c ON sv.sub = c.sub)
        |SELECT vec_id, sub::BIGINT AS sub, cid::BIGINT AS code
        |FROM dist WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin,
    // q56: ADC — lut[j][c] dots replayed with sequential
    // list_dot_product; the j-sum rides list_dot_product(parts, ones)
    // (left-to-right, matching Spark's aggregate over sequence(0,7)).
    "q56_pq_adc" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |sv AS (SELECT vec_id, sub, list_slice(v, sub * 8 + 1, sub * 8 + 8) AS vs
        |       FROM e, range(8) s(sub)),
        |c AS (SELECT sub, vec_id AS cid, vs AS cs FROM sv WHERE vec_id < 4),
        |dist AS (
        |  SELECT sv.vec_id, sv.sub, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
        |      list_dot_product(sv.vs, sv.vs) - 2 * list_dot_product(sv.vs, c.cs)
        |        + list_dot_product(c.cs, c.cs), c.cid) AS rn
        |  FROM sv JOIN c ON sv.sub = c.sub),
        |codes AS (SELECT vec_id, list(cid ORDER BY sub) AS cl
        |          FROM dist WHERE rn = 1 GROUP BY vec_id),
        |cents AS (SELECT sub, list(cs ORDER BY cid) AS cvs FROM c GROUP BY sub),
        |book AS (SELECT list(cvs ORDER BY sub) AS bk FROM cents),
        |n2 AS (SELECT vec_id, cl,
        |  list_dot_product(list_transform(range(8),
        |    j -> list_dot_product(bk[j + 1][cl[j + 1] + 1], bk[j + 1][cl[j + 1] + 1])),
        |    list_transform(range(8), x -> 1.0)) AS nn
        |  FROM codes, book),
        |probes AS (SELECT vec_id AS probe_id, v,
        |  sqrt(list_dot_product(v, v)) AS p_norm FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT p.probe_id, n2.vec_id AS neighbor_id,
        |    CASE WHEN p.p_norm = 0 OR n2.nn = 0 THEN 0.0
        |      ELSE round(list_dot_product(list_transform(range(8), j ->
        |        list_dot_product(list_slice(p.v, j * 8 + 1, j * 8 + 8),
        |          bk[j + 1][n2.cl[j + 1] + 1])),
        |        list_transform(range(8), x -> 1.0)) / (p.p_norm * sqrt(n2.nn)), 6)
        |    END AS adc_cosine
        |  FROM probes p, n2, book WHERE p.probe_id <> n2.vec_id),
        |r AS (SELECT probe_id, neighbor_id, adc_cosine,
        |  ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY adc_cosine DESC, neighbor_id) AS rank FROM scored)
        |SELECT probe_id, neighbor_id, adc_cosine, rank::BIGINT AS rank
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    // q58: DuckDB's native ASOF JOIN is the oracle for the union+window
    // Spark form — inclusive backward match per (user_id, ts).
    "q58_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS asof_value, r.ts AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // q59: q35's argmin assignment scopes an in-cluster all-pairs cosine
    // gate (mirroring the maxClusterSize=2000 cap), then q50's
    // reachability closure keeps the min-id survivor per component.
    "q59_semantic_dedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |a AS (SELECT d.vec_id, d.cid AS cluster, e.v
        |      FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
        |ok AS (SELECT cluster FROM a GROUP BY cluster HAVING COUNT(*) <= 2000),
        |verified AS (
        |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  JOIN ok ON x.cluster = ok.cluster
        |  WHERE round(list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
        |    >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM verified
        |  UNION SELECT id_b, id_a FROM verified),
        |reach(n, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.n, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.m),
        |labels AS (SELECT n AS vec_id, min(m) AS cluster FROM reach GROUP BY n)
        |SELECT emb.vec_id, emb.label
        |FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.vec_id
        |WHERE emb.vec_id = COALESCE(l.cluster, emb.vec_id)
        |ORDER BY emb.vec_id""".stripMargin,
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
    // q60: residuals are FLOAT subtractions (DuckDB FLOAT−FLOAT is
    // IEEE float32, bit-equal to the JVM); every dot casts the float
    // values to DOUBLE lists first so accumulation matches the kernels;
    // code assignment replays the argmin kernel's ‖v‖²−2v·c+‖c‖² form,
    // ADC scoring the ‖diff‖² form; ranks compare ROUNDED distances.
    "q60_ivfpq" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    embedding AS vf FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv, vf AS cvf FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |resf AS (
        |  SELECT e.vec_id, d.cid AS cluster,
        |    list_transform(range(64), i -> e.vf[i + 1] - c.cvf[i + 1]) AS rf
        |  FROM e JOIN dist d ON e.vec_id = d.vec_id AND d.rn = 1
        |  JOIN c ON d.cid = c.cid),
        |-- book seeds are the 4 lowest ids OUTSIDE the coarse set (8-11):
        |-- coarse members' residuals are zero vectors
        |bookf AS (SELECT s.sub, r.vec_id - 8 AS cid,
        |    list_slice(r.rf, s.sub * 8 + 1, s.sub * 8 + 8) AS csf
        |  FROM resf r, range(8) s(sub) WHERE r.vec_id >= 8 AND r.vec_id < 12),
        |rsub AS (SELECT r.vec_id, s.sub,
        |    list_transform(list_slice(r.rf, s.sub * 8 + 1, s.sub * 8 + 8),
        |      x -> CAST(x AS DOUBLE)) AS rs
        |  FROM resf r, range(8) s(sub)),
        |bsub AS (SELECT sub, cid,
        |    list_transform(csf, x -> CAST(x AS DOUBLE)) AS cs FROM bookf),
        |cdist AS (
        |  SELECT rsub.vec_id, rsub.sub, bsub.cid,
        |    ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.sub ORDER BY
        |      list_dot_product(rs, rs) - 2 * list_dot_product(rs, cs)
        |        + list_dot_product(cs, cs), bsub.cid) AS rn
        |  FROM rsub JOIN bsub ON rsub.sub = bsub.sub),
        |codes AS (SELECT vec_id, list(cid ORDER BY sub) AS cl
        |          FROM cdist WHERE rn = 1 GROUP BY vec_id),
        |corpus AS (SELECT r.vec_id AS neighbor_id, r.cluster, codes.cl
        |           FROM resf r JOIN codes ON r.vec_id = codes.vec_id),
        |pres AS (
        |  SELECT e.vec_id AS probe_id, d.cid AS cluster,
        |    list_transform(range(64), i -> e.vf[i + 1] - c.cvf[i + 1]) AS pf
        |  FROM e JOIN dist d ON e.vec_id = d.vec_id AND d.rn <= 2
        |  JOIN c ON d.cid = c.cid
        |  WHERE e.vec_id < 10),
        |bnest AS (SELECT list(cl ORDER BY sub) AS bk FROM (
        |    SELECT sub, list(csf ORDER BY cid) AS cl FROM bookf GROUP BY sub)),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    round(list_dot_product(list_transform(range(8), j ->
        |      list_dot_product(
        |        list_transform(list_transform(range(8), i ->
        |          p.pf[j * 8 + i + 1] - bk[j + 1][corpus.cl[j + 1] + 1][i + 1]),
        |          x -> CAST(x AS DOUBLE)),
        |        list_transform(list_transform(range(8), i ->
        |          p.pf[j * 8 + i + 1] - bk[j + 1][corpus.cl[j + 1] + 1][i + 1]),
        |          x -> CAST(x AS DOUBLE)))),
        |      list_transform(range(8), x -> 1.0)), 6) AS adc_dist
        |  FROM pres p JOIN corpus ON p.cluster = corpus.cluster
        |    AND p.probe_id <> corpus.neighbor_id, bnest),
        |r AS (SELECT probe_id, neighbor_id, adc_dist,
        |  ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY adc_dist ASC, neighbor_id) AS rank FROM scored)
        |SELECT probe_id, neighbor_id, adc_dist, rank::BIGINT AS rank
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
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
         |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM cand GROUP BY 1),
         |mb AS (SELECT doc_id, COUNT(*) AS n_maybe FROM maybe GROUP BY 1)
         |SELECT sizes.doc_id, n_shingles::BIGINT AS n_shingles,
         |  COALESCE(n_maybe, 0)::BIGINT AS n_maybe,
         |  round(COALESCE(n_maybe, 0)::DOUBLE / n_shingles, 6) AS maybe_frac,
         |  round(COALESCE(n_maybe, 0)::DOUBLE / n_shingles, 6) >= 0.5 AS contaminated
         |FROM sizes LEFT JOIN mb ON sizes.doc_id = mb.doc_id
         |ORDER BY sizes.doc_id""".stripMargin,

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

    "q73_vocab_build" ->
      s"""WITH toks AS (SELECT unnest($tokensSql) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
         |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 32)
         |SELECT row_number() OVER (ORDER BY cnt DESC, token) - 1 AS token_id,
         |  token, cnt
         |FROM top ORDER BY token_id""".stripMargin,

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

    // Window hash = md5 of the space-joined 5-token slice — identical
    // bytes in both engines (slice is 1-based-inclusive t[i+1:i+5] here,
    // slice(t, i+1, 5) in Spark). Interval union via lag: first hot
    // window in a doc contributes 5 tokens, each later one
    // min(5, pos - prev). generate_series descends-to-empty on short
    // docs, mirroring the Spark-side size guard.
    "q80_dup_spans" ->
      s"""WITH toks AS MATERIALIZED (SELECT doc_id, $tokensSql AS t FROM documents),
         |wins AS MATERIALIZED (
         |  SELECT doc_id, i AS pos, md5(array_to_string(t[i+1:i+5], ' ')) AS h
         |  FROM toks, unnest(generate_series(0, len(t)-5)) AS u(i)),
         |hot AS MATERIALIZED (
         |  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |hw AS (
         |  SELECT w.doc_id, w.pos,
         |    lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS prev
         |  FROM wins w JOIN hot USING (h)),
         |cov AS (
         |  SELECT doc_id, COUNT(*)::BIGINT AS n_dup_windows,
         |    SUM(CASE WHEN prev IS NULL THEN 5
         |             ELSE least(5, pos - prev) END)::BIGINT AS covered_tokens
         |  FROM hw GROUP BY doc_id)
         |SELECT tk.doc_id, len(tk.t)::BIGINT AS n_tokens,
         |  greatest(len(tk.t) - 4, 0)::BIGINT AS n_windows,
         |  COALESCE(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
         |  COALESCE(c.covered_tokens, 0)::BIGINT AS covered_tokens,
         |  round(COALESCE(c.covered_tokens, 0)::DOUBLE
         |        / greatest(len(tk.t), 1), 6) AS dup_frac
         |FROM toks tk LEFT JOIN cov c USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q80's window/hot CTEs, then per-token coverage by running max of
    // (hot-start pos + 5) over preceding positions — a token at p is
    // removed iff that max exceeds p; survivors re-join with single
    // spaces (string_agg skips the removed tokens' NULLs, ORDER BY p
    // preserves document order).
    "q81_remove_dup_spans" ->
      s"""WITH toks AS MATERIALIZED (SELECT doc_id, $tokensSql AS t FROM documents),
         |wins AS MATERIALIZED (
         |  SELECT doc_id, i AS pos, md5(array_to_string(t[i+1:i+5], ' ')) AS h
         |  FROM toks, unnest(generate_series(0, len(t)-5)) AS u(i)),
         |hot AS MATERIALIZED (
         |  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |hs AS MATERIALIZED (
         |  SELECT w.doc_id, w.pos FROM wins w JOIN hot USING (h)),
         |tok AS MATERIALIZED (
         |  SELECT doc_id, i AS p, t[i+1] AS tok
         |  FROM toks, unnest(generate_series(0, len(t)-1)) AS u(i)),
         |cov AS (
         |  SELECT tk.doc_id, tk.p, tk.tok,
         |    max(CASE WHEN hs.pos IS NOT NULL THEN hs.pos + 5 END)
         |      OVER (PARTITION BY tk.doc_id ORDER BY tk.p) AS ce
         |  FROM tok tk LEFT JOIN hs ON hs.doc_id = tk.doc_id AND hs.pos = tk.p),
         |agg AS (
         |  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
         |    SUM(CASE WHEN ce > p THEN 1 ELSE 0 END)::BIGINT AS n_removed,
         |    COALESCE(string_agg(CASE WHEN ce IS NULL OR ce <= p THEN tok END,
         |      ' ' ORDER BY p), '') AS text_clean
         |  FROM cov GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
         |  COALESCE(a.n_removed, 0)::BIGINT AS n_removed,
         |  CASE WHEN COALESCE(a.n_removed, 0) = 0 THEN COALESCE(d.text, '')
         |       ELSE a.text_clean END AS text_clean
         |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

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

    // The LM replayed relationally: occurrence-preserving bigrams,
    // add-0.5 smoothing, ln in exact pico-units (the float-SUM-order
    // doctrine), identical arithmetic order throughout.
    "q75_lm_score" ->
      s"""WITH lm AS (SELECT text FROM documents WHERE source <> 'src0'),
         |lt AS (SELECT unnest($tokensSql) AS w FROM lm),
         |uni AS (SELECT w, count(*) AS c1 FROM lt GROUP BY w),
         |lb AS (SELECT unnest(list_transform(range(len($tokensSql)-1),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2])) AS b FROM lm),
         |bi AS (SELECT b, count(*) AS c2 FROM lb GROUP BY b),
         |v AS (SELECT count(*) AS v FROM uni),
         |db AS (SELECT doc_id, unnest(list_transform(range(len($tokensSql)-1),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2])) AS b FROM documents),
         |p AS (SELECT doc_id,
         |    CAST(round(ln((COALESCE(c2, 0)::DOUBLE + 0.5)
         |      / (COALESCE(c1, 0)::DOUBLE + 0.5 * v.v)) * 1e12, 0) AS BIGINT) AS lp
         |  FROM db LEFT JOIN bi ON db.b = bi.b
         |  LEFT JOIN uni ON split_part(db.b, ' ', 1) = uni.w
         |  CROSS JOIN v)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(-(sum(lp)::DOUBLE / 1e12) / count(*), 6) AS lm_score
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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
    // q91: q22's capped exact-Jaccard truth + q23's minhash bands at
    // three configs; MATERIALIZED because truth/mh are read per config.
    "q91_lsh_audit" -> {
      val bandCtes = Seq(2, 4, 8).map { b =>
        val rpb = 16 / b
        s"""bt$b AS MATERIALIZED (
           |  SELECT doc_id, i // $rpb AS band,
           |         md5(string_agg(m, '|' ORDER BY i)) AS bucket
           |  FROM mh GROUP BY doc_id, i // $rpb)""".stripMargin
      }.mkString(",\n")
      val candSelects = Seq(2, 4, 8).map { b =>
        s"""SELECT $b AS bands, a.doc_id AS id_a, b.doc_id AS id_b
           |FROM bt$b a JOIN bt$b b
           |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           |GROUP BY 1, 2, 3""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1000),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN ok ON a.s = ok.s GROUP BY 1, 2),
         |truth AS MATERIALIZED (
         |  SELECT id_a, id_b
         |  FROM p JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
         |  WHERE inter::DOUBLE / (s1.n + s2.n - inter) >= 0.8),
         |mh AS MATERIALIZED (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |$bandCtes,
         |cand AS ($candSelects),
         |st AS (
         |  SELECT bands, count(*)::BIGINT AS n_candidates,
         |    sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM cand c LEFT JOIN truth t USING (id_a, id_b) GROUP BY bands),
         |spine AS (SELECT unnest([2, 4, 8]) AS bands),
         |tt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
         |SELECT bands::BIGINT AS bands, (16 // bands)::BIGINT AS rows_per_band,
         |  COALESCE(n_candidates, 0)::BIGINT AS n_candidates, n_true,
         |  COALESCE(n_hits, 0)::BIGINT AS n_hits,
         |  CASE WHEN COALESCE(n_candidates, 0) > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_candidates, 6) END AS prec,
         |  CASE WHEN n_true > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_true, 6) END AS rec
         |FROM spine LEFT JOIN st USING (bands) CROSS JOIN tt
         |ORDER BY bands""".stripMargin
    },
    "q92_bpe_vocab" -> bpeApplyOracleSql(8, 2),
    // q93: distinct postings, global-df gate, 1024-id blocks,
    // block-relative delta gaps.
    "q93_inverted_index" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tk AS term FROM (
         |    SELECT doc_id, unnest($tokensSql) AS tk FROM documents)),
         |keep AS (SELECT term FROM tok GROUP BY term HAVING count(*) >= 100),
         |b AS (SELECT term, doc_id // 1024 AS block, doc_id
         |      FROM tok JOIN keep USING (term)),
         |g AS (SELECT term, block, count(*)::BIGINT AS df_block,
         |             list_sort(list(doc_id)) AS ids
         |      FROM b GROUP BY term, block)
         |SELECT term, block::BIGINT AS block, df_block,
         |  array_to_string(list_transform(range(len(ids)), j ->
         |    ids[j+1] - CASE WHEN j = 0 THEN block * 1024 ELSE ids[j] END), ',') AS gaps
         |FROM g ORDER BY term, block""".stripMargin,
    // q94: q25's exact truth + q35's IVF machinery replayed at four
    // nProbe settings; shared CTEs MATERIALIZED (read per config).
    "q94_ann_recall" -> {
      val configs = Seq(1, 2, 4, 8)
      val perConfig = configs.map { np =>
        s"""sel$np AS (
           |  SELECT $np AS n_probe, probe_id, neighbor_id FROM (
           |    SELECT pc.probe_id, corpus.neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY pc.probe_id ORDER BY
           |        round(list_dot_product(p.v, corpus.v) / (p.norm * corpus.norm), 6) DESC,
           |        corpus.neighbor_id) AS rank
           |    FROM (SELECT vec_id AS probe_id, cid AS cluster FROM dist
           |          WHERE rn <= $np AND vec_id < 20) pc
           |    JOIN corpus ON pc.cluster = corpus.cluster
           |      AND pc.probe_id <> corpus.neighbor_id
           |    JOIN pr p ON p.probe_id = pc.probe_id)
           |  WHERE rank <= 3)""".stripMargin
      }.mkString(",\n")
      val union = configs.map(np => s"SELECT * FROM sel$np").mkString("\nUNION ALL ")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |dist AS MATERIALIZED (
         |  SELECT e.vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
         |        + list_dot_product(c.cv, c.cv), cid) AS rn
         |  FROM e CROSS JOIN c),
         |corpus AS MATERIALIZED (
         |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
         |    sqrt(list_dot_product(e.v, e.v)) AS norm
         |  FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
         |pr AS MATERIALIZED (
         |  SELECT vec_id AS probe_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM e WHERE vec_id < 20),
         |truth AS MATERIALIZED (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT p.probe_id, ce.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
         |        round(list_dot_product(p.v, ce.v) /
         |          (p.norm * sqrt(list_dot_product(ce.v, ce.v))), 6) DESC,
         |        ce.vec_id) AS rank
         |    FROM pr p JOIN e ce ON p.probe_id <> ce.vec_id)
         |  WHERE rank <= 3),
         |$perConfig,
         |cand AS ($union),
         |st AS (
         |  SELECT n_probe, count(*)::BIGINT AS n_returned,
         |    sum(CASE WHEN t.probe_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM cand LEFT JOIN truth t USING (probe_id, neighbor_id)
         |  GROUP BY n_probe),
         |spine AS (SELECT unnest([1, 2, 4, 8]) AS n_probe),
         |tt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
         |SELECT n_probe::BIGINT AS n_probe,
         |  COALESCE(n_returned, 0)::BIGINT AS n_returned, n_true,
         |  COALESCE(n_hits, 0)::BIGINT AS n_hits,
         |  CASE WHEN n_true > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_true, 6) END AS recall
         |FROM spine LEFT JOIN st USING (n_probe) CROSS JOIN tt
         |ORDER BY n_probe""".stripMargin
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
    "q96_bpe_doc_ids" -> bpeDocIdsOracleSql(8, 2),
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

    // q102: q93's chain + γ(gap+1) = 2·bitlen−1 per entry; integer
    // list_sum (order-free), term-level rollup.
    "q102_posting_bits" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tk AS term FROM (
         |    SELECT doc_id, unnest($tokensSql) AS tk FROM documents)),
         |keep AS (SELECT term FROM tok GROUP BY term HAVING count(*) >= 100),
         |b AS (SELECT term, doc_id // 1024 AS block, doc_id
         |      FROM tok JOIN keep USING (term)),
         |g AS (SELECT term, block, count(*)::BIGINT AS df_block,
         |             list_sort(list(doc_id)) AS ids
         |      FROM b GROUP BY term, block),
         |gp AS (SELECT term, df_block,
         |  list_transform(range(len(ids)), j ->
         |    ids[j+1] - CASE WHEN j = 0 THEN block * 1024 ELSE ids[j] END) AS gaps
         |  FROM g),
         |bits AS (SELECT term, df_block,
         |  list_sum(list_transform(gaps, x -> 2 * length(bin((x + 1)::UBIGINT)) - 1))::BIGINT AS bits
         |  FROM gp)
         |SELECT term, count(*)::BIGINT AS n_blocks, sum(df_block)::BIGINT AS df,
         |  sum(bits)::BIGINT AS elias_bits, (sum(df_block) * 64)::BIGINT AS fixed_bits,
         |  round(sum(bits)::DOUBLE / (sum(df_block) * 64), 6) AS ratio
         |FROM bits GROUP BY term ORDER BY term""".stripMargin,

    // q103: q22's blocked-pair shape with the asymmetric gate — either
    // direction's inter/|side| clears 0.8; the cap mirrors the
    // engine's default 1024.
    "q103_containment" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |ok AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 1024),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN ok ON a.s = ok.s GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(inter::DOUBLE / s1.n, 6) AS c_ab,
         |  round(inter::DOUBLE / s2.n, 6) AS c_ba
         |FROM pairs JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
         |WHERE greatest(inter::DOUBLE / s1.n, inter::DOUBLE / s2.n) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

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

    // q105: both seedings replayed against ONE brute-force truth —
    // the farthest-first chain is 7 argmax rounds (min-d² over the
    // chosen set, DESC, id tie-break), then each seeding gets q94's
    // dist/corpus/sel machinery with its own codebook.
    "q105_ann_seeding" -> {
      val d2 = "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)" +
        " + list_dot_product(c.cv, c.cv)"
      val farChain = (1 to 7).map { i =>
        s"""fn$i AS MATERIALIZED (
           |  SELECT $i AS cid, v AS cv FROM (
           |    SELECT e.vec_id, e.v, min($d2) AS dd
           |    FROM smp e CROSS JOIN fch${i - 1} c GROUP BY e.vec_id, e.v
           |    ORDER BY dd DESC, e.vec_id LIMIT 1)),
           |fch$i AS MATERIALIZED (SELECT * FROM fch${i - 1} UNION ALL SELECT * FROM fn$i)""".stripMargin
      }.mkString(",\n")
      def audit(tag: String, codebook: String) = {
        val dist =
          s"""dist$tag AS MATERIALIZED (
             |  SELECT e.vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $d2, cid) AS rn
             |  FROM e CROSS JOIN $codebook c),
             |corpus$tag AS MATERIALIZED (
             |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
             |    sqrt(list_dot_product(e.v, e.v)) AS norm
             |  FROM dist$tag d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1)""".stripMargin
        val sels = Seq(1, 2).map { np =>
          s"""sel$tag$np AS (
             |  SELECT $np AS n_probe, probe_id, neighbor_id FROM (
             |    SELECT pc.probe_id, cc.neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY pc.probe_id ORDER BY
             |        round(list_dot_product(p.v, cc.v) / (p.norm * cc.norm), 6) DESC,
             |        cc.neighbor_id) AS rank
             |    FROM (SELECT vec_id AS probe_id, cid AS cluster FROM dist$tag
             |          WHERE rn <= $np AND vec_id < 20) pc
             |    JOIN corpus$tag cc ON pc.cluster = cc.cluster
             |      AND pc.probe_id <> cc.neighbor_id
             |    JOIN pr p ON p.probe_id = pc.probe_id)
             |  WHERE rank <= 3)""".stripMargin
        }.mkString(",\n")
        s"$dist,\n$sels"
      }
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |pr AS MATERIALIZED (
         |  SELECT vec_id AS probe_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM e WHERE vec_id < 20),
         |truth AS MATERIALIZED (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT p.probe_id, ce.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
         |        round(list_dot_product(p.v, ce.v) /
         |          (p.norm * sqrt(list_dot_product(ce.v, ce.v))), 6) DESC,
         |        ce.vec_id) AS rank
         |    FROM pr p JOIN e ce ON p.probe_id <> ce.vec_id)
         |  WHERE rank <= 3),
         |cn AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |smp AS MATERIALIZED (
         |  SELECT vec_id, v FROM (
         |    SELECT vec_id, v,
         |      ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT AS h
         |    FROM e ORDER BY h, vec_id LIMIT 256)),
         |fch0 AS MATERIALIZED (
         |  SELECT 0 AS cid, v AS cv FROM smp
         |  WHERE vec_id = (SELECT min(vec_id) FROM smp)),
         |$farChain,
         |cf AS (SELECT cid, cv FROM fch7),
         |${audit("n", "cn")},
         |${audit("f", "cf")},
         |cand AS (
         |  SELECT 'naive' AS seeding, * FROM seln1
         |  UNION ALL SELECT 'naive', * FROM seln2
         |  UNION ALL SELECT 'farthest', * FROM self1
         |  UNION ALL SELECT 'farthest', * FROM self2),
         |st AS (
         |  SELECT seeding, n_probe, count(*)::BIGINT AS n_returned,
         |    sum(CASE WHEN t.probe_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM cand LEFT JOIN truth t USING (probe_id, neighbor_id)
         |  GROUP BY seeding, n_probe),
         |spine AS (
         |  SELECT s.seeding, np.n_probe
         |  FROM (VALUES ('naive'), ('farthest')) s(seeding)
         |  CROSS JOIN (SELECT unnest([1, 2]) AS n_probe) np),
         |tt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
         |SELECT spine.seeding, spine.n_probe::BIGINT AS n_probe,
         |  COALESCE(n_returned, 0)::BIGINT AS n_returned, n_true,
         |  COALESCE(n_hits, 0)::BIGINT AS n_hits,
         |  CASE WHEN n_true > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_true, 6) END AS recall
         |FROM spine LEFT JOIN st USING (seeding, n_probe) CROSS JOIN tt
         |ORDER BY seeding, n_probe""".stripMargin
    },

    // q106: the rule-built 1024-merge table as a literal replace
    // chain over the sentinel-framed vocabulary — 32 CTE rounds of 32
    // nested replaces each (rank order = innermost first), then the
    // final state's symbols weighted by word count.
    "q106_bpe_deep" -> {
      val merges = graft.ops.Bpe.syntheticMerges(1024)
      val rounds = merges.grouped(32).zipWithIndex.map { case (chunk, i) =>
        val chained = chunk.foldLeft("st") { case (acc, (l, r)) =>
          s"replace($acc, chr(1)||'$l'||chr(1)||chr(1)||'$r'||chr(1), chr(1)||'${l + r}'||chr(1))"
        }
        s"d${i + 1} AS (SELECT $chained AS st, cnt FROM d$i)"
      }.mkString(",\n")
      val last = (merges.size + 31) / 32
      s"""WITH tok AS (SELECT unnest($tokensSql) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS cnt FROM tok WHERE NOT contains(w, chr(1)) GROUP BY w),
         |d0 AS (SELECT chr(1) || array_to_string(list_append(regexp_split_to_array(w, ''), '</w>'), chr(1)||chr(1)) || chr(1) AS st, cnt FROM wc),
         |$rounds
         |SELECT sym AS token, sum(cnt)::BIGINT AS n FROM (
         |  SELECT unnest(string_split(trim(st, chr(1)), chr(1)||chr(1))) AS sym, cnt
         |  FROM d$last)
         |GROUP BY sym ORDER BY token""".stripMargin
    },

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

    // q109: rank window over the type table (vocab-sized in DuckDB —
    // the engine side uses bounded TakeOrdered cutoffs instead).
    "q109_vocab_coverage" ->
      s"""WITH tc AS (SELECT tk, count(*)::BIGINT AS n FROM (
         |    SELECT unnest($tokensSql) AS tk FROM documents) GROUP BY tk),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tk) AS rk FROM tc),
         |tot AS (SELECT sum(n)::BIGINT AS total FROM tc)
         |SELECT v.vocab_size::BIGINT AS vocab_size,
         |  (SELECT sum(n) FROM r WHERE rk <= v.vocab_size)::BIGINT AS covered,
         |  tot.total,
         |  round((SELECT sum(n) FROM r WHERE rk <= v.vocab_size)::DOUBLE / tot.total, 6) AS coverage
         |FROM (SELECT unnest([100, 1000, 10000]) AS vocab_size) v CROSS JOIN tot
         |ORDER BY vocab_size""".stripMargin,

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

    // q111: q23's band CTEs for the candidates, then BYTE-level
    // Levenshtein (DuckDB's levenshtein is byte-based on UTF-8; the
    // Spark side matches it via the UTF-8 → ISO-8859-1 round-trip).
    // strlen = byte length, substr = char-based truncation, both
    // mirroring the engine exactly.
    "q111_edit_verify" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |tt AS (SELECT doc_id, substr(text, 1, 4096) AS tx FROM documents),
         |lv AS (
         |  SELECT id_a, id_b, levenshtein(ta.tx, tb.tx) AS lev,
         |    greatest(strlen(ta.tx), strlen(tb.tx), 1) AS ml
         |  FROM cand JOIN tt ta ON id_a = ta.doc_id JOIN tt tb ON id_b = tb.doc_id)
         |SELECT id_a, id_b, lev::BIGINT AS lev_bytes,
         |  round(1.0 - lev::DOUBLE / ml, 6) AS edit_sim
         |FROM lv WHERE 1.0 - lev::DOUBLE / ml >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // q112: winnowing replayed — ordered trigram u32 hashes, window
    // minima over w=4 (one window when fewer than w shingles), distinct
    // selected hashes, then the q103-style capped fingerprint join.
    "q112_winnowing" ->
      s"""WITH gr AS (
         |  SELECT doc_id, list_transform(range(greatest(len($tokensSql) - 2, 0)),
         |    i -> $tokensSql[i+1] || ' ' || $tokensSql[i+2] || ' ' || $tokensSql[i+3]) AS gs
         |  FROM documents),
         |hs AS (
         |  SELECT doc_id, list_transform(gs, g ->
         |    ('0x' || substr(md5(g), 1, 8))::UBIGINT::BIGINT) AS h
         |  FROM gr WHERE len(gs) >= 1),
         |fp AS (
         |  SELECT DISTINCT doc_id, fp FROM (
         |    SELECT doc_id, unnest(list_transform(range(greatest(len(h) - 4, 0) + 1),
         |      i -> list_min(h[i+1:i+4]))) AS fp
         |    FROM hs)),
         |sizes AS (SELECT doc_id, count(*) AS nf FROM fp GROUP BY 1),
         |ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 1024),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
         |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  JOIN ok ON a.fp = ok.fp GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared,
         |  round(n_shared::DOUBLE / least(s1.nf, s2.nf), 6) AS overlap
         |FROM pairs JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id
         |WHERE n_shared >= 2 ORDER BY id_a, id_b""".stripMargin,

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

    // q114: three Lloyd rounds replayed verbatim — argmin assignment
    // (d2, cid tie-break), micro-unit centroid update with the q86
    // arithmetic plus the ::REAL cast (the engine ships float
    // codebooks), inertia as Σ round(d2·1e6)::BIGINT (order-free),
    // reassignments via the a{r}×a{r-1} id join. MATERIALIZED keeps
    // the chain linear (the q79 lesson).
    "q114_kmeans_audit" -> {
      def roundCtes(r: Int, last: Boolean): String = {
        val assign =
          s"""d$r AS MATERIALIZED (
             |  SELECT e.vec_id, c.cid,
             |    list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
             |      + list_dot_product(c.cv, c.cv) AS d2
             |  FROM e CROSS JOIN cb${r - 1} c),
             |a$r AS MATERIALIZED (
             |  SELECT vec_id, cid, d2 FROM (
             |    SELECT vec_id, cid, d2,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             |    FROM d$r) WHERE rn = 1)""".stripMargin
        val update =
          s""",
             |u$r AS MATERIALIZED (
             |  SELECT cid, list(cc ORDER BY dim) AS cv FROM (
             |    SELECT a.cid, s.i AS dim,
             |      CAST(CAST(round(sum(round(s.x * 1000000))::BIGINT / 1000000.0 / count(*), 6)
             |        AS REAL) AS DOUBLE) AS cc
             |    FROM (SELECT vec_id,
             |            unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
             |          FROM e) q
             |    JOIN a$r a USING (vec_id)
             |    GROUP BY a.cid, s.i) t
             |  GROUP BY cid),
             |cb$r AS MATERIALIZED (
             |  SELECT o.cid, coalesce(u.cv, o.cv) AS cv
             |  FROM cb${r - 1} o LEFT JOIN u$r u USING (cid))""".stripMargin
        if (last) assign else assign + update
      }
      def auditRow(r: Int): String = {
        val moved =
          if (r == 1) "(-1)::BIGINT"
          else s"""(SELECT count(*)::BIGINT FROM a$r x JOIN a${r - 1} p
                  | ON x.vec_id = p.vec_id AND x.cid <> p.cid)""".stripMargin
        s"""SELECT $r::BIGINT AS round,
           |  (SELECT sum(round(d2 * 1000000)::BIGINT)::BIGINT FROM a$r) AS inertia_micro,
           |  $moved AS n_reassigned,
           |  (SELECT count(DISTINCT cid)::BIGINT FROM a$r) AS n_clusters""".stripMargin
      }
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |cb0 AS MATERIALIZED (
         |  SELECT vec_id::BIGINT AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         |${(1 to 3).map(r => roundCtes(r, r == 3)).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to 3).map(auditRow).mkString("\nUNION ALL\n")}
         |) ORDER BY round""".stripMargin
    },

    // q115: the same synthetic URL built from doc_id, then the
    // canonicalization replayed rule for rule (scheme/host lowering,
    // userinfo/default-port/www/fragment stripping, trailing-slash
    // trim, tracking-param drop + bytewise param sort).
    "q115_url_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'HTTP://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
         |    'Example-' || (doc_id % 7)::VARCHAR || '.COM' ||
         |    CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END ||
         |    '/path/' || (doc_id % 50)::VARCHAR ||
         |    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
         |    '?utm_source=feed&b=' || (doc_id % 5)::VARCHAR || '&a=1' ||
         |    CASE WHEN doc_id % 6 = 0 THEN '&fbclid=xyz' ELSE '' END ||
         |    '#frag' AS url
         |  FROM documents),
         |p1 AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    split_part(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#', 1) AS nofrag
         |  FROM u),
         |p2 AS (
         |  SELECT doc_id, scheme,
         |    split_part(nofrag, '?', 1) AS base,
         |    regexp_extract(nofrag, '\\?(.*)$$', 1) AS query
         |  FROM p1),
         |p3 AS (
         |  SELECT doc_id, scheme, query,
         |    split_part(base, '/', 1) AS auth,
         |    substr(base, length(split_part(base, '/', 1)) + 1) AS path
         |  FROM p2),
         |p4 AS (
         |  SELECT doc_id, scheme, query, path,
         |    CASE WHEN scheme = 'http'
         |           THEN regexp_replace(lower(regexp_replace(auth, '^[^@]*@', '')), ':80$$', '')
         |         WHEN scheme = 'https'
         |           THEN regexp_replace(lower(regexp_replace(auth, '^[^@]*@', '')), ':443$$', '')
         |         ELSE lower(regexp_replace(auth, '^[^@]*@', '')) END AS np
         |  FROM p3),
         |p5 AS (
         |  SELECT doc_id, scheme,
         |    regexp_replace(np, '^www\\.', '') AS host,
         |    CASE WHEN regexp_replace(path, '/+$$', '') = '' THEN '/'
         |         ELSE regexp_replace(path, '/+$$', '') END AS cpath,
         |    array_to_string(list_sort(list_filter(string_split(query, '&'),
         |      p -> p <> '' AND NOT starts_with(p, 'utm_')
         |        AND NOT starts_with(p, 'fbclid=')
         |        AND NOT starts_with(p, 'gclid=')
         |        AND NOT starts_with(p, 'ref='))), '&') AS q
         |  FROM p4),
         |c AS (
         |  SELECT doc_id, scheme || '://' || host || cpath ||
         |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
         |  FROM p5),
         |g AS (
         |  SELECT canonical_url, count(*)::BIGINT AS n_dups,
         |    min(doc_id) AS rep_id
         |  FROM c GROUP BY canonical_url)
         |SELECT c.doc_id, c.canonical_url, g.n_dups,
         |  c.doc_id = g.rep_id AS is_rep
         |FROM c JOIN g USING (canonical_url) ORDER BY doc_id""".stripMargin,

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

    // q117: q111's band machinery split old/new, signature-estimated
    // Jaccard = matching components / 16 (exact power-of-two
    // fractions, so the threshold compare is drift-free), left join
    // keeps zero-match batch docs.
    "q117_incremental_dedup" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |sg AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         |  FROM bands n JOIN bands o ON n.band = o.band AND n.bucket = o.bucket
         |  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0),
         |est AS (
         |  SELECT new_id, old_id,
         |    len(list_filter(range(16), i -> a.sig[i+1] = b.sig[i+1]))::DOUBLE / 16 AS ej
         |  FROM cand JOIN sg a ON new_id = a.doc_id JOIN sg b ON old_id = b.doc_id),
         |hits AS (
         |  SELECT new_id, count(*)::BIGINT AS n_dup_matches,
         |    min(old_id)::BIGINT AS dup_of, round(max(ej), 6) AS est_jaccard
         |  FROM est WHERE ej >= 0.5 GROUP BY new_id)
         |SELECT d.doc_id AS new_id,
         |  coalesce(n_dup_matches, 0)::BIGINT AS n_dup_matches,
         |  dup_of, est_jaccard, coalesce(n_dup_matches, 0) > 0 AS is_dup
         |FROM documents d LEFT JOIN hits ON d.doc_id = hits.new_id
         |WHERE d.doc_id % 5 = 0 ORDER BY new_id""".stripMargin,

    // q129: the SPLIT storage layout changes nothing observable —
    // verdicts are pair-determined (BucketedSpec pins est-for-est
    // equality with the combined layout), so the oracle is q117's
    // replay verbatim.
    "q129_split_index_dedup" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |sg AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         |  FROM bands n JOIN bands o ON n.band = o.band AND n.bucket = o.bucket
         |  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0),
         |est AS (
         |  SELECT new_id, old_id,
         |    len(list_filter(range(16), i -> a.sig[i+1] = b.sig[i+1]))::DOUBLE / 16 AS ej
         |  FROM cand JOIN sg a ON new_id = a.doc_id JOIN sg b ON old_id = b.doc_id),
         |hits AS (
         |  SELECT new_id, count(*)::BIGINT AS n_dup_matches,
         |    min(old_id)::BIGINT AS dup_of, round(max(ej), 6) AS est_jaccard
         |  FROM est WHERE ej >= 0.5 GROUP BY new_id)
         |SELECT d.doc_id AS new_id,
         |  coalesce(n_dup_matches, 0)::BIGINT AS n_dup_matches,
         |  dup_of, est_jaccard, coalesce(n_dup_matches, 0) > 0 AS is_dup
         |FROM documents d LEFT JOIN hits ON d.doc_id = hits.new_id
         |WHERE d.doc_id % 5 = 0 ORDER BY new_id""".stripMargin,

    // q130/q131: the dHash fixture's pixel values are pure integer
    // arithmetic in (doc_id, x, y) (ops/ImageHash.fixtureGray), so the
    // oracle computes every hash bit as a SQL comparison of adjacent
    // pixels and packs the 16-bit blocks with shift-free integer sums —
    // replaying PNG encode → ImageIO decode → raster read → bit packing
    // without touching a byte of image data (the q28 convention).
    "q130_image_dhash" ->
      s"""WITH px AS (
         |  SELECT d.doc_id, x.x, y.y, ${fixtureGraySql("d.doc_id")} AS g
         |  FROM documents d, generate_series(0,8) x(x), generate_series(0,7) y(y)),
         |bits AS (
         |  SELECT l.doc_id, l.y*8 + l.x AS k,
         |    CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
         |  FROM px l JOIN px r ON r.doc_id = l.doc_id AND r.y = l.y AND r.x = l.x + 1
         |  WHERE l.x < 8)
         |SELECT doc_id AS media_id,
         |  sum(CASE WHEN k // 16 = 0 THEN bit * (1 << (k % 16)) ELSE 0 END)::BIGINT AS b0,
         |  sum(CASE WHEN k // 16 = 1 THEN bit * (1 << (k % 16)) ELSE 0 END)::BIGINT AS b1,
         |  sum(CASE WHEN k // 16 = 2 THEN bit * (1 << (k % 16)) ELSE 0 END)::BIGINT AS b2,
         |  sum(CASE WHEN k // 16 = 3 THEN bit * (1 << (k % 16)) ELSE 0 END)::BIGINT AS b3
         |FROM bits GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // q131: same fixture plus perturbed copies; candidates via the same
    // 4x16-bit block collision the Spark side uses (both EXACT for
    // hamming <= 3 by pigeonhole, so blocking parity is semantic, not
    // coincidental), verified by per-bit comparison.
    "q131_image_neardup" ->
      s"""WITH media AS (
         |  SELECT doc_id AS media_id, doc_id AS pid, FALSE AS perturb FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000000, doc_id, TRUE FROM documents WHERE doc_id % 17 = 0),
         |gx AS (
         |  SELECT m.media_id, m.pid, m.perturb, x.x, y.y,
         |    ${fixtureGraySql("m.pid")} AS g0
         |  FROM media m, generate_series(0,8) x(x), generate_series(0,7) y(y)),
         |px AS (
         |  SELECT media_id, x, y,
         |    CASE WHEN perturb AND x = pid % 9 AND y = pid % 8
         |      THEN (g0 + 128) % 256 ELSE g0 END AS g
         |  FROM gx),
         |bits AS (
         |  SELECT l.media_id, l.y*8 + l.x AS k,
         |    CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
         |  FROM px l JOIN px r ON r.media_id = l.media_id AND r.y = l.y AND r.x = l.x + 1
         |  WHERE l.x < 8),
         |blocks AS (
         |  SELECT media_id, k // 16 AS blk,
         |    sum(bit * (1 << (k % 16)))::BIGINT AS v
         |  FROM bits GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
         |  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.v = b.v
         |    AND a.media_id < b.media_id),
         |ham AS (
         |  SELECT c.id_a, c.id_b,
         |    sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END)::BIGINT AS hamming
         |  FROM cand c
         |  JOIN bits ba ON ba.media_id = c.id_a
         |  JOIN bits bb ON bb.media_id = c.id_b AND bb.k = ba.k
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // q118: the q106 replace-chain at 256 merges applied to the
    // per-(source, word-type) frame, then the fertility aggregation
    // (bytes via strlen = UTF-8 octets, matching Spark's
    // length(encode(w, 'UTF-8'))).
    "q118_fertility" -> {
      val merges = graft.ops.Bpe.syntheticMerges(256)
      val rounds = merges.grouped(32).zipWithIndex.map { case (chunk, i) =>
        val chained = chunk.foldLeft("st") { case (acc, (l, r)) =>
          s"replace($acc, chr(1)||'$l'||chr(1)||chr(1)||'$r'||chr(1), chr(1)||'${l + r}'||chr(1))"
        }
        s"d${i + 1} AS (SELECT source, w, cnt, $chained AS st FROM d$i)"
      }.mkString(",\n")
      val last = (merges.size + 31) / 32
      s"""WITH tok AS (SELECT source, unnest($tokensSql) AS w FROM documents),
         |wc AS (SELECT source, w, count(*) AS cnt FROM tok
         |       WHERE NOT contains(w, chr(1)) GROUP BY source, w),
         |d0 AS (SELECT source, w, cnt,
         |  chr(1) || array_to_string(list_append(regexp_split_to_array(w, ''), '</w>'), chr(1)||chr(1)) || chr(1) AS st
         |  FROM wc),
         |$rounds,
         |seg AS (SELECT source, w, cnt,
         |  len(string_split(trim(st, chr(1)), chr(1)||chr(1)))::BIGINT AS n_sub
         |  FROM d$last)
         |SELECT source, sum(cnt)::BIGINT AS n_word_tokens,
         |  count(*)::BIGINT AS n_word_types,
         |  sum(cnt * strlen(w))::BIGINT AS n_bytes,
         |  sum(cnt * n_sub)::BIGINT AS n_subwords,
         |  round(sum(cnt * strlen(w))::DOUBLE / sum(cnt * n_sub), 6) AS bytes_per_subword,
         |  round(sum(cnt * n_sub)::DOUBLE / sum(cnt), 6) AS subwords_per_word
         |FROM seg GROUP BY source ORDER BY source""".stripMargin
    },

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

    // q121: the (hash, source, n_docs) frame self-joined on hash —
    // the aggregated frame, never the corpus; same planted mirror
    // docs unioned in.
    "q121_dup_matrix" ->
      s"""WITH docs AS (
         |  SELECT source, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $mirrorValuesSql) v(source, text)),
         |hs AS (
         |  SELECT md5(text) AS h, source, count(*)::BIGINT AS nd
         |  FROM docs GROUP BY 1, 2)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  count(*)::BIGINT AS n_shared_texts,
         |  sum(a.nd)::BIGINT AS n_docs_a, sum(b.nd)::BIGINT AS n_docs_b
         |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // q122: distinct-shingle doc frequency via the same count-over-
    // partition window, per-doc unique fraction, left-join spine
    // (shingle-less docs novelty NULL).
    "q122_novelty" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |wd AS (SELECT doc_id, count(*) OVER (PARTITION BY s) AS df FROM sh),
         |agg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_shingles,
         |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
         |  FROM wd GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_shingles, 0)::BIGINT AS n_shingles,
         |  coalesce(n_unique, 0)::BIGINT AS n_unique,
         |  round(n_unique::DOUBLE / n_shingles, 6) AS novelty
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q123: the q50 candidate+verify chain, Jaccard ROUNDED 6 before
    // both the threshold and the micro-unit mean (mirrors the
    // engine's filter-on-rounded semantics exactly).
    "q123_neardup_matrix" ->
      s"""WITH sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |ver AS (
         |  SELECT c.id_a, c.id_b,
         |    round(inter.i::DOUBLE / (s1.n + s2.n - inter.i), 6) AS j
         |  FROM cand c
         |  JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
         |  JOIN sizes s1 ON c.id_a = s1.doc_id JOIN sizes s2 ON c.id_b = s2.doc_id
         |  WHERE round(inter.i::DOUBLE / (s1.n + s2.n - inter.i), 6) >= 0.8)
         |SELECT least(da.source, db.source) AS src_a,
         |  greatest(da.source, db.source) AS src_b,
         |  count(*)::BIGINT AS n_pairs,
         |  round(sum(round(j * 1000000)::BIGINT)::DOUBLE / 1000000 / count(*), 6)
         |    AS mean_jaccard
         |FROM ver JOIN documents da ON ver.id_a = da.doc_id
         |JOIN documents db ON ver.id_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // q124: the q50 cluster chain, then keep = highest quality per
    // cluster (ttr milli, tie smallest id) instead of smallest id.
    "q124_quality_dedup" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, s FROM ${shinglesSql("x")}),
         |mh AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || '|' || s)) AS m
         |  FROM sh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, md5(string_agg(m, '|' ORDER BY i)) AS bucket
         |  FROM mh GROUP BY doc_id, i // 4),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |verified AS (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
         |  JOIN sizes s1 ON c.id_a = s1.doc_id JOIN sizes s2 ON c.id_b = s2.doc_id
         |  WHERE round(inter.i::DOUBLE / (s1.n + s2.n - inter.i), 6) >= 0.8),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM verified
         |  UNION SELECT id_b, id_a FROM verified),
         |reach(n, m) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m),
         |labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n),
         |scored AS (
         |  SELECT doc_id,
         |    ((1000 * len(list_distinct($tokensSql)))
         |      // greatest(len($tokensSql), 1))::BIGINT AS quality_milli
         |  FROM documents),
         |res AS (
         |  SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster_id,
         |    s.quality_milli
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |  JOIN scored s ON d.doc_id = s.doc_id)
         |SELECT doc_id, cluster_id, quality_milli,
         |  row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY quality_milli DESC, doc_id) = 1 AS keep
         |FROM res ORDER BY doc_id""".stripMargin,

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

    // q126: the q86 assignment CTE (argmin, cid tie-break) + the
    // majority window on the (cluster, label) frame.
    "q126_cluster_purity" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, e.label, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |assign AS (SELECT vec_id, label, cid AS cluster FROM dist WHERE rn = 1),
        |cl AS (SELECT cluster, label, count(*)::BIGINT AS n FROM assign GROUP BY 1, 2),
        |tot AS (SELECT cluster, sum(n)::BIGINT AS n_vecs FROM cl GROUP BY 1),
        |mx AS (SELECT cluster, label, n FROM (
        |    SELECT cluster, label, n,
        |      ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn
        |    FROM cl) WHERE rn = 1)
        |SELECT t.cluster, t.n_vecs, mx.label AS majority_label,
        |  mx.n AS n_majority, round(mx.n::DOUBLE / t.n_vecs, 6) AS purity
        |FROM tot t JOIN mx USING (cluster) ORDER BY cluster""".stripMargin,

    // q127: q86's micro-unit per-dim SUM replay keyed by label — the
    // exact integer sum vectors feed the cosine directly (cosine is
    // scale-invariant; no intermediate rounding, so no double-rounding
    // boundary for the engines to disagree on).
    "q127_label_separation" ->
      """WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |comp AS (
        |  SELECT label, s.i AS dim, round(s.x * 1000000)::BIGINT AS m
        |  FROM (SELECT label,
        |          unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
        |        FROM e) u),
        |agg AS (SELECT label, dim, count(*)::BIGINT AS n, sum(m)::BIGINT AS ms
        |        FROM comp GROUP BY 1, 2),
        |cent AS (
        |  SELECT label, max(n)::BIGINT AS n_vecs,
        |    list(ms::DOUBLE ORDER BY dim) AS c
        |  FROM agg GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  a.n_vecs AS n_a, b.n_vecs AS n_b,
        |  round(list_dot_product(a.c, b.c) /
        |    (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c))), 6)
        |    AS cosine
        |FROM cent a JOIN cent b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,

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
         |FROM cells""".stripMargin)
}
