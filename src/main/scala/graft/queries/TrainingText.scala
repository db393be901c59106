package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Bpe, Curation, Dedup, Relevance, TextOps}

/** Text analysis / tokenization family: quality scoring, language id, fingerprinting, CJK curation, BPE train/apply/vocab, TF-IDF, BM25, LM scoring, inverted index, posting compression, vocabulary coverage and novelty.
  *
  * Split from the monolithic TrainingData registry by domain (round
  * 10, maintainability only): every query's Spark definition and its
  * DuckDB oracle SQL live in THIS file, in the same key order, so a
  * semantics change cannot land on one side without the other being
  * one screen away. Registered through [[TrainingData]]. */
private[queries] object TrainingText {
  import TrainingShared._

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
        threshold = 0.8, shingleSize = 3, maxShingleFreq = Dedup.shingleCapForPairBudget(500))
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
      // (a pre-tokenize repartition was measured WORSE here — 0.79 →
      // 1.15 s: tfIdf's window chain re-shuffles by doc anyway, so the
      // extra exchange only added a stage)
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

    // BPE merge induction: 8 merges learned from the corpus — one
    // corpus pass for word counts, then vocab-sized sentinel-replace
    // rounds with a 1-row argmax each. The merge table IS the output
    // (the artifact a subword tokenizer ships).
    "q87_bpe_merges" -> ((s, d) => {
      Bpe.trainBpe(t(s, d, "documents"), "text", merges = 8, minPairCount = 2)
        .orderBy(col("rank"))
    }),

    // CCNet-style LM quality score: add-0.5-smoothed bigram model
    // trained on the src0-excluded corpus scores every document —
    // the "perplexity filter" with an honest self-trained model.
    "q75_lm_score" -> ((s, d) => {
      // widen BEFORE the bigram explodes (the q130 doctrine, r16): the
      // docs-side bigram pass ran 556 ms on ONE task of the
      // single-split scan (stage probe); the LM side's unigram/bigram
      // aggregations ride the same exchange
      val docs = t(s, d, "documents").widenedScan
      Relevance.bigramLmScore(docs, docs.filter(col("source") =!= "src0"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
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
      // token → id as a PLAN-EMBEDDED map (r15): a BPE vocabulary is
      // the alphabet plus one token per merge rule — bounded by the
      // merge table the query already collects, never by the corpus —
      // so the id mapping is a per-row transform over the segmented
      // array. The r14 form exploded every (doc, ix, token) row into a
      // join + corpus-wide groupBy + sort_array(collect_list) — three
      // token-row stages (and the final orderBy's range sample
      // re-computed the aggregation: two ~790 ms single-task stages at
      // sf0.1) for what one projection computes in doc order for free.
      val ids = Bpe.vocabIds(Bpe.tokenCounts(wc, merges))
        .select(col("token"), col("token_id")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val idMap = typedLit(ids)
      docs
        // repartition BEFORE the segmentation (the q130 doctrine): the
        // single-row-group testdata parquet scans as ONE task and the
        // merge cascade ran serial (834 ms) without it
        .widenedScan
        .select(col("doc_id"),
          transform(Bpe.subwordTokens(col("text"), merges),
            tk => element_at(idMap, tk).cast("string")).as("idstr"))
        .select(col("doc_id"),
          size(col("idstr")).cast("long").as("n_tokens"),
          when(size(col("idstr")) === 0, lit(null).cast("string"))
            .otherwise(md5(concat_ws(" ", col("idstr")))).as("ids_hash"))
        // materialization barrier before the final sort (the q130
        // doctrine): the range sample otherwise re-runs the cascade
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .orderBy(col("doc_id"))
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

    // Vocabulary coverage curve: corpus-token share of the top-N types
    // at N = 100 / 1000 / 10000 — bounded TakeOrdered cutoffs, no
    // corpus-wide rank window.
    "q109_vocab_coverage" -> ((s, d) => {
      Relevance.vocabCoverage(t(s, d, "documents"), "text",
          sizes = Seq(100, 1000, 10000))
        .orderBy(col("vocab_size"))
    }),

    // Tokenizer fertility per source: bytes-per-subword and
    // subwords-per-word of a 256-merge table, computed over word
    // TYPES (Zipf: types ≪ tokens), one corpus explode.
    "q118_fertility" -> ((s, d) => {
      Bpe.fertilityAudit(t(s, d, "documents"), "source", "text",
          Bpe.syntheticMerges(256))
        .orderBy(col("source"))
    }),

    // N-gram novelty: the fraction of each doc's distinct trigrams
    // found nowhere else in the corpus — the informativeness signal
    // between exact dedup and pairwise near-dup.
    "q122_novelty" -> ((s, d) => {
      Relevance.noveltyScores(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // DOM-aware main-content extraction: each doc's text wrapped in a
    // full boilerplate page (nav, sidebar, link-dense "see also" +
    // related blocks, footer) — REAL tolerant-HTML parse + leaf-block
    // text/link-density scoring recovers exactly the article text plus
    // a planted link-free appendix. Even ids declare <article> (scope
    // rule); odd ids have no landmark, so the body walk must DROP the
    // boilerplate structurally — both paths, one oracle. The corpus-df
    // complement is q41; this needs no second corpus pass.
    "q146_main_content" -> ((s, d) => {
      val article = concat(
        lit("<html><head><title>Doc</title><script>track()</script></head>" +
          "<body><nav><a href=\"/\">Home</a> <a href=\"/a\">Archive</a> " +
          "<a href=\"/c\">Contact</a></nav>" +
          "<div class=\"sidebar\"><a>Latest</a> <a>Popular</a> <a>Tags</a>" +
          "</div><article><p>"),
        col("text"),
        lit("</p><p>Appendix "), col("doc_id"),
        lit(" carries deterministic replay filler prose for density " +
          "scoring.</p><p><a href=\"/r1\">See also one</a> " +
          "<a href=\"/r2\">See also two</a> " +
          "<a href=\"/r3\">See also three</a></p>" +
          "<div class=\"related\"><a>More one</a> <a>More two</a></div>" +
          "</article><footer><p><a>About</a> <a>Terms</a> <a>Privacy</a> " +
          "boilerplate footer text</p></footer></body></html>"))
      // same page without the <article>/<main> landmark: scope falls
      // back to <body>, so nav/sidebar/footer must die structurally
      val bare = regexp_replace(regexp_replace(article,
        lit("<article>"), lit("<div id=\"page\">")),
        lit("</article>"), lit("</div>"))
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.TextOps.mainContent(
            when(col("doc_id") % 2 === 0, article).otherwise(bare))
            .as("main_text"))
        .orderBy(col("doc_id"))
    })
  )

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
    "q87_bpe_merges" -> bpeOracleSql(8, 2),
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
         |-- the Spark side caps blocking at the budget-derived 1000: a
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

    "q73_vocab_build" ->
      s"""WITH toks AS (SELECT unnest($tokensSql) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
         |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 32)
         |SELECT row_number() OVER (ORDER BY cnt DESC, token) - 1 AS token_id,
         |  token, cnt
         |FROM top ORDER BY token_id""".stripMargin,

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
         |  CROSS JOIN v),
         |g AS (SELECT doc_id, count(*) AS n_bigrams,
         |  round(-(sum(lp)::DOUBLE / 1e12) / count(*), 6) AS lm_score
         |  FROM p GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(g.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  g.lm_score
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
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
    "q96_bpe_doc_ids" -> bpeDocIdsOracleSql(8, 2),

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

    // q146: by construction the extractor must return exactly the
    // article text (whitespace-normalized) plus the planted appendix
    // paragraph — every boilerplate block is either tag-dropped
    // (nav/footer/script), class-dropped (sidebar/related) or
    // link-density-dropped (the all-anchor "see also" paragraph), on
    // BOTH the <article>-scoped (even ids) and body-walk (odd ids)
    // paths. The oracle replays that contract, not the DOM walk: the
    // page synthesis is deterministic arithmetic around `text`.
    "q146_main_content" ->
      s"""SELECT doc_id,
         |  trim(regexp_replace(text, '\\s+', ' ', 'g')) || chr(10) ||
         |  'Appendix ' || doc_id ||
         |  ' carries deterministic replay filler prose for density scoring.'
         |  AS main_text
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
