package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Term-relevance scoring over the shared tokenizer: TF-IDF keyword
  * extraction and BM25 retrieval scoring — the ranking/selection
  * primitives of a data-curation pipeline (keyword-based filtering,
  * query-targeted corpus slicing, per-document topic signatures).
  *
  * Scale design: one explode per corpus scan feeding a
  * map-side-combined (doc, term) count; the document-frequency table is
  * a term-keyed aggregate of that same frame (no second corpus scan)
  * and joins back by term — vocabulary-sized, so AQE broadcasts it when
  * small and shuffle-joins otherwise; corpus-level scalars (N, avgdl)
  * ride a broadcast 1-row cross join, never a driver collect.
  * Arithmetic portability: `ln` + one division + round(…, 6); per-doc
  * sums over query terms are pivoted into fixed per-term columns summed
  * in a fixed order, because a floating-point SUM over a GROUP is
  * order-nondeterministic in any engine.
  */
object Relevance {

  @inline private def tokens(text: Column): Column = TextOps.tokens(text)

  /** Raw (doc, term) term frequencies: one explode, one
    * map-side-combined count. The building block both scorers share. */
  def termCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Consecutive-token bigrams of `text`, occurrence-preserving
    * ("a b a b" → ["a b", "b a", "a b"]) — unlike the dedup shingles,
    * a language model needs COUNTS, not membership. */
  private def bigrams(text: Column): Column = {
    val t = tokens(text)
    // clamp at 0: a 0/1-token doc has no bigrams, and slice() throws on
    // a negative length rather than returning empty
    val n = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** CCNet-style LM quality score: the average negative log-probability
    * of a document's token bigrams under an add-k-smoothed bigram model
    * trained on `lmCorpus` — low scores read like the reference corpus,
    * high scores are gibberish/boilerplate (the "perplexity filter" of
    * CCNet/Gopher pipelines, with an honest self-trained model instead
    * of a shipped binary). p(w2|w1) = (C(w1 w2) + k) / (C(w1) + k·V).
    *
    * Scale shape: bigram/unigram counts are map-side-combined
    * aggregates of one exploded pass over the LM corpus; the scored
    * corpus explodes once and joins the two count tables by key
    * (vocabulary-sized — AQE broadcasts small ones, shuffle-joins at
    * scale); V and the smoothing ride a broadcast 1-row frame. The
    * per-doc average is a SUM of ln terms — each ln converts to exact
    * integer PICO-units (×1e12, rounded, LONG) before summing, because
    * a float SUM over a group is order-nondeterministic in any engine
    * (the q51 doctrine) and cross-engine ln ulps sit far below the
    * half-unit boundary. Output: (doc_id, n_bigrams, lm_score) — docs
    * with no bigrams score null. */
  def bigramLmScore(docs: DataFrame, lmCorpus: DataFrame,
                    idCol: String, textCol: String,
                    k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val lmToks = lmCorpus.select(explode(tokens(col(textCol))).as("w"))
    val uni = lmToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bi = lmCorpus.select(explode(bigrams(col(textCol))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val docBi = docs
      .select(col(idCol).as("doc_id"), explode(bigrams(col(textCol))).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
    val p = docBi
      .join(bi, Seq("b"), "left")
      .join(uni, docBi("w1") === uni("w"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_pico", round(
        log((coalesce(col("c2"), lit(0L)).cast("double") + lit(k)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("v")))
          * lit(1e12), 0).cast("long"))
    val perDoc = p.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-(sum(col("lp_pico")).cast("double") / lit(1e12)) /
          count(lit(1)), 6).as("lm_score"))
    // absence is not silence (the dsirLogWeights discipline): a doc
    // with 0-1 tokens produces no bigram rows and would vanish from
    // the grouped frame — the contract says it scores null, so the
    // full id frame left-joins the scores back
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_score"))
  }

  /** Top-`topK` TF-IDF terms per document (smoothed idf, sklearn
    * convention: `idf = ln((1+N)/(1+df)) + 1`, score = tf · idf).
    * Ties rank by term for determinism. Output:
    * (doc_id, term, tf, score, rank). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String,
            topK: Int = 5): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    // document frequency as a term-partitioned window over the ALREADY
    // aggregated (doc, term) frame — NOT a groupBy(term) + join back:
    // Catalyst prunes the tf count out of that branch's aggregate,
    // which kills exchange reuse and re-scans + re-explodes the whole
    // corpus a second time (measured 2× on the sf0.1 bench). The
    // window shuffles only the vocabulary-×-docs counts frame.
    val wTerm = Window.partitionBy(col("term"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tc.withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf").cast("double") *
        (log((lit(1L) + col("n_docs")).cast("double") /
          (lit(1L) + col("df")).cast("double")) + lit(1.0)), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rank"))
  }

  /** Per-(doc, query-term) BM25 contribution scores (Robertson/Okapi;
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, tf saturation `k1`,
    * length normalization `b` against the corpus mean document length).
    * Returns one row per document per matched query term —
    * (doc_id, term, tf, dl, score) — deliberately UN-summed: the
    * cross-term total is a float sum whose order a GROUP BY does not
    * fix, so callers pivot fixed term columns (see [[bm25]]) or rank on
    * the contribution rows directly. */
  def bm25TermScores(df: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String], k1: Double = 1.2,
                     b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val docLens = df.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    // avgdl via exact integer sum ÷ count (not avg(): a float-buffer
    // average is partial-order-dependent once sums pass 2^53)
    val stats = broadcast(docLens.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("__dlsum"))
      .withColumn("avgdl", col("__dlsum").cast("double") / col("n_docs"))
      .drop("__dlsum"))
    val tc = termCounts(df, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
    // same term-window df as tfIdf — avoids a second corpus scan
    tc.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(docLens, Seq("doc_id"))
      .crossJoin(stats)
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("score", round(col("idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"), col("score"))
  }

  /** Top-`topK` documents by total BM25 score for a fixed query-term
    * list. The per-term contributions pivot into one column per query
    * term (each a max over ≤1 non-null value — no float-order hazard)
    * and total in the fixed `queryTerms` order, so the sum is
    * bit-reproducible in any engine. Output:
    * (doc_id, score, rank). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], topK: Int = 20,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val contrib = bm25TermScores(df, idCol, textCol, queryTerms, k1, b)
    // pivot columns are named by term INDEX, not term text: a term
    // containing '.' or '`' would break col()'s nested-field parsing,
    // and duplicate query terms would collide into one ambiguous name
    // (per-occurrence columns keep the standard BM25 duplicate-term
    // sum)
    val aggs = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("score"))).as(s"__s_$i") }
    val pivoted = contrib.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val total = queryTerms.indices.map(i => coalesce(col(s"__s_$i"), lit(0.0)))
      .reduce(_ + _)
    // global top-k runs as TakeOrderedAndProject (per-partition heaps,
    // driver merge of k·partitions rows) — ranking then touches only
    // the k survivors, never the corpus: collapse them to ONE sorted
    // array row and rank by position (no unpartitioned window). The
    // sort key negates the MICRO-scaled score as a LONG — scores are
    // round(·, 6), so ×1e6 is exactly integral, order-isomorphic to
    // (score DESC, doc_id ASC), and immune to the −0.0 ordering trap a
    // double negation would reopen.
    val top = pivoted.withColumn("score", round(total, 6))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    top
      .agg(sort_array(collect_list(struct(
        (-round(col("score") * lit(1e6))).cast("long").as("k"),
        col("doc_id").as("d"), col("score").as("s")))).as("__t"))
      .select(posexplode(col("__t")).as(Seq("__i", "__r")))
      .select(col("__r.d").as("doc_id"), col("__r.s").as("score"),
        (col("__i") + 1).cast("long").as("rank"))
  }

  /** BLOCKED inverted index: per (term, doc-id block), the
    * delta-encoded posting list — the searchable-corpus artifact
    * (keyword slicing, decontamination lookups, BM25 serving all read
    * postings), built with the segmenting trick every at-scale indexer
    * uses: postings shard by `doc_id >> blockBits`, so one group holds
    * at most 2^blockBits doc ids NO MATTER how common the term is. A
    * naive `groupBy(term).collect_list` puts a stopword's
    * corpus-sized posting list in one task; here the stopword costs
    * `n_docs / 2^blockBits` bounded groups spread across the shuffle,
    * and block-local delta gaps stay small (block-relative), which is
    * exactly what varint/PForDelta compression wants downstream.
    *
    * Gaps: first entry is relative to the block base
    * (`block << blockBits`), each later entry to its predecessor —
    * `ids = base + prefix-sums(gaps)` reconstructs exactly. `minDf`
    * drops hapax/rare terms by GLOBAL document frequency (a
    * sum-over-term-partition window on the block rows — index-sized,
    * never a second corpus scan or posting re-shuffle).
    *
    * Output: (term, block, df_block, gaps: array<long>), ONE
    * corpus-sized shuffle (the (term, block) aggregation) plus one
    * index-sized one (the df window). Ids must be non-negative and
    * UNIQUE (one row per document). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    blockBits: Int = 20, minDf: Long = 1L): DataFrame = {
    require(blockBits >= 1 && blockBits <= 62, "blockBits in [1, 62]")
    // the non-negative contract is ENFORCED, not just documented: a
    // negative id under shiftrightunsigned would silently land in a
    // garbage block with wrong gap bases; the guard lives in the value
    // path (not a droppable side column) so pruning can't remove it
    val rawId = col(idCol).cast("long")
    val guardedId = when(rawId < 0L, raise_error(concat(
        lit("invertedIndex: negative doc_id "), rawId.cast("string"))))
      .otherwise(rawId)
    // (doc, term) pairs are distinct BY CONSTRUCTION (r15): term
    // dedup within one document is a per-row array_distinct — the old
    // corpus-wide .distinct() shuffled every posting once more to
    // dedupe pairs that can only collide inside a single row. (Input
    // ids must be unique — one row per document — the same
    // precondition the gap encoding already needs.)
    val postings = df
      .select(guardedId.as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
    // one corpus-sized exchange: the (term, block) aggregation —
    // stopword postings spread across n_docs/2^blockBits bounded
    // groups exactly as before. The GLOBAL-df minDf filter then rides
    // a sum-over-term-partition WINDOW on the aggregated index rows
    // (vocab × blocks — 2^blockBits-fold smaller than postings)
    // instead of the old df-aggregate + left_semi join back, which
    // re-shuffled the full posting rows by term: a stopword's ENTIRE
    // posting list in one reduce partition, vs its block rows here.
    val blocked = postings
      .withColumn("block", shiftrightunsigned(col("doc_id"), blockBits))
      .groupBy(col("term"), col("block"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val kept =
      if (minDf <= 1L) blocked
      else {
        import org.apache.spark.sql.expressions.Window
        blocked
          .withColumn("__df",
            sum(size(col("ids")).cast("long"))
              .over(Window.partitionBy(col("term"))))
          .filter(col("__df") >= minDf)
          .drop("__df")
      }
    kept.select(col("term"), col("block"),
      size(col("ids")).cast("long").as("df_block"),
      transform(col("ids"), (x, i) =>
        x - when(i === 0, shiftleft(col("block"), blockBits))
          .otherwise(element_at(col("ids"), i))).as("gaps"))
  }

  /** Vocabulary coverage curve: for each candidate vocab size N, the
    * fraction of corpus token OCCURRENCES the top-N types cover
    * ((count DESC, token ASC) rank — [[graft.ops.Bpe.vocabIds]]'
    * convention) — the "how big must the vocabulary be" sizing plot
    * every tokenizer design starts from. Each cutoff is a bounded
    * TakeOrdered(N) + one sum over N rows — never a corpus-wide rank
    * window; the type table materializes once (eager checkpoint) and
    * feeds every cutoff plus the total.
    * Output: (vocab_size, covered, total, coverage round(…,6)). */
  def vocabCoverage(df: DataFrame, textCol: String,
                    sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ > 0), "sizes must be positive")
    val counts = df
      .select(explode(tokens(col(textCol))).as("tk"))
      .groupBy(col("tk")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("n")).as("total"))
    sizes.sorted.map { k =>
      counts.orderBy(col("n").desc, col("tk")).limit(k)
        .agg(sum(col("n")).as("covered"))
        .select(lit(k.toLong).as("vocab_size"), col("covered"))
    }.reduce(_.unionByName(_))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("covered"), col("total"),
        round(col("covered").cast("double") / col("total"), 6).as("coverage"))
  }

  /** Storage accounting for [[invertedIndex]]: per term, the EXACT
    * Elias-γ-coded size of its delta-encoded postings next to the
    * fixed-width 64-bit baseline — the "will the index fit?" planning
    * number at 100 TB, where posting compression decides whether the
    * index is a sidecar or a second corpus. γ(x) costs
    * `2·bitlen(x) − 1` bits and is defined on POSITIVE ints, so gaps
    * encode as gap+1 (a block's first gap can be 0 at the base).
    * All-integer per-array folds — no explode (gaps stay packed), no
    * float discipline; one vocabulary-sized aggregation over the index
    * frame. Output: (term, n_blocks, df, elias_bits, fixed_bits,
    * ratio round(…,6)). */
  def postingSizeStats(df: DataFrame, idCol: String, textCol: String,
                       blockBits: Int = 20, minDf: Long = 1L): DataFrame = {
    invertedIndex(df, idCol, textCol, blockBits, minDf)
      .select(col("term"), col("df_block"),
        aggregate(col("gaps"), lit(0L), (acc, g) =>
          acc + (lit(2) * length(bin(g + 1)) - 1).cast("long")).as("bits"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("df_block")).as("df"),
        sum(col("bits")).as("elias_bits"))
      .withColumn("fixed_bits", col("df") * 64L)
      .withColumn("ratio",
        round(col("elias_bits").cast("double") / col("fixed_bits"), 6))
  }

  /** N-gram NOVELTY score: per document the fraction of its distinct
    * shingles that appear in NO other document (corpus document
    * frequency 1) — high novelty marks genuinely new content worth
    * keeping; near-zero novelty marks recombined boilerplate that
    * n-gram dedup thresholds may still pass. The informativeness
    * signal between exact dedup (whole-text) and near-dup (pairwise):
    * it prices each document against the WHOLE corpus in one number.
    *
    * Scale shape: one distinct-shingle explode; document frequency
    * rides a count-over-shingle-partition window on that same pass
    * (the [[graft.ops.Dedup.paragraphDedup]] single-evaluation
    * discipline — a groupBy+join-back form would evaluate the explode
    * twice); then one per-doc aggregation. Hot-shingle windows spill,
    * never OOM (bounded by the shingle's doc frequency).
    *
    * Output: every input doc — (doc_id, n_shingles, n_unique,
    * novelty = n_unique/n_shingles round 6, null when the doc has no
    * shingles). */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol).as("doc_id"),
      explode(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
    val agg = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("df") === 1, lit(1))).as("n_unique"))
    df.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        round(col("n_unique").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
  }
}
