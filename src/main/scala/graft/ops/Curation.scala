package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Corpus-curation operators for LLM training-data pipelines — the
  * filters that run between raw crawl and tokenizer at 100 TB:
  * heuristic quality rules (Gopher §A1.1 / C4-style), PII scrubbing,
  * benchmark decontamination, per-domain caps and stratified sampling.
  *
  * Scale design: every operator is a pure column expression or a
  * window/semi-join over one shuffle key; the decontamination join
  * broadcasts the (small) benchmark shingle set. Arithmetic sticks to
  * integer counts and single divisions with round(…, 6) so DuckDB
  * oracles reproduce results exactly.
  */
object Curation {

  /** The family tokenizer — ONE definition repo-wide (CJK-aware: see
    * [[graft.functions.Tokenize]]); forwarding alias so Curation call
    * sites read unqualified. */
  @inline private def tokens(text: Column): Column = TextOps.tokens(text)

  /** Gopher-style repetition/quality metrics (Rae et al. 2021 §A1.1,
    * over the shared CJK-aware tokenizer — a Chinese/Japanese/Thai
    * document counts CHARACTERS as words, so `keep`'s word-count gate no
    * longer silently discards non-space-delimited languages): word
    * count, mean word length,
    * fraction of unique tokens — plus the keep decision with
    * Gopher-like thresholds. All integer-count arithmetic: exact in any
    * engine. */
  def gopherMetrics(text: Column): Column = {
    val toks = tokens(text)
    val wordCount = size(toks).cast("long")
    val charSum = aggregate(transform(toks, t => length(t)), lit(0L), (a, v) => a + v)
    val uniqueCount = size(array_distinct(toks)).cast("long")
    val meanLen = round(charSum.cast("double") / greatest(wordCount, lit(1L)), 6)
    val fracUnique = round(uniqueCount.cast("double") / greatest(wordCount, lit(1L)), 6)
    struct(
      wordCount.as("word_count"),
      meanLen.as("mean_word_len"),
      fracUnique.as("frac_unique"),
      (wordCount >= 3 && wordCount <= 100000 &&
        meanLen >= 1.0 && meanLen <= 12.0 &&
        fracUnique >= 0.2).as("keep"))
  }

  /** PII patterns — deliberately RE2-compatible (no lookarounds) so the
    * identical pattern runs in Spark (java.util.regex) and any
    * RE2-based engine (DuckDB, Go, …). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"

  /** Scrub emails/phones: counts + redacted text. One pass of column
    * expressions, no UDF. */
  def scrubPii(text: Column): Column = {
    val nEmails = size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
    val scrubbedEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val nPhones = size(regexp_extract_all(scrubbedEmail, lit(PhonePattern), lit(0))).cast("long")
    val scrubbed = regexp_replace(scrubbedEmail, PhonePattern, "<PHONE>")
    struct(nEmails.as("n_emails"), nPhones.as("n_phones"), scrubbed.as("scrubbed"))
  }

  /** Benchmark decontamination: for every candidate document, the
    * fraction of its distinct n-gram shingles that appear in the
    * benchmark corpus (eval-set leakage check). The benchmark shingle
    * set is small by nature (eval sets are KBs to MBs) — it broadcasts;
    * candidates shuffle once on doc id for the count aggregation.
    * Output: (doc_id, n_shingles, n_overlap, overlap_frac,
    * contaminated). */
  def decontaminate(candidates: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Single-pass shape: the candidate shingle frame is consumed ONCE —
    // a broadcast left-outer flag-join marks benchmark hits, and one
    // map-side-combinable groupBy(doc_id) counts total and hit shingles
    // together (count(col) skips the nulls of unmatched rows). The
    // candidate corpus is scanned and shingled exactly once; only
    // per-doc count partials ride the shuffle.
    // explode_OUTER + count(s): a candidate shorter than shingleSize
    // tokens yields an empty shingle array, and a plain explode would
    // drop it from the output entirely — it could then never be
    // flagged, and any inner-join composition would silently lose the
    // doc from the corpus. The outer null row keeps the doc at
    // n_shingles 0 (count(col) skips the null) inside the SAME
    // single-pass plan; frac is explicitly null at 0 shingles and
    // contaminated explicitly false (no evidence) in both engines.
    val candFlat = candidates.select(col(idCol).as("doc_id"),
      explode_outer(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
    val benchSet = benchmark
      .select(explode(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    candFlat.join(broadcast(benchSet), Seq("s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_shingles"), count(col("__hit")).as("n_overlap"))
      .withColumn("overlap_frac",
        when(col("n_shingles") > 0,
          round(col("n_overlap").cast("double") / col("n_shingles"), 6)))
      .withColumn("contaminated",
        coalesce(col("overlap_frac") >= threshold, lit(false)))
  }

  /** Canonical text normalization for duplicate detection: lowercase,
    * non-alphanumerics to spaces, whitespace collapsed, trimmed —
    * `"Hello,  World!"` and `"hello world"` hash identically. Pure
    * column expression (regex classes shared by Java regex and RE2, so
    * DuckDB reproduces it). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))

  /** Within-document repetition metrics — the remaining Gopher §A1.1
    * signals: `top_token_frac` (share of the most frequent token) and
    * `dup_ngram_frac` (1 − distinct/total n-grams). One shuffle on
    * (doc, token) with map-side combine; the n-gram part is per-row
    * size arithmetic. Output: (doc_id, n_tokens, top_token_frac,
    * dup_ngram_frac). */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    // The tokenizer (a regexp split) runs ONCE per row per scan: the
    // per-row frame computes sizes only (total_grams derives from
    // n_tokens in a later projection — CollapseProject keeps the
    // non-cheap twice-referenced size() in its own Project, and the
    // interpreted HOF chain gets no codegen subexpression elimination,
    // so inlining it would re-split per reference), and the top-token
    // scan tokenizes once into its explode.
    val gram = df.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        size(TextOps.distinctShingles(col(textCol), n)).cast("long").as("distinct_grams"))
      .withColumn("total_grams", greatest(col("n_tokens") - (n - 1), lit(0L)))
    val topCounts = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tk"))
      .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_count"))
    gram
      .join(topCounts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        round(coalesce(col("top_count"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6).as("top_token_frac"),
        when(col("total_grams") === 0L, lit(0.0))
          .otherwise(round(lit(1.0) - col("distinct_grams").cast("double") /
            col("total_grams"), 6)).as("dup_ngram_frac"))
  }

  /** Exact-count deterministic per-stratum sampling: exactly
    * `perStratum` docs from every stratum (fewer when the stratum is
    * smaller), chosen by a pseudo-random-but-stable md5 order of the id
    * (ties by id). Unlike [[stratifiedSample]]'s rate gate this
    * guarantees COUNTS — the balanced-mix primitive. One shuffle on the
    * stratum key (window top-k → WindowGroupLimit prunes per
    * partition). */
  def stratifiedTake(docs: DataFrame, stratumCol: String, idCol: String,
                     perStratum: Int): DataFrame = {
    val orderKey = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col(stratumCol)).orderBy(orderKey, col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Corpus-level boilerplate detection (the C4-style "site template"
    * filter): a shingle appearing in at least `minDocFreq` distinct
    * documents is boilerplate; each document is scored by the fraction
    * of its distinct shingles that are boilerplate and kept while the
    * fraction stays under `threshold`.
    *
    * Scale shape: one shuffle keys the exploded shingles (map-side
    * combined document-frequency count); the hot-shingle set is tiny by
    * construction (high-df survivors of a heavy-tailed distribution) so
    * the overlap join stays cheap — AQE broadcasts it at runtime.
    * Output: (doc_id, n_shingles, n_boiler, boiler_frac, keep). */
  def boilerplateMetrics(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3, minDocFreq: Int = 100,
                         threshold: Double = 0.5): DataFrame = {
    // Two corpus scans, minimal shuffle: scan 1 derives the hot set via
    // a map-side-combined groupBy(s) (per-task partials — Zipf-heavy
    // shingle counts collapse before the network); scan 2 flag-joins
    // the (AQE-broadcast, tiny-by-construction) hot set and computes
    // n_shingles AND n_boiler in ONE map-side-combinable
    // groupBy(doc_id), so only per-doc count partials shuffle.
    //
    // Deliberately NOT one scan: de-duplicating the scan needs either a
    // persist of the exploded shingle frame (corpus × tokens rows —
    // multi-PB at the 100 TB target, not cacheable) or a count() window
    // over s (ships EVERY shingle row through one un-combined Exchange
    // and buffers per-key frames — strictly more network than two
    // combined scans). Recompute is CPU; the shuffle is the scarce
    // resource at scale.
    // explode_outer + count(s) in the per-doc pass: short docs stay in
    // the output at n_shingles 0 / keep true (no boilerplate
    // evidence); the hot-set pass filters the null rows out so the
    // df counts are untouched
    val flat = df.select(col(idCol).as("doc_id"),
      explode_outer(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
    val hot = flat.filter(col("s").isNotNull)
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq).select(col("s"))
      .withColumn("__hot", lit(1))
    flat.join(hot, Seq("s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_shingles"), count(col("__hot")).as("n_boiler"))
      .withColumn("boiler_frac",
        when(col("n_shingles") > 0,
          round(col("n_boiler").cast("double") / col("n_shingles"), 6)))
      .withColumn("keep", coalesce(col("boiler_frac") < threshold, lit(true)))
  }

  /** Per-domain cap: keep at most `maxPerDomain` documents per domain,
    * best-first by `qualityCol` (ties broken by id for determinism).
    * The anti-over-representation filter of web corpora: one shuffle on
    * the domain key. */
  def domainCap(docs: DataFrame, domainCol: String, qualityCol: String,
                idCol: String, maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  /** Fixed-size token chunking with overlap — context-window prep:
    * document i yields chunks starting every `size - overlap` tokens,
    * each `size` tokens long (the tail chunk may be shorter). One
    * explode per document, no shuffle; pure integer arithmetic, so any
    * engine reproduces the chunk boundaries. Output columns: chunk_ix,
    * chunk_tokens (count) and the chunk itself. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int = 0): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val step = size - overlap
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
      .select(col(idCol),
        explode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("__toks")) - 1,
          lit(step))).as("__start"), col("__toks"))
      .select(col(idCol),
        (col("__start") / step).cast("long").as("chunk_ix"),
        slice(col("__toks"), col("__start") + 1, lit(size)).as("__chunk"))
      .select(col(idCol), col("chunk_ix"),
        org.apache.spark.sql.functions.size(col("__chunk")).cast("long").as("chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Content-defined chunking: boundaries follow the TEXT (hash-gated
    * trailing windows — `graft_cdc_chunks`), so an insertion near the
    * start shifts every [[chunk]] window but leaves most CDC chunks —
    * and therefore their dedup hashes — intact. The operator surface
    * for chunk-level dedup of near-identical documents: explode, hash,
    * group. One projection per doc, no shuffle; expected chunk length
    * ≈ `divisor` chars. Output: (id, chunk_ix, chunk, n_chars). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                window: Int = 8, divisor: Int = 64,
                spreadPartitions: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // O(chars) digests per doc makes this COMPUTE-bound, so parallelism
    // must not be input-split-bound: a corpus far smaller than one
    // split (a dev SF, a filtered slice) runs the whole pass on one
    // core unless spread. spreadPartitions > 0 repartitions first — at
    // real scale splits already abound and the knob stays 0.
    val input = if (spreadPartitions > 0) df.repartition(spreadPartitions) else df
    // the empty-text filter guarantees non-empty chunk arrays, so the
    // OUTER posexplode never emits null rows AND never plans the
    // size>0 re-evaluation filter the non-outer form costs
    input.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        posexplode_outer(call_function("graft_cdc_chunks",
          col(textCol), lit(window), lit(divisor)))
          .as(Seq("chunk_ix", "chunk")))
      .select(col(idCol), col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk"), length(col("chunk")).cast("long").as("n_chars"))
  }

  /** Deterministic greedy sequence packing: within each shard
    * (`shardCol` — packing is embarrassingly parallel per shard, which
    * is what makes it scale; a GLOBAL running sum would serialize), docs
    * in id order accumulate token counts and bin = cumulative-before /
    * window. Integer arithmetic end-to-end: any engine reproduces the
    * same bins. Output adds `bin` and `bin_offset` (token offset of the
    * doc inside its running total). */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
                    textCol: String, window: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("bin_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", (col("bin_offset") / window).cast("long"))
  }

  /** Boundary-respecting greedy packing (first-fit in id order). Unlike
    * [[packSequences]] — concat-and-split, where a document's tokens can
    * straddle a bin boundary — a document that would overflow the
    * window STARTS A NEW BIN, so no bin exceeds `window` unless a
    * single oversized document does (that document sits alone).
    *
    * The fill level is a non-linear recurrence
    * (`fill' = if (fill + n > w) n else fill + n`), which no window
    * function expresses — so each shard runs a sequential pass:
    * shards hash-partition across executors (packing is embarrassingly
    * parallel per shard; that is what makes it scale) and rows stream
    * through constant per-shard state. The RDD drop is confined to this
    * one segment Catalyst cannot express — documented per the
    * repo-wide "no RDD unless justified" rule.
    *
    * Output: (shardCol string, idCol long, n_tokens, bin, bin_offset) —
    * bins and offsets count per shard from 0.
    */
  def packSequencesGreedy(docs: DataFrame, shardCol: String, idCol: String,
                          textCol: String, window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val spark = docs.sparkSession
    val prepared = docs
      .select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("id"),
        // null text counts 0 tokens — the sequential pass reads the
        // count as a primitive long and must never see a null
        coalesce(size(tokens(col(textCol))), lit(0)).cast("long").as("n"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    val schema = StructType(Seq(
      StructField(shardCol, StringType),
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType),
      StructField("bin", LongType, nullable = false),
      StructField("bin_offset", LongType, nullable = false)))
    val packed = prepared.rdd.mapPartitions { it =>
      // a partition holds whole shards (hash-partitioned on shard) in
      // (shard, id) order; state resets at every shard change
      var shard: String = null
      var started = false
      var fill = 0L
      var bin = 0L
      it.map { r =>
        val s = r.getString(0)
        val id = r.getLong(1)
        val n = r.getLong(2)
        if (!started || s != shard) { shard = s; fill = 0L; bin = 0L; started = true }
        if (fill > 0 && fill + n > window) { bin += 1; fill = 0L }
        val off = fill
        fill += n
        Row(s, id, n, bin, off)
      }
    }
    spark.createDataFrame(packed, schema)
  }

  /** Bit positions of shingle `s` in a `nBits`-bit bloom filter:
    * hash i = u60(first 15 md5 hex chars of "i|s") mod nBits — no RNG,
    * no seed state, reproducible in any engine with md5 (DuckDB:
    * `('0x' || substr(md5(i || '|' || s), 1, 15))::UBIGINT % nBits`). */
  def bloomPositions(s: Column, nBits: Int, nHashes: Int): Column =
    array((0 until nHashes).map { i =>
      conv(substring(md5(concat(lit(s"$i|"), s)), 1, 15), 16, 10)
        .cast("long") % nBits
    }: _*)

  /** Build the benchmark bloom bitmap as packed longs. The aggregation
    * is distributed (map-side-combined bit_or per 64-bit word); only
    * the FILTER reaches the driver — ≤ nBits/64 rows no matter how
    * large the benchmark corpus is. That bound is the point: the
    * membership structure stays O(nBits) while the benchmark grows. */
  def bloomBuild(benchmark: DataFrame, textCol: String, shingleSize: Int,
                 nBits: Int, nHashes: Int): Array[Long] = {
    require(nBits % 64 == 0 && nBits > 0, "nBits must be a positive multiple of 64")
    val words = benchmark
      .select(explode(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
      .select(explode(bloomPositions(col("s"), nBits, nHashes)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("mask"))
      .collect()
    val bitmap = new Array[Long](nBits / 64)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** True when every hash position of `s` is set in `bitmap` — the
    * standard bloom maybe-contains check as a pure column expression
    * over the plan-embedded bitmap literal (ships once per executor
    * with the task binary, like a broadcast). */
  def bloomMightContain(bitmap: Array[Long], s: Column, nBits: Int,
                        nHashes: Int): Column = {
    val bm = typedlit[Seq[Long]](bitmap.toSeq)
    (0 until nHashes).map { i =>
      val pos = conv(substring(md5(concat(lit(s"$i|"), s)), 1, 15), 16, 10)
        .cast("long") % nBits
      element_at(bm, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-filter benchmark decontamination — [[decontaminate]]'s
    * 100 TB form: the candidate side never joins, shuffles, or sees the
    * benchmark rows; each candidate shingle tests `nHashes` md5 probes
    * against an O(nBits) bitmap and ONE map-side-combined
    * groupBy(doc_id) counts totals and maybe-hits together. False
    * positives are inherent bloom semantics (rate ≈ (1−e^(−kn/m))^k)
    * and are DETERMINISTIC here — md5-derived positions make the same
    * shingles collide in every engine, so results stay exactly
    * reproducible. Output: (doc_id, n_shingles, n_maybe, maybe_frac,
    * contaminated). */
  def decontaminateBloom(candidates: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         shingleSize: Int = 3, threshold: Double = 0.5,
                         nBits: Int = 1 << 14, nHashes: Int = 3): DataFrame = {
    val bitmap = bloomBuild(benchmark, textCol, shingleSize, nBits, nHashes)
    // explode_outer + count(s): short docs stay in the output at
    // n_shingles 0 / contaminated false (the [[decontaminate]]
    // contract — a plain explode would silently drop them)
    candidates
      .select(col(idCol).as("doc_id"),
        explode_outer(TextOps.distinctShingles(col(textCol), shingleSize)).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_shingles"),
        count(when(bloomMightContain(bitmap, col("s"), nBits, nHashes), lit(1)))
          .as("n_maybe"))
      .withColumn("maybe_frac",
        when(col("n_shingles") > 0,
          round(col("n_maybe").cast("double") / col("n_shingles"), 6)))
      .withColumn("contaminated",
        coalesce(col("maybe_frac") >= threshold, lit(false)))
  }

  /** Deterministic hash-based stratified sampling: a document is kept
    * when u32(first 8 md5 hex chars of its id) mod 100 falls under its
    * stratum's percentage. No RNG state, no seed coordination across
    * executors — the sample is a pure function of the id, reproducible
    * in any engine with md5. `rates`: stratum value → percent (0-100);
    * `defaultRate` applies to unlisted strata. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** Temperature-scaled domain mixture sampling — the "rebalance the
    * corpus toward rare domains" step of a training-data mix: domain d
    * with n_d rows gets sampling weight n_d^alpha / Σ n^alpha, so
    * alpha = 1 preserves the natural mix, alpha = 0 flattens to uniform
    * across domains, and intermediate alpha up-weights rare domains
    * (the multilingual-balance trick). Each row then keeps
    * independently with its domain's rate `target·w_d / n_d`, decided
    * by the same md5-uniform gate as [[stratifiedSample]] — a pure
    * function of the id, so the realized sample (not just its expected
    * size) is reproducible in any engine with md5.
    *
    * Scale shape: one domain-count aggregation (map-side combined,
    * domain-cardinality rows), the weight normalizer reuses that
    * aggregation's exchange, and the per-domain rates BROADCAST back
    * onto the corpus — the corpus itself shuffles zero times. Rates
    * round to 9 decimals so `pow` ulp differences between engines
    * cannot flip a row across the gate. Null-domain rows drop (no
    * null join key, SQL semantics) — route them to a sentinel domain
    * upstream if they must sample. */
  def mixtureSample(docs: DataFrame, domainCol: String, idCol: String,
                    alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must lie in [0, 1]")
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val wsum = counts.agg(sum(pow(col("__n"), alpha)).as("__wsum"))
    val rates = counts.crossJoin(broadcast(wsum))
      .select(col(domainCol),
        least(lit(1.0), round(lit(targetRows.toDouble) * pow(col("__n"), alpha)
          / col("__wsum") / col("__n"), 9)).as("__rate"))
    val u = (graft.ops.Sketches.hash60(col(idCol)).cast("double") + 1.0) /
      math.pow(2.0, 60)
    docs.join(broadcast(rates), Seq(domainCol))
      .filter(u < col("__rate"))
      .drop("__rate")
  }

  /** Training-mix token accounting: given a TARGET mixture (domain →
    * weight, the config table every LLM run publishes) and a total
    * token budget, the per-domain token allocation and the EPOCHS each
    * domain must repeat to fill its slice — epochs > 1 is the
    * upsampling flag (the domain will be seen more than once; > ~4 is
    * the overfitting-risk line the mixing literature draws). The math
    * is one domain-keyed aggregation over the corpus (map-side
    * combined token sums) against a broadcast weight table — corpus
    * walked once, no matter how many mixes are auditioned. Domains
    * missing from `weights` get weight 0 (dropped from the mix but
    * still reported). Weighted targets use round-half-up to integer
    * tokens; epochs round(…,6).
    * Output: (domain, n_tokens, weight, target_tokens, epochs,
    * upsampled). */
  def mixtureEpochs(docs: DataFrame, domainCol: String, textCol: String,
                    weights: Map[String, Double],
                    budgetTokens: Long): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    require(budgetTokens > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF(domainCol, "weight"))
    docs.select(col(domainCol), TextOps.tokenCount(col(textCol)).cast("long").as("__tc"))
      .groupBy(col(domainCol))
      .agg(sum(col("__tc")).as("n_tokens"))
      .join(wdf, Seq(domainCol), "left")
      .select(col(domainCol).as("domain"), col("n_tokens"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
      .withColumn("target_tokens",
        round(lit(budgetTokens.toDouble) * col("weight"), 0).cast("long"))
      .withColumn("epochs",
        when(col("n_tokens") > 0L,
          round(col("target_tokens").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(null).cast("double")))
      .withColumn("upsampled", col("epochs") > 1.0)
  }

  /** Materialize a target mixture: repeat each document
    * `epochs(domain)` times — `floor(epochs)` full copies plus one
    * more with probability `frac = epochs − floor(epochs)`, decided by
    * the md5-uniform of the id. Deterministic and shuffle-free (one
    * broadcast join + one explode): every run and every engine admits
    * EXACTLY the same fractional-epoch docs, so the materialized
    * training list is reproducible — [[mixtureEpochs]]' audit turned
    * into the artifact. `epoch_ix` tags each copy (0-based) for
    * curriculum ordering / per-epoch shuffle seeding downstream.
    * Domains with epochs ≤ 0 (or absent) drop. */
  def expandEpochs(docs: DataFrame, domainCol: String, idCol: String,
                   epochs: DataFrame): DataFrame = {
    val u = (graft.ops.Sketches.hash60(col(idCol)).cast("double") + 1.0) /
      math.pow(2.0, 60)
    val whole = floor(col("epochs")).cast("int")
    val copies = (whole +
      when(u < col("epochs") - whole, 1).otherwise(0)).cast("int")
    docs.join(broadcast(epochs.select(col(domainCol), col("epochs"))),
        Seq(domainCol))
      .withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch_ix",
        explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n", "epochs")
  }

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * combination is shared by at least `k` rows — groups smaller than k
    * are re-identification risks and drop entirely (suppression, the
    * conservative form; generalization hierarchies are a policy layer
    * above the engine). Two shuffles: the quasi-group counts (map-side
    * combined) and a LEFT SEMI join back on the quasi columns — the
    * payload columns never ride the counting shuffle. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    val ok = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__gn"))
      .filter(col("__gn") >= k)
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }
}
