package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge induction (Sennrich et al. 2016) — the
  * subword-vocabulary trainer behind BPE/WordPiece-family tokenizers,
  * and the missing half of q73's frequency vocabulary: q73 ranks whole
  * tokens; this LEARNS the merge table that turns characters into
  * subwords.
  *
  * Scale design — the decisive property of BPE training: after ONE
  * corpus pass (token counts), every iteration runs on the WORD-TYPE
  * table, which is vocabulary-sized (≈10⁵–10⁶ rows at any corpus
  * scale), not corpus-sized. A 100 TB corpus pays one shuffle for
  * `wordCounts`; the k merge rounds then touch megabytes. Per round:
  * one map-side-combined pair count, ONE driver row (the argmax —
  * model-sized by definition), one string `replace` over the cached
  * vocab.
  *
  * Representation: a word's symbol sequence is a SINGLE string with
  * every symbol wrapped in U+0001 sentinels
  * (`low` becomes `SEP l SEP SEP o SEP SEP w SEP SEP </w> SEP`). A
  * merge of pair (l, r) is then `replace(state, ␁l␁␁r␁, ␁lr␁)` —
  * `replace` scans left-to-right non-overlapping, which IS the BPE
  * merge rule ("aaa" merges to [aa, a], never [a, aa]), the sentinels
  * make symbol boundaries unambiguous (pair (b, c) can never match
  * inside symbols "ab","cd"), and the whole round is codegen'd string
  * ops — no higher-order lambdas, no array rebuilds, and any engine
  * with `replace` reproduces it exactly (the DuckDB oracle replays
  * every round verbatim). Words containing the sentinel are dropped
  * (impossible in tokenizer output; guarded anyway).
  *
  * Tie-breaking is total: (count DESC, left, right) — both engines
  * agree on every merge, so the table is deterministic.
  */
object Bpe {

  private val Sep = "\u0001"
  private val SepSep = Sep + Sep
  /** Word-end marker, its own symbol (the Sennrich convention: "est" at
    * word end and "est" mid-word are different units). */
  val EndMark = "</w>"

  /** One corpus pass: token → count. The only corpus-sized stage. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(!col("w").contains(Sep))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** `low` → `␁l␁␁o␁␁w␁␁</w>␁`. */
  private[ops] def initialState(w: Column): Column =
    concat(lit(Sep),
      array_join(concat(split(w, ""), array(lit(EndMark))), SepSep),
      lit(Sep))

  /** Wrapped state → symbol array. */
  private[ops] def symbols(state: Column): Column =
    split(trim(state, Sep), SepSep)

  /** Occurrence-counted adjacent symbol pairs over the vocab frame
    * (state, cnt): map-side-combined, vocabulary-sized output. */
  private[ops] def pairCounts(vocab: DataFrame): DataFrame = {
    val sy = symbols(col("state"))
    val n = greatest(size(sy) - 1, lit(0)) // 1-symbol words have no pairs
    vocab.select(explode(zip_with(slice(sy, lit(1), n), slice(sy, lit(2), n),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
  }

  private def mergeExpr(state: Column, l: String, r: String): Column =
    call_function("replace", state,
      lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))

  /** Learn up to `merges` BPE merges from the corpus. Stops early when
    * no pair reaches `minPairCount`. Returns the merge table —
    * (rank, lhs, rhs, merged, pair_count) — the training artifact a
    * tokenizer ships. The k argmax collects are ONE ROW each; the
    * vocab frame re-caches per round (previous round released) so each
    * round computes exactly one replace, not the whole chain. */
  def trainBpe(docs: DataFrame, textCol: String, merges: Int,
               minPairCount: Long = 2L): DataFrame = {
    require(merges >= 0, "merges must be non-negative")
    val session = docs.sparkSession
    var vocab = wordCounts(docs, textCol)
      .select(initialState(col("w")).as("state"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var i = 0
    var exhausted = false
    while (i < merges && !exhausted) {
      val top = pairCounts(vocab).filter(col("c") >= minPairCount)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((i.toLong, l, r, l + r, c))
        val next = vocab.withColumn("state", mergeExpr(col("state"), l, r))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the parent cache
        vocab.unpersist(blocking = false)
        vocab = next
      }
      i += 1
    }
    vocab.unpersist(blocking = false)
    import session.implicits._
    out.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a learned merge table to a text column: per token, the same
    * sentinel-replace cascade in rank order, then the symbol split —
    * subword segmentation as a pure column expression over the
    * plan-embedded merge list (model-sized; ships with the task binary
    * like a broadcast). Returns array<string> of subword units. */
  def subwordTokens(text: Column, merges: Seq[(String, String)]): Column = {
    val segmented = transform(TextOps.tokens(text), w =>
      symbols(merges.foldLeft(initialState(w)) { case (st, (l, r)) =>
        call_function("replace", st,
          lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
      }))
    flatten(segmented)
  }
}
