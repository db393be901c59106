package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent in-test reference: the textbook BPE loop over a word
    * count map — hash maps and explicit scans, nothing shared with the
    * operator's sentinel-string representation. */
  private def refBpe(words: Map[String, Long], k: Int,
                     minCount: Long): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => (w.toList.map(_.toString) :+ Bpe.EndMark) -> c }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var rank = 0L
    var stop = false
    while (rank < k && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val cands = pc.filter(_._2 >= minCount)
      if (cands.isEmpty) stop = true
      else {
        val ((l, r), c) = cands.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, l + r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val b = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.toList
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq

  test("trainBpe matches the textbook reference on the classic corpus") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = collectMerges(Bpe.trainBpe(docs, "text", merges = 6))
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(got === refBpe(words, 6, 2))
    // the classic first merge: 'es' (or 'e s' family) dominates via
    // newest+widest = 9 — sanity that the corpus drove the table
    assert(got.head._5 === 9L, "top pair count = newest+widest occurrences")
  }

  test("merge rule is left-to-right non-overlapping: aaa -> [aa, a]") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = collectMerges(Bpe.trainBpe(docs, "text", merges = 1))
    assert(merges.head._2 === "a" && merges.head._3 === "a")
    assert(merges.head._5 === 4L, "overlapping occurrences both count: 2 per word x 2")
    val sub = docs.select(Bpe.subwordTokens(col("text"), Seq(("a", "a"))).as("s"))
      .head.getSeq[String](0)
    assert(sub === Seq("aa", "a", "</w>", "aa", "a", "</w>"),
      "replace must consume left-to-right, never re-pair across a merge")
  }

  test("subwordTokens applies merges in rank order, cascading") {
    val docs = Seq((1L, "lowest")).toDF("doc_id", "text")
    val sub = docs.select(Bpe.subwordTokens(col("text"),
        Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))).as("s"))
      .head.getSeq[String](0)
    assert(sub === Seq("low", "est", "</w>"))
  }

  test("early stop: a corpus with no repeated pair yields fewer merges than asked") {
    // every word unique, every char distinct within a word -> all pair
    // counts are 1 < minPairCount
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val merges = collectMerges(Bpe.trainBpe(docs, "text", merges = 8, minPairCount = 2))
    // pairs like (x,</w>) also occur once each; nothing reaches 2
    assert(merges.isEmpty, s"expected no merges, got $merges")
  }

  test("heap trainer == round trainer, merge for merge, on the q87 corpus and adversarial shapes") {
    // the q87 corpus: real documents table at the smallest SF
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val wc = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val viaHeap = Bpe.localBpe(wc, 64, 2L)
    val viaRounds = Bpe.localBpeRounds(wc, 64, 2L)
    assert(viaHeap.size === 64)
    assert(viaHeap === viaRounds, "incremental deltas must replay the argmax rounds exactly")
    // adversarial: overlap runs (aaa), count ties broken by (l, r),
    // merged symbols immediately re-pairing, early exhaustion
    val shapes = Seq(
      Map("aaaa" -> 3L, "aaab" -> 2L, "baaa" -> 2L),
      Map("ab" -> 5L, "cd" -> 5L, "ac" -> 5L, "bd" -> 5L),
      Map("xy" -> 9L, "xyxy" -> 4L, "yx" -> 9L),
      Map("solo" -> 1L))
    shapes.foreach { words =>
      val arr = words.toArray
      assert(Bpe.localBpe(arr, 12, 2L) === Bpe.localBpeRounds(arr, 12, 2L),
        s"divergence on $words")
    }
  }

  test("driver fast path == forced distributed rounds, merge for merge") {
    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta${i % 5} gamma alpha delta${i % 4} beta${i % 5}"))
      .toDF("doc_id", "text")
    val local = collectMerges(Bpe.trainBpe(docs, "text", merges = 6))
    val dist = collectMerges(Bpe.trainBpe(docs, "text", merges = 6,
      driverVocabLimit = 0))
    assert(local.nonEmpty && local === dist)
  }

  test("trainBpe is partitioning-invariant and reference-exact on a mixed corpus") {
    val docs = (0L until 40L)
      .map(i => (i, s"token${i % 7} data data${i % 3} spark engine corpus"))
      .toDF("doc_id", "text")
    val a = collectMerges(Bpe.trainBpe(docs, "text", merges = 5))
    val b = collectMerges(Bpe.trainBpe(docs.repartition(11), "text", merges = 5))
    assert(a === b)
    val wc = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === refBpe(wc, 5, 2))
  }

  test("tokenCounts (vocab-side apply) == corpus-occurrence segmentation, count for count") {
    val docs = (0L until 30L)
      .map(i => (i, s"lower lowest newer new${i % 4} wider widest"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Bpe.trainBpeFromCounts(wc, merges = 6)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val vocabSide = Bpe.tokenCounts(wc, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the expensive reference: segment every word OCCURRENCE in the
    // corpus and count tokens directly
    val corpusSide = docs
      .select(explode(Bpe.subwordTokens(col("text"), merges)).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocabSide === corpusSide,
      "per-type weighted counts must equal per-occurrence counts exactly")
    wc.unpersist(blocking = false)
  }

  test("subwordTokens drops sentinel-containing words — the same guard wordCounts trains with") {
    val docs = Seq((1L, "plain word"), (2L, "evil\u0001token plain")).toDF("doc_id", "text")
    val merges = Seq.empty[(String, String)]
    val out = docs.select($"doc_id",
        Bpe.subwordTokens($"text", merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // char-split base symbols, word-end marked; the U+0001 word is
    // GONE (not mangled fragments) — matching its absence from any
    // trained vocabulary
    assert(out(1L).mkString("|") === "p|l|a|i|n|</w>|w|o|r|d|</w>")
    assert(out(2L).mkString("|") === "p|l|a|i|n|</w>",
      s"sentinel word must be dropped, got ${out(2L)}")
    // and the vocab-side/corpus-side count equivalence therefore holds
    // even ON such a corpus
    val wc = Bpe.wordCounts(docs, "text")
    val vocabSide = Bpe.tokenCounts(wc, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpusSide = docs
      .select(explode(Bpe.subwordTokens($"text", merges)).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocabSide === corpusSide)
  }

  test("vocabIds: contiguous frequency-rank ids — hot tokens first, ties by token") {
    val counts = Seq(("b", 5L), ("a", 5L), ("c", 9L), ("d", 1L))
      .toDF("token", "n")
    val ids = Bpe.vocabIds(counts)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(ids === Map("c" -> 0L, "a" -> 1L, "b" -> 2L, "d" -> 3L),
      "order is (count DESC, token ASC), ids contiguous from 0")
  }

  test("native kernel == composed cascade on trained tables AND adversarial rank orders") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "low lower lowest newest newer new widest wide"),
      (2L, "lowest of the low new newer wide wider ab abc abcd"))
      .toDF("doc_id", "text")
    val trained = Bpe.trainBpe(docs, "text", merges = 12, minPairCount = 1)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def seg(fn: (org.apache.spark.sql.Column, Seq[(String, String)]) => org.apache.spark.sql.Column,
            merges: Seq[(String, String)]) =
      docs.select(col("doc_id"), fn(col("text"), merges).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(seg(Bpe.subwordTokens, trained) ===
      seg(Bpe.subwordTokensComposed, trained),
      "well-formed (trained) table: min-rank fast path == cascade")
    // adversarial: rank 0 references a symbol only rank 1 builds — the
    // kernel must take the literal rank-scan and still match the
    // cascade (which misses the ("ab","c") merge for exactly that
    // reason); and a DUPLICATE pair disqualifies the fast path too
    val adversarial = Seq(("ab", "c"), ("a", "b"))
    assert(seg(Bpe.subwordTokens, adversarial) ===
      seg(Bpe.subwordTokensComposed, adversarial),
      "non-well-formed table: rank scan == cascade")
    val dup = Seq(("a", "b"), ("ab", "c"), ("a", "b"))
    assert(seg(Bpe.subwordTokens, dup) === seg(Bpe.subwordTokensComposed, dup))
  }

  test("deep 32k-merge table: kernel segments where the cascade is unrepresentable") {
    import org.apache.spark.sql.functions.{col, explode}
    val merges = Bpe.syntheticMerges(32768)
    assert(merges.size === 32768 && merges.distinct.size === 32768)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzyzx aab qwfp vvv the aaaa")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Bpe.subwordTokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // reconstruction: concatenating subwords and stripping </w>
    // yields the original words in order — no symbol lost or invented
    val rebuilt = out(1L).mkString.replace("</w>", " ").trim
    assert(rebuilt === "the quick brown fox jumps over the lazy dog")
    // depth actually engaged: "aab" = (a,a)@rank 0 then (aa,b)@rank
    // 677 — a LEVEL-2 rank, only reachable past merge 676
    assert(out(2L).contains("aab"),
      s"multi-level merges must fire, got ${out(2L).take(8)}")
    val again = docs.repartition(3).select(col("doc_id"),
        Bpe.subwordTokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out === again)
  }

  test("trainBpeFromCounts minWordCount floor: floored types contribute no pairs") {
    import org.apache.spark.sql.functions.col
    // (a,b) reaches count 3 only through three DISTINCT hapax types —
    // under a >=2 floor those types vanish and the z-pairs take over
    val wc = Seq(("zz", 3L), ("abc", 1L), ("abd", 1L), ("abe", 1L))
      .toDF("w", "cnt")
    def first(minWordCount: Long) =
      Bpe.trainBpeFromCounts(wc, merges = 1, minPairCount = 1,
          minWordCount = minWordCount)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).head
    val unfloored = first(1L)
    val floored = first(2L)
    assert(unfloored === (("a", "b")),
      s"hapax types dominate the unfloored corpus, got $unfloored")
    assert(!floored._1.contains("a") && !floored._2.contains("b"),
      s"floored training must not see hapax pairs, got $floored")
    assert(floored !== unfloored)
  }
}
