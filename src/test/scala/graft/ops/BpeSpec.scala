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
}
