package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ContrastiveSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 50L).toDF("doc_id")

  test("one triplet per pair; negative is neither anchor nor positive") {
    val pairs = Seq((1L, 2L), (3L, 4L), (10L, 40L)).toDF("id_a", "id_b")
    val out = Contrastive.contrastivePairs(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 3)
    out.foreach { case (a, p, n) =>
      assert(n !== a, s"negative $n collides with anchor")
      assert(n !== p, s"negative $n collides with positive")
      assert(n >= 0L && n < 50L, s"negative $n outside the corpus")
    }
  }

  test("deterministic across partitionings (pure function of pairs + corpus ids)") {
    val pairs = (0L until 20L).map(i => (i, i + 20L)).toDF("id_a", "id_b")
    val a = Contrastive.contrastivePairs(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Contrastive.contrastivePairs(docs.repartition(7), "doc_id",
        pairs.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("collision fixup walks to the first clean offset: synthetic corpus of 3") {
    // with n=3 every hash lands in {0,1,2}; anchor+positive occupy two
    // ranks, so the negative must always be the remaining document
    val tiny = Seq(0L, 1L, 2L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("id_a", "id_b")
    val out = Contrastive.contrastivePairs(tiny, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 3)
    out.foreach { case (a, p, n) =>
      assert(Set(0L, 1L, 2L) - a - p === Set(n))
    }
  }
}
