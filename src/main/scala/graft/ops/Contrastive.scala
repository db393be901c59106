package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-example construction: turn a corpus plus its
  * near-duplicate pairs into (anchor, positive, negative) triplets for
  * embedding-model training. The positive is the anchor's near-dup
  * partner; the negative is a pseudo-random OTHER document drawn
  * deterministically from the whole corpus (in-batch-negative style,
  * but reproducible: the draw is an md5 hash of the pair, not an RNG).
  */
object Contrastive {

  /** One triplet per (id_a, id_b) pair: anchor = id_a, positive = id_b,
    * negative = the corpus document at sorted-rank
    * `(h + j) mod n`, where h = u60(md5("a|b")), n = corpus size, and
    * j ∈ {0,1,2} is the first offset whose document is neither the
    * anchor nor the positive (two collisions are possible, so three
    * candidates always leave one valid).
    *
    * Scale shape: rank-addressing the corpus uses
    * [[Sketches.contiguousIds]] (range-partitioned two-pass zip, no
    * global window); the candidate ranks join that ranked frame on the
    * rank key (an equi-join that shuffles pairs×3 rows and ids only —
    * never document payloads); the corpus count rides a one-row
    * broadcast. Pure function of (pairs, corpus ids): repeatable across
    * runs, partitionings and engines. */
  def contrastivePairs(docs: DataFrame, idCol: String,
                       pairs: DataFrame): DataFrame = {
    val ranked = Sketches.contiguousIds(
        docs.select(col(idCol).as("__nid")), "__nid")
      .select(col("row_ix").as("__nix"), col("__nid"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val candidates = pairs
      .select(col("id_a").as("anchor"), col("id_b").as("positive"))
      .crossJoin(broadcast(n))
      .withColumn("__h", Sketches.hash60(
        concat(col("anchor").cast("string"), lit("|"),
          col("positive").cast("string"))))
      .select(col("anchor"), col("positive"), col("__n"), col("__h"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("__j"))
      .withColumn("__nix", pmod(col("__h") + col("__j"), col("__n")))
    candidates.join(ranked, Seq("__nix"))
      .filter(col("__nid") =!= col("anchor") &&
        col("__nid") =!= col("positive"))
      .groupBy(col("anchor"), col("positive"))
      .agg(min_by(col("__nid"), col("__j")).as("negative"))
  }
}
