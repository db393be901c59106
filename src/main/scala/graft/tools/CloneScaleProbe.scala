package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Relevance}

/** Clone-detection scale probe (dev tool, run-once evidence for
  * NOTES): 1M synthetic 25-token docs where every 50th doc clones its
  * predecessor with ONE token changed — a near-dup the winnowing
  * guarantee (shared run ≥ w+n−1 tokens) must catch. Drives the three
  * round-8 clone kernels at probe scale:
  *  1. winnowing fingerprint overlap (post lambda-capture fix),
  *  2. n-gram novelty scores (count-over-shingle window),
  *  3. edit-distance verification of LSH candidates.
  *
  * Usage: runMain graft.tools.CloneScaleProbe [docs]
  */
object CloneScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // doc(seed): 25 xxhash64-mixed tokens over a 200k vocabulary; a
    // clone doc reuses its predecessor's seed and flips token 12
    val isClone = col("id") % 50 === 0 && col("id") > 0
    val seed = when(isClone, col("id") - 1).otherwise(col("id"))
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(24)),
          j => when(isClone && j === 12, lit("MUTATED"))
            .otherwise(concat(lit("w"),
              pmod(xxhash64(seed, j), lit(200000L)).cast("string")))), " ")
          .as("text"))
      .localCheckpoint(true)
    val expectedClones = (nDocs - 1) / 50

    tm(s"winnowing overlap pairs over ${nDocs / 1000}k docs") {
      val pairs = Dedup.winnowingOverlapPairs(docs, "doc_id", "text")
        .localCheckpoint(true)
      val planted = pairs
        .filter(col("id_b") - col("id_a") === 1 && col("id_b") % 50 === 0)
        .count()
      println(s"[probe] winnowing pairs: ${pairs.count()} " +
        s"(planted clone pairs found: $planted / $expectedClones)")
    }
    tm(s"novelty scores over ${nDocs / 1000}k docs") {
      val nov = Relevance.noveltyScores(docs, "doc_id", "text")
        .localCheckpoint(true)
      val low = nov.filter(col("novelty") < 0.5).count()
      println(s"[probe] novelty rows: ${nov.count()}; docs with <0.5 " +
        s"novelty: $low (clones + their originals share most shingles)")
    }
    tm(s"edit-verified pairs over ${nDocs / 1000}k docs") {
      val ev = Dedup.editVerifiedPairs(docs, "doc_id", "text",
          threshold = 0.8).localCheckpoint(true)
      val planted = ev
        .filter(col("id_b") - col("id_a") === 1 && col("id_b") % 50 === 0)
        .count()
      println(s"[probe] edit-verified pairs: ${ev.count()} " +
        s"(planted clone pairs verified: $planted / $expectedClones)")
    }
    spark.stop()
  }
}
