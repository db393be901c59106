package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** One registry, five domain files (dedup / similarity / text /
    * curation / stats) — each keeps every query beside its oracle SQL;
    * [[TrainingShared]] holds the fixtures and SQL building blocks. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    TrainingDedup.queries ++
    TrainingSimilarity.queries ++
    TrainingText.queries ++
    TrainingCuration.queries ++
    TrainingStats.queries

  val oracles: Map[String, String] =
    TrainingDedup.oracles ++
    TrainingSimilarity.oracles ++
    TrainingText.oracles ++
    TrainingCuration.oracles ++
    TrainingStats.oracles
}
