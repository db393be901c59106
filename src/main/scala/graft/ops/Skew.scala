package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys — the knobs a 100 TB run needs when AQE's
  * skew-join split isn't enough (e.g. a single stopword-shingle bucket
  * or one dominant `source` key holding 30% of rows).
  *
  * Two patterns:
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate on
  *    (key, salt), final aggregate on key. Turns one hot reducer into
  *    `salts` parallel ones; correct for any decomposable aggregate
  *    (sum/count/min/max — pass partial and final forms).
  *  - [[saltedJoin]]: replicate the SMALL side `salts` times, salt the
  *    big side's key randomly — every hot key's rows spread over
  *    `salts` tasks.
  */
object Skew {

  /** Two-phase salted aggregation: `partials` run per (key, salt),
    * `finals` recombine per key. Example:
    * {{{
    * saltedAggregate(df, Seq("lang"), 16,
    *   partials = Seq(count(lit(1)).as("cnt"), sum("n").as("s")),
    *   finals   = Seq(sum("cnt").as("cnt"), sum("s").as("s")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(salts.toLong) * salts).cast("int"))
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Skew-safe equi-join of a big (possibly hot-keyed) frame against a
    * small frame: the small side is replicated per salt (its size ×
    * salts must stay broadcastable), the big side salts uniformly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(salts.toLong) * salts).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(broadcast(replicatedSmall), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
