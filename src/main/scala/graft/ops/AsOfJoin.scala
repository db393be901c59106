package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join — the temporal primitive Spark lacks as a
  * built-in: for every left row, attach the LATEST right row whose
  * timestamp is ≤ the left row's, per key (backward-looking,
  * inclusive). The feature-store / event-attribution join ("state of X
  * when Y happened").
  *
  * Scale design: NOT a range join (`l.ts >= r.ts` as a join condition
  * explodes to O(|l|·|r|) per key before filtering). Both sides union
  * into one frame, shuffle ONCE on the key, and a single
  * sort-within-key window carries each right value forward with
  * `last(…, ignoreNulls)` — O((|l|+|r|) log) per key, the same shape a
  * native as-of merge would run, expressed declaratively so Catalyst
  * plans the shuffle/sort and AQE handles skewed keys. */
object AsOfJoin {

  /** Backward as-of join. `rightCols` are the right-side columns to
    * carry (each lands as `<prefix><name>`); the matched right
    * timestamp lands as `<prefix>ts` (null when no right row precedes).
    * Right rows must be unique per (key, ts) — pre-aggregate ties, or
    * the carried value among equal timestamps is unspecified.
    * Inclusive: a right row AT the left timestamp matches (right sorts
    * before left on ties via the side tag). */
  def asofBackward(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "need at least one right column to carry")
    // ONE struct carries the whole matched right row (ts + values), so
    // a null in a carried value column rides with ITS row instead of
    // being back-filled from an older row — per-column last(ignoreNulls)
    // would mix fields of different right rows, diverging from true
    // as-of semantics (and from DuckDB's ASOF, which returns the latest
    // row including its nulls). The struct itself is null only on left
    // rows, so ignoreNulls skips exactly the non-matches.
    val payload = (col(tsCol).as(s"${prefix}ts") +:
      rightCols.map(c => col(c).as(s"$prefix$c"))).toSeq
    val rSide0 = right.select(
      col(keyCol), col(tsCol), lit(0).as("__side"), struct(payload: _*).as("__asof"))
    val lSide = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(rSide0.schema("__asof").dataType))
    // null columns for the left-only attributes so the union aligns
    val rSide = lSide.columns.foldLeft(rSide0) { case (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lSide.schema(c).dataType))
    }
    val unioned = lSide.unionByName(rSide.select(lSide.columns.map(col): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = unioned
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // unpack in the historical output order: carried values, then ts
    val outCols = left.columns.map(col).toSeq ++
      rightCols.map(c => col(s"__asof.$prefix$c").as(s"$prefix$c")) :+
      col(s"__asof.${prefix}ts").as(s"${prefix}ts")
    withCarry.select(outCols: _*)
  }

  /** Gap-based sessionization — the other temporal primitive (web-log /
    * telemetry curation): events of one key belong to the same session
    * while consecutive gaps stay ≤ `gapMillis`. One shuffle + one sort
    * per key; the session index is a running sum over new-session
    * flags (lag + cumulative sum share the partition/sort, so Catalyst
    * plans a single Exchange). Timestamp arithmetic runs on epoch
    * MICROSECONDS as longs — exact, and any engine reproduces it.
    * Adds `session_ix` (0-based per key). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMillis: Long): DataFrame = {
    require(gapMillis > 0, "gap must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    // `unix_micros` rejects TIMESTAMP_NTZ — the one type policy
    // (core.Timestamps) in column form: only the INTERNAL gap
    // arithmetic sees the cast, the caller's column passes through.
    val micros = unix_micros(graft.core.Timestamps.tzCol(events, tsCol))
    val isNew = when(lag(micros, 1).over(w).isNull, lit(0L))
      .otherwise((micros - lag(micros, 1).over(w) > gapMillis * 1000L).cast("long"))
    events.withColumn("session_ix",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
