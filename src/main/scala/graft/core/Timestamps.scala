package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** One policy for event-time column types, applied at every tsCol entry
  * point (batch and streaming): TIMESTAMP_NTZ — what modern
  * pandas/pyarrow parquet yields when the writer omits the
  * adjusted-to-UTC flag — normalizes to TIMESTAMP before any temporal
  * function touches it. Spark's epoch functions (`unix_micros`,
  * `unix_millis`) and several temporal operators reject NTZ at analysis
  * time, and the failure mode is nasty: a pipeline green on one
  * parquet generation throws on the next (the q61 regression). The
  * NTZ→TZ cast reinterprets the local datetime in the session
  * timezone; graft sessions pin UTC ([[graft.Tables.prepare]]), making
  * it value-exact, and gap/difference arithmetic is exact under ANY
  * fixed-offset session zone. */
object Timestamps {

  /** Return `df` with `tsCol` cast to TimestampType when it is NTZ;
    * unchanged otherwise (streaming-safe: a plain column cast). */
  def normalize(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  /** Column-level form for call sites that must leave the caller's
    * frame untouched (e.g. sessionize passes the original column
    * through and only normalizes its INTERNAL arithmetic input). */
  def tzCol(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case _                => col(tsCol)
    }
}
