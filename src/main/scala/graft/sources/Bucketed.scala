package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-bucketed tables — the co-located-join lever at 100 TB: a
  * frame written `bucketBy(n, key)` is hash-partitioned ON DISK and the
  * bucketing rides the table catalog, so every subsequent join or
  * aggregation keyed on `key` skips its Exchange entirely — the shuffle
  * happens ONCE, at write time, instead of per query. Use for the fact
  * tables that join repeatedly on one key: documents by doc_id between
  * curation stages, the streaming band table by (band, bucket), IVF
  * inverted lists by cluster id. `sortBy` additionally pre-sorts within
  * buckets so sort-merge joins skip their Sort.
  *
  * Sizing: pick `buckets` so one bucket ≈ one task's worth of data at
  * the target SF (≈ 128-512 MB of parquet); both sides of a co-located
  * join must use the SAME bucket count (Spark reads mismatched counts
  * through a shuffle on one side).
  */
object Bucketed {

  def write(df: DataFrame, table: String, key: String, buckets: Int,
            sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit =
    writeKeys(df, table, Seq(key), buckets, sortCols, mode)

  /** Multi-column bucketing — e.g. the streaming band table by
    * (band, bucket). `mode = "append"` adds files into the existing
    * buckets (the bucketing spec must match the table's); each appended
    * file is bucket-tagged, so co-location survives appends. */
  def writeKeys(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
                sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(buckets > 0, "bucket count must be positive")
    require(keys.nonEmpty, "at least one bucket key")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Append rows to a bucketed store whose schema may carry an optional
    * retention-stamp column `ts` — ONE alignment definition for every
    * stamped store (band index, split sigs, hash index): a naive
    * always-add-ts append breaks every table published before stamps
    * existed (saveAsTable append fails on schema mismatch — precisely
    * the long-lived artifacts retention was built for).
    *
    *  - fresh table → written WITH ts (null when unstamped), so new
    *    stores are expiry-ready from day one;
    *  - existing table with ts → rows aligned (null ts added if absent);
    *  - legacy table without ts, unstamped rows → appended as-is;
    *  - legacy table without ts, STAMPED rows → refuse loudly: silently
    *    dropping the stamps would disable [[expire]]/compact-horizon
    *    without a trace, and appending would throw a schema error
    *    anyway. The one-time migration is a compact() on the stamped
    *    schema (or recreating the table). */
  def appendAligned(spark: SparkSession, rows: DataFrame, table: String,
                    keys: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val exists = spark.catalog.tableExists(table)
    val tableHasTs = exists && spark.table(table).columns.contains("ts")
    val rowsHaveTs = rows.columns.contains("ts")
    val aligned =
      if (!exists || tableHasTs) {
        if (rowsHaveTs) rows else rows.withColumn("ts", lit(null).cast("long"))
      } else if (!rowsHaveTs) rows
      else throw new IllegalArgumentException(
        s"table '$table' predates retention stamps (no ts column) but this " +
          "publish carries event times — appending would fail on schema " +
          "mismatch, and silently dropping the stamps would disable expiry " +
          "without a trace. Migrate once: rewrite the table with a null ts " +
          "column (the store's compact() on the stamped schema), then retry.")
    writeKeys(aligned.repartition(buckets, keys.map(col): _*),
      table, keys, buckets, sortCols, mode = "append")
    // the schema probe above read the table through `spark`, populating
    // THAT session's relation cache with the pre-append file listing;
    // the write may run through a DIFFERENT session (a foreachBatch
    // micro-batch clone) whose saveAsTable refreshes only its own cache
    // — without this refresh the probing session keeps serving the
    // stale list and every post-append read silently misses the batch
    spark.catalog.refreshTable(table)
  }

  // ---- store-level metadata tags (provenance valve) -----------------
  // A fingerprint construction that can change across library versions
  // (audio window framing, hash grain, codec identity) must be recorded
  // ON the published store: a gate screened against an index built
  // under a DIFFERENT construction fails OPEN — re-submitted copies
  // hash differently and sail through as novel, silently. Tags ride
  // the catalog table's properties, so they survive appends and are
  // re-applied by [[compactRewrite]] across overwrites.

  /** Record `value` under `key` on `table` (catalog table property). */
  def setTag(spark: SparkSession, table: String, key: String,
             value: String): Unit = {
    require(!key.contains("'") && !value.contains("'"),
      "tag keys/values must not contain quotes")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('$key' = '$value')")
    ()
  }

  /** The recorded tag, or None when the table or the tag is absent. */
  def getTag(spark: SparkSession, table: String, key: String): Option[String] =
    if (!spark.catalog.tableExists(table)) None
    else spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .find(_.getString(0) == key).map(_.getString(1))

  /** All `graft.`-prefixed tags of `table` (empty when absent) — the
    * set [[compactRewrite]] preserves across its overwrite. */
  def graftTags(spark: SparkSession, table: String): Seq[(String, String)] =
    if (!spark.catalog.tableExists(table)) Nil
    else spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .filter(_.getString(0).startsWith("graft."))
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** REFUSE-LOUDLY check that `table` was built under `expected`:
    * absent table passes (the first publish will stamp it); a matching
    * tag passes; a DIFFERENT tag throws naming both constructions; an
    * UNTAGGED existing table throws too — it cannot prove which
    * construction produced it, and "probably fine" is exactly the
    * silent fail-open this tag exists to prevent. Migration for a
    * verified legacy store: [[setTag]] once, then retry. */
  def requireTag(spark: SparkSession, table: String, key: String,
                 expected: String, who: String): Unit = {
    if (!spark.catalog.tableExists(table)) return
    getTag(spark, table, key) match {
      case Some(t) if t == expected => ()
      case Some(t) => throw new IllegalStateException(
        s"$who: store '$table' was built under $key='$t' but this run " +
          s"expects '$expected' — screening across constructions fails " +
          "OPEN (dups hash differently and pass as novel). Re-publish the " +
          "store under the new construction, or run with the old one.")
      case None => throw new IllegalStateException(
        s"$who: store '$table' predates construction tags — it cannot " +
          s"prove it was built under $key='$expected', and assuming so " +
          "fails OPEN if it wasn't. After verifying its provenance, adopt " +
          s"it once with Bucketed.setTag(spark, \"$table\", \"$key\", " +
          s"\"$expected\"), then retry.")
    }
  }

  /** Distinct-rewrite of a bucketed append log, optionally dropping
    * rows whose event time fell before `horizonMillis` — ONE retention
    * mechanic for every store's compact()/expireBefore() (rows with
    * null ts, or tables without a ts column, are exempt: deletion of
    * unstamped history must be an explicit caller decision). The
    * rewrite also MIGRATES a legacy ts-less table to the stamped
    * schema (null ts — still exempt from every horizon), so "run
    * compact() once" is the whole upgrade path before the first
    * stamped publish. Returns the number of rows the HORIZON dropped
    * (0 when no horizon applied; duplicate collapse is not counted —
    * it removes redundancy, not history). */
  def compactRewrite(spark: SparkSession, table: String, keys: Seq[String],
                     buckets: Int, sortCols: Seq[String] = Nil,
                     horizonMillis: Long = Long.MinValue): Long = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    if (!spark.catalog.tableExists(table)) return 0L
    val cur = spark.table(table)
    val applyHorizon =
      horizonMillis > Long.MinValue && cur.columns.contains("ts")
    val keepPred = col("ts").isNull || col("ts") >= horizonMillis
    val kept0 = if (applyHorizon) cur.filter(keepPred) else cur
    // ONE ts-pruned aggregation computes total and surviving counts
    // together (two separate .count() jobs cost two extra full-table
    // scans per expiry — and a concurrent append landing between them
    // skewed the reported number; a single scan is internally
    // consistent by construction)
    val expired =
      if (applyHorizon) {
        val r = cur.agg(count(lit(1)), count(when(keepPred, 1))).head
        r.getLong(0) - r.getLong(1)
      } else 0L
    val kept = (if (kept0.columns.contains("ts")) kept0
                else kept0.withColumn("ts", lit(null).cast("long")))
      .distinct().localCheckpoint(true)
    // an overwrite saveAsTable RECREATES the catalog entry, dropping
    // its properties — losing a construction tag here would turn every
    // compaction into the untagged-legacy refusal (or worse, let a
    // later run re-stamp a different construction unchallenged)
    val tags = graftTags(spark, table)
    writeKeys(kept.repartition(buckets, keys.map(col): _*),
      table, keys, buckets, sortCols)
    tags.foreach { case (k, v) => setTag(spark, table, k, v) }
    expired
  }
}
