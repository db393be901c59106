package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1998: key k lands on the shard s maximizing hash(s, k).
  *
  * Scale design: assignment is a pure per-row EXPRESSION — no shuffle,
  * no directory service, no coordination; 100 TB assigns in the scan.
  * The property that matters operationally: growing n → n+1 shards
  * moves only the keys whose new shard's hash wins (expected fraction
  * 1/(n+1)), and every mover goes TO the new shard — nothing
  * reshuffles among survivors. Mod-N hashing moves n/(n+1) of
  * EVERYTHING on the same event. Hashes are md5-derived
  * ([[Sketches.hash60]] of `"s|key"`), so placements are reproducible
  * in any engine and stable across runs/machines.
  */
object Sharding {

  /** Per-shard rendezvous hashes of `key` for shards 0..n-1, as one
    * array column — compute ONCE and feed both [[rendezvousPick]] and
    * resharding what-ifs (a slice of the array IS the hash set of a
    * smaller shard count; growing appends entries without touching
    * the existing ones — that's where minimal movement comes from). */
  def rendezvousHashes(key: Column, nShards: Int): Column = {
    require(nShards >= 1, "need at least one shard")
    array((0 until nShards).map(s =>
      Sketches.hash60(concat(lit(s"$s|"), key.cast("string")))): _*)
  }

  /** Winning shard id from a [[rendezvousHashes]] array: the 0-based
    * argmax (first occurrence on the ~impossible md5 tie — the same
    * rule as DuckDB's `list_position`). */
  def rendezvousPick(hashes: Column): Column =
    (call_function("array_position", hashes, array_max(hashes)) - 1L)
      .cast("long")

  /** Shard of `key` among `nShards` — the one-shot form. */
  def rendezvousShard(key: Column, nShards: Int): Column =
    rendezvousPick(rendezvousHashes(key, nShards))

  /** Release MANIFEST: the artifact a reproducible corpus release
    * ships — per rendezvous shard, the doc count, token total, id
    * range, and an order-insensitive content checksum
    * (Σ hash60(text) mod p, p = 1e9+7): any consumer can re-derive
    * the manifest from the shards and byte-verify the release.
    * Additive-mod checksums are MERGEABLE (sub-shard manifests sum)
    * and order-free, so the number is partitioning-invariant and the
    * per-shard accumulator fits a long up to ~9×10⁹ docs per shard.
    * One projection (assignment is shuffle-free) + one keyed
    * aggregation. Output: (shard, n_docs, n_tokens, min_id, max_id,
    * checksum). */
  def releaseManifest(docs: DataFrame, idCol: String, textCol: String,
                      nShards: Int): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val p = 1000000007L
    docs
      .select(rendezvousShard(col(idCol), nShards).as("shard"),
        col(idCol).cast("long").as("id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("tc"),
        pmod(Sketches.hash60(col(textCol)), lit(p)).as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tc")).as("n_tokens"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        pmod(sum(col("h")), lit(p)).as("checksum"))
  }

  /** Resharding audit for growing `nShards` → `nShards`+1: per current
    * shard, how many keys there are, how many move under the grown
    * layout, and how many move anywhere OTHER than the new shard —
    * the rendezvous invariant says that last count is ZERO, and this
    * op measures it instead of assuming it. One hash-array projection
    * serves both layouts (the n-shard view is a prefix slice), one
    * aggregation keyed on the n-shard assignment — no joins, no
    * corpus self-comparison.
    * Output: (shard, n_docs, n_moved, n_moved_elsewhere). */
  def shardMoveAudit(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    df.select(rendezvousHashes(col(keyCol), nShards + 1).as("hs"))
      .select(rendezvousPick(slice(col("hs"), 1, nShards)).as("s_old"),
        rendezvousPick(col("hs")).as("s_new"))
      .groupBy(col("s_old").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_old") =!= col("s_new"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("s_old") =!= col("s_new") &&
          col("s_new") =!= nShards.toLong, 1L).otherwise(0L))
          .as("n_moved_elsewhere"))
  }
}
