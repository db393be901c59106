package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over document-relation graphs (near-dup pairs,
  * citation-ish links): rank documents by how connected they are — a
  * data-selection signal (a highly-central doc in a similarity graph
  * is the "representative" of its neighborhood; isolated docs carry
  * unique content).
  */
object Graph {

  /** Fixed-iteration PageRank, exact-arithmetic form: scores live as
    * integer PICO-units (×1e12 longs) so the per-destination
    * contribution SUM is order-exact (a float sum over a group is
    * order-nondeterministic in any engine — the q51/q75 doctrine) and
    * every iteration is reproducible bit-for-bit by the unrolled-CTE
    * oracle. Per iteration: contribution = round(pico·damping/outdeg)
    * along each edge, new score = base + Σ contributions, where
    * base = round(1e12·(1−damping)/n).
    *
    * Dangling mass: by default NOT redistributed (totals shrink by the
    * dangling fraction per round; ranking ORDER is unaffected for the
    * similarity-graph use). Real link graphs are dangling-heavy and
    * cross-domain rank comparisons need conserved mass — pass
    * `redistributeDangling = true` for the standard correction: each
    * round, the damped rank mass parked on out-degree-0 nodes is
    * shared uniformly, new score = base + Σ contributions +
    * round(damping·Σ_dangling pico / n). The dangling sum rides as a
    * BROADCAST 1-row frame (an anti-join aggregate per round — no
    * driver collect; the q76-style stats-frame crossJoin shape). This
    * mode materializes the rank frame every round (it is referenced
    * twice per iteration — see the checkpoint note in the loop).
    *
    * Scale shape: one (src-keyed) degree aggregate; per iteration one
    * join of edges to the rank frame (both keyed on the node id) and
    * one map-side-combined sum by dst; lineage checkpoints every third
    * round (the connectedComponents lesson — an unrolled 10-join plan
    * otherwise re-optimizes quadratically). `edges` is DIRECTED
    * (src, dst) — symmetrize near-dup pairs upstream. Output:
    * (id, rank) with rank rounded to 9. */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iterations: Int = 5, damping: Double = 0.85,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1,
      "need iterations >= 1 and damping in (0, 1)")
    val spark = nodes.sparkSession
    // n is a driver scalar by necessity: base/init constants fold into
    // every iteration's expressions (one count job, nodes-metadata cost)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node set")
    val basePico = math.round(1e12 * (1 - damping) / n)
    val initPico = math.round(1e12 / n)
    val ids = nodes.select(col(nodes.columns.head).as("id"))
    val e0 = edges.select(col(edges.columns(0)).as("src"),
      col(edges.columns(1)).as("dst"))
    // redistribution materializes ranks EVERY round (see the loop), and
    // each of those checkpoints is its own job — exchange reuse does
    // not cross jobs, so a lazy edge frame (e.g. the LSH candidate
    // pipeline in q79) would be recomputed per round. Materialize it
    // once; the single-action default keeps the lazy form (one job,
    // ReusedExchange covers the rounds).
    val e = if (redistributeDangling) e0.localCheckpoint(true) else e0
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = ids.select(col("id"), lit(initPico).as("pico"))
    var i = 1
    while (i <= iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          round(col("pico") * lit(damping) / col("outdeg"), 0)
            .cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("__sum"))
      val joined = ids.join(contrib, Seq("id"), "left_outer")
      ranks =
        if (!redistributeDangling)
          joined.select(col("id"),
            (lit(basePico) + coalesce(col("__sum"), lit(0L))).as("pico"))
        else {
          // damped mass parked on out-degree-0 nodes this round, as a
          // broadcast 1-row frame; the per-node share uses the same
          // double-then-round arithmetic as the edge contributions so
          // the unrolled-CTE oracle reproduces it bit-for-bit
          val dangling = ranks
            .join(outdeg.select(col("src").as("id")), Seq("id"), "left_anti")
            .agg(coalesce(sum(col("pico")), lit(0L)).as("__dang"))
          joined.crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit(basePico) + coalesce(col("__sum"), lit(0L)) +
                round(col("__dang") * lit(damping) / lit(n.toDouble), 0)
                  .cast("long")).as("pico"))
        }
      // redistribution references the prior ranks frame TWICE per round
      // (contrib join + dangling aggregate) and Catalyst does not share
      // the subplan — un-materialized rounds would recompute 2^k-fold
      // between checkpoints, so that mode materializes every round; the
      // single-reference default keeps the cheaper every-3rd cadence
      if ((redistributeDangling || i % 3 == 0) && i < iterations)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks.select(col("id"),
      round(col("pico").cast("double") / lit(1e12), 9).as("rank"))
  }
}
