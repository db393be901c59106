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
    * BROADCAST 1-row frame (a filter-aggregate of the state frame,
    * which carries each node's out-degree — no driver collect; the
    * q76-style stats-frame crossJoin shape). This mode materializes
    * the rank frame every round (it is referenced three times per
    * iteration — see the loop note).
    *
    * Scale shape: one (src-keyed) degree aggregate; per iteration one
    * join of edges to the rank frame (both keyed on the node id) and
    * one map-side-combined sum by dst; lineage checkpoints every third
    * round for LONG loops only (the connectedComponents lesson — an
    * unrolled 10+-join plan re-optimizes quadratically; short loops
    * compose into one job). `edges` is DIRECTED
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
    val e = if (redistributeDangling) graft.core.Materialize.frame(e0) else e0
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    if (!redistributeDangling) {
      // Default mode: ranks is referenced ONCE per round (the contrib
      // join — the spine is `ids`), rounds compose lazily, and the
      // every-3rd-round checkpoint bounds Catalyst's re-optimization
      // of the unrolled plan. Measured and REJECTED (r16): dropping
      // the in-loop checkpoint for short loops to fuse all rounds into
      // one job — q78 2.02 → 2.46 s; the fused plan serializes the
      // per-round broadcast builds (round i's build waits on round
      // i−1's result inside one job) where the checkpoint had let the
      // materialized frame feed them immediately. The cadence stays.
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
        ranks = ids.join(contrib, Seq("id"), "left_outer")
          .select(col("id"),
            (lit(basePico) + coalesce(col("__sum"), lit(0L))).as("pico"))
        if (i % 3 == 0 && i < iterations)
          ranks = graft.core.Materialize.frame(ranks)
        i += 1
      }
      return ranks.select(col("id"),
        round(col("pico").cast("double") / lit(1e12), 9).as("rank"))
    }
    // Redistribution mode: the rank frame is consumed THREE times per
    // round (contrib join, dangling aggregate, next round's spine) and
    // Catalyst copies the subtree per consumer, so every round must
    // materialize. r16 reshape, results bit-identical:
    //  - `outdeg` rides IN the state frame (null = dangling), so the
    //    per-round outdeg join and the left_anti dangling probe are
    //    both gone — the dangling sum is a FILTER of the state frame;
    //  - the state frame itself is the spine (it carries every node),
    //    so the `ids` join per round is gone too;
    //  - materialization is a LAZY localCheckpoint: the round's
    //    dangling-broadcast job computes and caches the state blocks
    //    as a side effect, where the old eager checkpoint was its own
    //    dedicated job per round (half the job count; same caveat —
    //    blocks are unreplicated, see Materialize's mode note).
    var state = ids
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_outer")
      .select(col("id"), lit(initPico).as("pico"), col("outdeg"))
      .localCheckpoint(false)
    var i = 1
    while (i <= iterations) {
      val contrib = e
        .join(state.select(col("id").as("src"), col("pico"), col("outdeg")),
          Seq("src"))
        .select(col("dst").as("id"),
          round(col("pico") * lit(damping) / col("outdeg"), 0)
            .cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("__sum"))
      // damped mass parked on out-degree-0 nodes this round, as a
      // broadcast 1-row frame; the per-node share uses the same
      // double-then-round arithmetic as the edge contributions so
      // the unrolled-CTE oracle reproduces it bit-for-bit
      val dangling = state.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pico")), lit(0L)).as("__dang"))
      state = state.select(col("id"), col("outdeg"))
        .join(contrib, Seq("id"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(basePico) + coalesce(col("__sum"), lit(0L)) +
            round(col("__dang") * lit(damping) / lit(n.toDouble), 0)
              .cast("long")).as("pico"),
          col("outdeg"))
      if (i < iterations) state = state.localCheckpoint(false)
      i += 1
    }
    state.select(col("id"),
      round(col("pico").cast("double") / lit(1e12), 9).as("rank"))
  }
}
