package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Distributed connected-components probe — the 100 TB-critical path
  * that every bench-scale graph skips (they all fit the ≤1M-edge driver
  * fast path). Forces `driverEdgeLimit = 0` on synthetic graphs far past
  * the fast-path cutover and times the algorithm/cadence matrix:
  *
  *   - frontier min-label propagation at checkpointInterval 1 / 2 / 4
  *   - full-relabel min-label (the pre-frontier loop, inlined here as
  *     the A/B reference — every round shuffles every label)
  *   - large-star/small-star alternation
  *
  * over two graph shapes:
  *
  *   - `lsh`: millions of small shallow components (16 nodes, 24 random
  *     intra-edges each) — the shape LSH/near-dup pair generation
  *     actually emits; diameter ~2-4.
  *   - `chain`: length-32 paths — adversarial diameter, the shape that
  *     separates propagation (diameter rounds) from star (log rounds).
  *
  * Every config's (n_nodes, n_clusters, Σcluster) must agree — the
  * probe is also a large-scale equivalence check. Not part of CI.
  * Usage:
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.CCProbe [edges] [shape,shape]"
  */
object CCProbe {

  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(200000000L)
    val shapes = args.drop(1).headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("lsh", "chain"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions default 4× cores here, NOT the bench's 1×: at
    // 200M edges a 32-way shuffle gives ~2 GB per task state and local
    // mode pays all 32 tasks' pages from ONE heap — 64 GiB OOMs (first
    // probe attempt died in the frontier join). 128-way cuts per-task
    // state 4× for the same total work; on a real cluster this is
    // exactly "size partitions to fit executor memory".
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      (cpus.toInt * 4).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(name: String)(f: => (Long, Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (nodes, clusters, checksum) = f
      println(f"[ccprobe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.1f s" +
        f"  nodes=$nodes%d clusters=$clusters%d sum=$checksum%d")
    }
    def summarize(labels: DataFrame): (Long, Long, Long) = {
      val r = labels.agg(count(lit(1)), count_distinct(col("cluster")),
        sum(col("cluster")).cast("decimal(38,0)").cast("string")).head
      (r.getLong(0), r.getLong(1),
        new java.math.BigDecimal(r.getString(2)).longValueExact())
    }

    // full-relabel min-label: the pre-frontier distributed loop, kept
    // verbatim as the A/B reference (label-sum convergence, every round
    // re-shuffles the whole label frame past the whole edge frame)
    def fullRelabel(pairs: DataFrame, maxIterations: Int): DataFrame = {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct()
        .localCheckpoint()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id"))
        .localCheckpoint()
      def labelSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("cluster")).cast("decimal(38,0)")).head.getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = edges.isEmpty
      while (!converged && iter < maxIterations) {
        val neighborMin = edges
          .join(labels.select(col("id").as("dst"), col("cluster").as("nc")), Seq("dst"))
          .groupBy(col("src").as("id")).agg(min(col("nc")).as("nmin"))
        val updated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
          .localCheckpoint()
        val newSum = labelSum(updated)
        converged = newSum.compareTo(prevSum) == 0
        prevSum = newSum
        labels = updated
        iter += 1
      }
      labels
    }

    def clearState(): Unit = {
      // let the ContextCleaner release the previous config's
      // now-unreferenced checkpoint/cache blocks (a blanket unpersist
      // would also tear down the shared input frame's checkpoint)
      System.gc()
      Thread.sleep(2000)
    }

    shapes.foreach { shape =>
      // deterministic synthetic graphs from spark.range — no data files,
      // no Math.random, reproducible across runs
      val (pairs, maxIter) = shape match {
        case "lsh" =>
          // components of 16 nodes / 24 random intra-edges: the shallow
          // many-small-clusters shape of LSH candidate pairs
          val s = 16L; val epc = 24L
          (spark.range(nEdges).select(
            ((col("id") / epc).cast("long") * s +
              pmod(xxhash64(col("id"), lit(1)), lit(s))).as("id_a"),
            ((col("id") / epc).cast("long") * s +
              pmod(xxhash64(col("id"), lit(2)), lit(s))).as("id_b"))
            .filter(col("id_a") =!= col("id_b")), 20)
        case "chain" =>
          // length-32 paths: diameter 31 — propagation worst case.
          // NB Spark `/` on longs is DOUBLE division; cast back for the
          // integer chain index.
          val l = 31L
          val chainIx = (col("id") / l).cast("long")
          val pos = pmod(col("id"), lit(l))
          (spark.range(nEdges).select(
            (chainIx * (l + 1) + pos).as("id_a"),
            (chainIx * (l + 1) + pos + 1).as("id_b")), 40)
        case other => throw new IllegalArgumentException(s"unknown shape: $other")
      }
      val frame = pairs.localCheckpoint(true)
      println(s"[ccprobe] shape=$shape edges=${frame.count()}")

      // JIT/codegen warmup outside the timings: every algorithm once on
      // a small prefix of the same graph
      val warm = frame.limit(100000).localCheckpoint(true)
      Dedup.connectedComponents(warm, driverEdgeLimit = 0).count()
      Dedup.connectedComponentsStar(warm).count()
      fullRelabel(warm, 20).count()
      clearState()

      for (cadence <- Seq(1, 2, 4)) {
        clearState()
        timed(s"$shape frontier/ckpt=$cadence") {
          summarize(Dedup.connectedComponents(frame, maxIterations = maxIter,
            driverEdgeLimit = 0, checkpointInterval = cadence))
        }
      }
      clearState()
      timed(s"$shape full-relabel") {
        summarize(fullRelabel(frame, maxIter))
      }
      clearState()
      timed(s"$shape star") {
        summarize(Dedup.connectedComponentsStar(frame, maxIterations = maxIter))
      }
      clearState()
    }
    spark.stop()
  }
}
