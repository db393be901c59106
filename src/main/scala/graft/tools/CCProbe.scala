package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Distributed connected-components probe — the 100 TB-critical path
  * that every bench-scale graph skips (they all fit the ≤1M-edge driver
  * fast path). Forces `driverEdgeLimit = 0` on synthetic graphs far past
  * the fast-path cutover and times one (shape, algorithm) configuration
  * per JVM:
  *
  *   - `f1` / `f2` / `f4`: frontier min-label propagation at
  *     checkpointInterval 1 / 2 / 4
  *   - `full`: full-relabel min-label (the pre-frontier loop, inlined
  *     here as the A/B reference — every round shuffles every label)
  *   - `star`: large-star/small-star alternation
  *
  * over two graph shapes:
  *
  *   - `lsh`: millions of small shallow components (16 nodes, 24 random
  *     intra-edges each) — the shape LSH/near-dup pair generation
  *     actually emits; diameter ~2-4.
  *   - `chain`: length-32 paths — adversarial diameter, the shape that
  *     separates propagation (diameter rounds) from star (log rounds).
  *
  * ONE config per invocation (fresh JVM = no cross-config cache/heap
  * contamination; the first matrix attempt ran all configs in one JVM
  * and the accumulated checkpoint blocks distorted later configs).
  * Every config's (n_nodes, n_clusters, Σcluster) triple must agree
  * across runs of the same (edges, shape) — the probe doubles as a
  * large-scale equivalence check; graphs are deterministic (xxhash64
  * of spark.range, no RNG state). GRAFT_CC_DEBUG=1 adds per-round
  * frontier/edge counts from the real operator loop. Not part of CI.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=96g GRAFT_CC_DEBUG=1 \
  *     sbt "runMain graft.tools.CCProbe <edges> <lsh|chain> <f1|f2|f4|full|star>"
  */
object CCProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CCProbe <edges> <lsh|chain> <f1|f2|f4|full|star>")
    val nEdges = args(0).toLong
    val shape = args(1)
    val config = args(2)
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
      val debug = sys.env.get("GRAFT_CC_DEBUG").contains("1")
      while (!converged && iter < maxIterations) {
        val t0 = System.nanoTime()
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
        if (debug) println(f"[cc-full] iter=$iter%-3d " +
          f"round_s=${(System.nanoTime() - t0) / 1e9}%.1f")
      }
      labels
    }

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
    println(s"[ccprobe] shape=$shape edges=${frame.count()} config=$config " +
      s"shuffle=$shuffle")

    def run(df: DataFrame): DataFrame = config match {
      case "f1" => Dedup.connectedComponents(df, maxIterations = maxIter,
        driverEdgeLimit = 0, checkpointInterval = 1, algorithm = "frontier")
      case "f2" => Dedup.connectedComponents(df, maxIterations = maxIter,
        driverEdgeLimit = 0, checkpointInterval = 2, algorithm = "frontier")
      case "f4" => Dedup.connectedComponents(df, maxIterations = maxIter,
        driverEdgeLimit = 0, checkpointInterval = 4, algorithm = "frontier")
      case "full" => fullRelabel(df, maxIter)
      case "star" => Dedup.connectedComponentsStar(df, maxIterations = maxIter)
      case other => throw new IllegalArgumentException(s"unknown config: $other")
    }

    // JIT/codegen warmup outside the timing: the selected algorithm once
    // on a small prefix of the same graph
    run(frame.limit(100000).localCheckpoint(true)).count()
    System.gc()

    val t0 = System.nanoTime()
    val (nodes, clusters, checksum) = summarize(run(frame))
    println(f"[ccprobe] $shape $config%-6s ${(System.nanoTime() - t0) / 1e9}%8.1f s" +
      f"  nodes=$nodes%d clusters=$clusters%d sum=$checksum%d")
    spark.stop()
  }
}
