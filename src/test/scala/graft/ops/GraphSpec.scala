package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: a hub out-ranks leaves; isolated nodes sit at the floor") {
    val nodes = (0L until 10L).toDF("id")
    // star: 1..5 all point at 0 (and 0 back, symmetric); 6..9 isolated
    val pairs = (1L to 5L).map(i => (i, 0L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L), "the hub must out-rank a leaf")
    assert(r(1L) > r(6L), "a connected leaf must out-rank an isolated node")
    assert((1L to 5L).map(r).distinct.size === 1, "symmetric leaves tie exactly")
    assert((6L to 9L).map(r).distinct.size === 1, "isolated nodes tie at the floor")
    val floor = math.round(1e12 * 0.15 / 10) / 1e12
    assert(math.abs(r(6L) - floor) < 1e-9, "isolated rank == base only")
  }

  test("pageRank is partition-exact (pico-unit integer sums)") {
    val nodes = (0L until 40L).toDF("id")
    val pairs = (0L until 40L).map(i => (i, (i * 7 + 3) % 40))
      .filter { case (a, b) => a != b }
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val a = Graph.pageRank(nodes, edges, iterations = 6)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(nodes.repartition(7), edges.repartition(5),
        iterations = 6)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a === b)
  }

  test("pageRank conserves non-dangling mass within rounding") {
    val nodes = (0L until 6L).toDF("id")
    // a 6-cycle: every node has outdeg 1, no dangling loss
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 8)
      .collect().map(_.getDouble(1))
    assert(math.abs(r.sum - 1.0) < 1e-6, s"cycle mass conserved, got ${r.sum}")
    assert(r.distinct.size === 1, "a cycle is symmetric — all ranks equal")
  }

  test("dangling redistribution conserves total mass where the default leaks it") {
    val nodes = (0L until 8L).toDF("id")
    // chain 0→1→2→3; node 3 dangles; 4..7 isolated (also dangling)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val leaky = Graph.pageRank(nodes, edges, iterations = 6)
      .collect().map(_.getDouble(1)).sum
    val conserved = Graph.pageRank(nodes, edges, iterations = 6,
        redistributeDangling = true)
      .collect().map(_.getDouble(1)).sum
    assert(leaky < 0.6, s"default leaks dangling mass each round, got $leaky")
    assert(math.abs(conserved - 1.0) < 1e-6,
      s"redistributed mass sums to 1, got $conserved")
  }

  test("dangling redistribution is partition-exact and keeps rank order") {
    val nodes = (0L until 30L).toDF("id")
    // directed edges only (near-dup pairs as emitted): many dangling dsts
    val pairs = (0L until 20L).map(i => (i, (i * 3 + 1) % 30))
      .filter { case (a, b) => a != b }
    val edges = pairs.toDF("src", "dst")
    val a = Graph.pageRank(nodes, edges, iterations = 5,
        redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(nodes.repartition(7), edges.repartition(5),
        iterations = 5, redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a === b, "pico-unit arithmetic is partition-invariant")
  }
}
