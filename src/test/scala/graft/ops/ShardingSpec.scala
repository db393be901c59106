package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  test("rendezvous assignment: in range, reasonably balanced, deterministic") {
    val ids = (0L until 2000L).toDF("id")
    val out = ids.select($"id", Sharding.rendezvousShard($"id", 8).as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (_, s) => s >= 0 && s < 8 })
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0L until 8L).toSet, "every shard populated")
    // 2000 keys over 8 shards: expect 250 ± a few sigma (~15)
    sizes.values.foreach(n => assert(n > 175 && n < 325, s"imbalance: $sizes"))
    val again = ids.repartition(7)
      .select($"id", Sharding.rendezvousShard($"id", 8).as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === again.toSet, "pure function of the key")
  }

  test("growing n -> n+1 moves ~1/(n+1) of keys, every one TO the new shard") {
    val ids = (0L until 3000L).toDF("id")
    val audit = Sharding.shardMoveAudit(ids, "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.map(_._1).sorted.toSeq === (0L until 8L))
    assert(audit.map(_._2).sum === 3000L, "every key accounted for")
    val moved = audit.map(_._3).sum
    // expected 3000/9 = 333; allow wide tolerance (3000 Bernoulli trials)
    assert(moved > 230 && moved < 440, s"move fraction should be ~1/9, got $moved/3000")
    assert(audit.map(_._4).sum === 0L,
      "rendezvous invariant: movers only ever land on the NEW shard")
    // consistency with the one-shot form: the audit's s_old equals
    // rendezvousShard(key, 8) — prefix-slice == direct computation
    val direct = ids.select(Sharding.rendezvousShard($"id", 8).as("s"))
      .groupBy("s").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(audit.map(a => a._1 -> a._2).toMap === direct)
  }

  test("releaseManifest: every doc accounted, checksums order-free and sub-manifest-mergeable") {
    val docs = (0L until 500L).map(i => (i, s"text body number $i with words"))
      .toDF("doc_id", "text")
    val m = Sharding.releaseManifest(docs, "doc_id", "text", nShards = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(m.keySet === (0L until 4L).toSet)
    assert(m.values.map(_._1).sum === 500L, "every doc in exactly one shard row")
    assert(m.values.map(_._2).sum === 500L * 6, "6 tokens per doc")
    val again = Sharding.releaseManifest(docs.repartition(13), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(m === again, "manifest is partitioning-invariant")
    // mergeability: manifests of two halves combine to the full one
    // (counts add; checksums add mod p)
    val p = 1000000007L
    val lo = Sharding.releaseManifest(docs.filter($"doc_id" < 250), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5)))).toMap
    val hi = Sharding.releaseManifest(docs.filter($"doc_id" >= 250), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5)))).toMap
    (0L until 4L).foreach { s =>
      val (nLo, cLo) = lo.getOrElse(s, (0L, 0L))
      val (nHi, cHi) = hi.getOrElse(s, (0L, 0L))
      assert(nLo + nHi === m(s)._1)
      assert((cLo + cHi) % p === m(s)._3, s"shard $s checksum must merge")
    }
  }

  test("assignment is a pure projection — no exchange before the audit's single aggregation") {
    val ids = (0L until 100L).toDF("id")
    val assignPlan = ids.select(Sharding.rendezvousShard($"id", 8).as("s"))
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"),
      s"assignment must not shuffle:\n$assignPlan")
    val auditPlan = Sharding.shardMoveAudit(ids, "id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(auditPlan).length <= 1,
      s"audit is one keyed aggregation, got:\n$auditPlan")
  }
}
