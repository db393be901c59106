package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pipeline.{CountingHolder, CountingSource}

/** Durable cache store: memoization must survive across runs (the
  * reference's cache fixtures, resources/testing.py:17-35). */
class CacheStoreSpec extends SparkTestBase {
  import spark.implicits._

  def requests() = Seq(("get", "http://mock.api/mock/0", null: String),
    ("get", "http://mock.api/mock/1", null: String))
    .toDF("method", "url", "request_body")

  test("fetch appends misses; a NEW store on the same path serves hits; compact keeps one row per key") {
    val dir = Files.createTempDirectory("graft-cache").resolve("cache").toString
    CountingHolder.count.set(0)
    val store1 = new CacheStore(dir, spark)
    val first = store1.fetch(requests(), new CountingSource)
    assert(first.count() === 2)
    assert(CountingHolder.count.get() === 2, "two live fetches")

    // Fresh store instance = fresh run: must hit the persisted cache.
    val store2 = new CacheStore(dir, spark)
    val second = store2.fetch(requests(), new CountingSource)
    assert(second.filter(col("from_cache")).count() === 2)
    assert(CountingHolder.count.get() === 2, "no additional live fetches")

    // Appending a duplicate round then compacting leaves 1 row per key.
    store2.append(first) // no-op: all rows were written... only from_cache=false appended once more? they are from_cache=false
    store2.compact()
    val raw = spark.read.parquet(dir)
    assert(raw.count() === 2)
    assert(new CacheStore(dir, spark).fetch(requests(), new CountingSource)
      .filter(col("from_cache")).count() === 2)
  }

  test("cacheOnly against an empty store returns status-0 rows without fetching") {
    val dir = Files.createTempDirectory("graft-cache").resolve("c2").toString
    CountingHolder.count.set(0)
    val out = new CacheStore(dir, spark).fetch(requests(), new CountingSource, cacheOnly = true)
    assert(out.filter(col("status") === 0).count() === 2)
    assert(CountingHolder.count.get() === 0)
  }

  test("BucketedCacheStore: hits across rounds, Exchange-free cache side, compact keeps bucketing") {
    spark.sql("DROP TABLE IF EXISTS graft_cache_test")
    val store = new BucketedCacheStore(spark, "graft_cache_test", buckets = 4)
    CountingHolder.count.set(0)
    assert(store.fetch(requests(), new CountingSource).count() === 2)
    assert(CountingHolder.count.get() === 2, "two live fetches")
    val second = store.fetch(requests(), new CountingSource)
    assert(second.filter(col("from_cache")).count() === 2)
    assert(CountingHolder.count.get() === 2, "round 2 must be all cache hits")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // latest-wins read rides the bucketing: window with NO Exchange
      val readPlan = store.read().queryExecution.executedPlan.toString
      assert(!readPlan.contains("Exchange"),
        s"latest-wins window must consume the bucketing:\n$readPlan")
      // the EXACT cache-side shape fetchWithCache(broadcastCache=false)
      // joins (liveCacheView): only the requests side may shuffle
      val keyed = requests()
        .withColumn("uri", call_function("graft_uri_from_url", col("url")))
        .withColumn("data_hash", call_function("graft_hash_from_data",
          coalesce(col("request_body"), lit(""))))
      val joined = keyed.join(Resources.liveCacheView(store.read()),
        Seq("uri", "data_hash"), "left_outer")
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
      assert(exchanges === 1,
        s"cache side must not reshuffle (1 requests-side Exchange expected):\n$plan")
      assert(joined.filter(col("c_status").isNotNull).count() === 2)

      // append a duplicate round, compact → one row per key, still bucketed
      store.append(second.withColumn("from_cache", lit(false)))
      assert(spark.table("graft_cache_test").count() === 4)
      store.compact()
      assert(spark.table("graft_cache_test").count() === 2)
      val postPlan = store.read().queryExecution.executedPlan.toString
      assert(!postPlan.contains("Exchange"), s"compact must keep the bucketing:\n$postPlan")
      assert(store.fetch(requests(), new CountingSource).filter(col("from_cache")).count() === 2)
      assert(CountingHolder.count.get() === 2, "post-compact fetch still all hits")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("a later failure row never shadows a cached success; compact keeps the success (both layouts)") {
    // the documented concurrent-writer model: W1's 200 lands, then
    // W2's 597 transport row for the SAME key lands later — a
    // created_at-only latest-wins would serve nothing for the key
    // (liveCacheView filters failures) and the next compact would
    // DESTROY the 200 permanently
    def rows(status: Int, ts: Long) = Seq(
      ("mock.api/mock/0", graft.core.Hashing.sha1Hex(""), "get", "http://mock.api/mock/0",
        null: String, status, "{}", if (status == 200) "body" else "err",
        false, new java.sql.Timestamp(ts)))
      .toDF(Resources.schema.fieldNames: _*)
    // plain layout
    val dir = Files.createTempDirectory("graft-cache").resolve("shadow").toString
    val store = new CacheStore(dir, spark)
    store.append(rows(200, 1000L))
    store.append(rows(597, 2000L))
    def servedStatus(df: org.apache.spark.sql.DataFrame): Int =
      df.filter(col("uri") === "mock.api/mock/0").head.getAs[Int]("status")
    assert(servedStatus(store.read()) === 200, "success wins over a later failure")
    store.compact()
    assert(servedStatus(store.read()) === 200, "compact keeps the success")
    assert(spark.read.parquet(dir).count() === 1)
    // a newer SUCCESS still supersedes an older one
    store.append(rows(200, 3000L).withColumn("body", lit("body2")))
    assert(store.read().filter(col("uri") === "mock.api/mock/0")
      .head.getAs[String]("body") === "body2")
    // bucketed layout
    spark.sql("DROP TABLE IF EXISTS graft_cache_shadow")
    val bstore = new BucketedCacheStore(spark, "graft_cache_shadow", buckets = 4)
    bstore.append(rows(200, 1000L))
    bstore.append(rows(597, 2000L))
    assert(servedStatus(bstore.read()) === 200)
    bstore.compact()
    assert(servedStatus(bstore.read()) === 200)
  }
}
