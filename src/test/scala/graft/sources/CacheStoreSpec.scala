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
}
