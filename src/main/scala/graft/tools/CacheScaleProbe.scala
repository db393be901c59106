package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Documents
import graft.pipeline.{Growth, GrowthSpec}
import graft.sources.{BucketedCacheStore, CacheStore, FetchResponse, Fetcher}

/** Durable-cache scale probe (dev tool, run-once evidence for NOTES):
  * a growth fan-out over N documents through BOTH cache layouts, plus
  * the plain→bucketed migration.
  *
  *  1. live round through the plain parquet store (populates the log);
  *  2. warm round over FRESH documents through the plain store — all
  *     hits; measures the plain layout's per-round cost (the whole log
  *     re-read, latest-wins window re-shuffled, cache re-broadcast);
  *  3. migrate the log into the bucketed table (one append — the rows
  *     read back from any store carry from_cache=false, so append's
  *     miss filter passes them through verbatim);
  *  4. warm round through the bucketed store — all hits; the cache
  *     side of the fetch join consumes the on-disk bucketing.
  *
  * Usage: runMain graft.tools.CacheScaleProbe [nDocs]
  */
object CacheScaleProbe {

  /** Deterministic in-JVM fetcher — no IO, so rounds measure the cache
    * machinery, not a transport. */
  class SyntheticSource extends Fetcher {
    def fetch(method: String, url: String, body: String): FetchResponse =
      FetchResponse(200, "{}", s"""[{"extra":"v${url.split('/').last}"}]""")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val wh = new java.io.File("/tmp/graft_cacheprobe_wh")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    if (wh.exists) rmrf(wh)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.warehouse.dir", wh.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import ProbeTiming.{tm, tmMedian}
    def docs() = Documents.fromProperties(spark.range(n).select(col("id"),
      concat(lit("{\"id\":"), col("id"),
        lit(",\"resource\":\"http://api.test/item/"), col("id"),
        lit("\"}")).as("properties")))
    val growth = GrowthSpec(growthPhase = "probe",
      urlTemplate = "{}", argTemplates = Seq("$.resource"),
      objective = graft.core.Objective("$.0", Seq("extra" -> "$.extra")))
    val fetcher = new SyntheticSource

    def runRound(store: graft.sources.ResourceCache): Unit = {
      val (grown, _) = Growth.growWith(docs(), growth,
        reqs => store.fetch(reqs, fetcher))
      val ok = grown.filter(col("derivatives").contains("\"extra\"")).count()
      require(ok == n, s"$ok of $n docs grew")
    }

    val plain = new CacheStore(s"$wh/plain_cache.parquet", spark)
    // live round is one-shot by nature (it populates the log); warm
    // rounds are all-hits and side-effect-free, so they take medians
    tm(s"plain store, live round ($n docs)") { runRound(plain) }
    tmMedian(s"plain store, warm round (all hits)") { runRound(plain) }
    val bucketed = new BucketedCacheStore(spark, "graft_cache_probe", buckets = 64)
    tm("migrate plain log -> bucketed table") {
      bucketed.append(plain.read().localCheckpoint(true))
    }
    tmMedian(s"bucketed store, warm round (all hits)") { runRound(bucketed) }
    spark.stop()
  }
}
