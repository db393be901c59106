package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{CollectionOps, CollectionSpec, Documents}
import graft.pipeline.{Growth, GrowthSpec}
import graft.core.Objective
import graft.sources.{Fetcher, FetchResponse, Resources}

/** Scale probe: run the document-pipeline operators at sf0.1-derived
  * volume (~600k docs built from lineitem) and print per-stage timings.
  * Not part of CI — a manual harness for the 100 TB design questions:
  * does upsert stay broadcast-shaped, does growth stay linear, does
  * anything collect to the driver. Usage:
  *   sbt "runMain graft.tools.ScaleProbe [sfDir]"
  */
object ScaleProbe {

  class NullFetcher extends Fetcher {
    def fetch(m: String, u: String, b: String): FetchResponse =
      FetchResponse(200, "{}", s"""[{"extra":"x"}]""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.prepare(spark)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      out
    }

    val spec = CollectionSpec("probe", identifier = Some("k"))
    // ~600k docs with JSON properties built from lineitem.
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val props = li.select(concat(
      lit("{\"k\":\""), col("l_orderkey"), lit("-"), col("l_linenumber"),
      lit("\",\"qty\":"), col("l_quantity"),
      lit(",\"price\":"), col("l_extendedprice"), lit("}")).as("properties"))

    val docs = timed("ingest (add 600k)") {
      val d = CollectionOps.add(Documents.empty(spark), props, spec).localCheckpoint(true)
      println(s"[scale]   rows = ${d.count()}")
      d
    }

    timed("content projection (count)") {
      docs.select(Documents.contentCol(docs).as("c"))
        .filter(col("c").contains("\"qty\"")).count()
    }

    val updates = timed("build 10k update batch") {
      docs.limit(10000)
        .select(col("properties"))
        .withColumn("properties",
          call_function("graft_json_merge", col("properties"), lit("""{"updated":true}""")))
        .localCheckpoint(true)
    }

    timed("upsert 10k into 600k") {
      val merged = CollectionOps.upsert(docs, updates, "k", spec)
      println(s"[scale]   merged rows = ${merged.count()}")
    }

    timed("growth fan-out 600k (canned)") {
      val g = GrowthSpec(growthPhase = "probe",
        urlTemplate = "http://x/{}", argTemplates = Seq("$.k"),
        objective = Objective("$.0", Seq("extra" -> "$.extra")))
      val (grown, _) = Growth.grow(docs, g, new NullFetcher, Resources.emptyCache(spark))
      println(s"[scale]   grown ok = ${grown.filter(col("task_results").contains("probe")).count()}")
    }

    timed("split 600k (exact ceil)") {
      CollectionOps.split(docs, 0.8, 0.1, 0.1, seed = 1L)
        .groupBy("split").count().collect().foreach(r => println(s"[scale]   $r"))
    }

    spark.stop()
  }
}
