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

    // --- training-data operators at 600k synthetic text docs ---------
    val textDocs = timed("build 600k text docs") {
      // Word text keyed off numeric columns. The shingle space must be
      // LARGE (distinct words per position) or every 3-gram is shared
      // by ~n/vocab docs and any blocking scheme degenerates to n² —
      // which is a data property, not an operator property. Word =
      // "w<position><value mod prime>"; coprime moduli give ~10^7
      // distinct shingles over 600k docs with occasional collisions.
      def word(c: org.apache.spark.sql.Column, pos: Int, mod: Int) =
        concat(lit(s"w$pos"), pmod(c.cast("long"), lit(mod)))
      // doc_id must be UNIQUE: the synthetic lineitem's (orderkey,
      // linenumber) collides, and duplicate doc ids manufacture
      // hamming-0 / jaccard-1.0 self-pairs in the dedup family (found
      // in r4: the old probe's "1181 simhash pairs" were exactly that
      // artifact, amplified by the verify join's many-to-many
      // re-attach). The row_number window partitions BY ORDER — a
      // global unpartitioned window would serialize the whole frame
      // through one task — and orders per order ≤ ~100, so
      // orderkey*100 + rn is unique and deterministic.
      li.withColumn("doc_id",
          (col("l_orderkey") * 100 + row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("l_orderkey"))
              .orderBy(col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("l_extendedprice")))).cast("long"))
        .select(col("doc_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            word(col("l_partkey"), 1, 97), word(col("l_suppkey"), 2, 89),
            word(col("l_orderkey"), 3, 83), word(col("l_quantity"), 4, 47),
            word(col("l_partkey"), 5, 79), word(col("l_suppkey"), 6, 73),
            word(col("l_orderkey"), 7, 71), word(col("l_extendedprice"), 8, 67)).as("text"),
          word(col("l_suppkey"), 0, 20).as("source"),
          col("l_extendedprice").cast("long").as("n_chars"))
        .localCheckpoint(true)
    }
    // SPARK_GRAFT_PROBE_SCALE=k replicates the corpus k× with per-copy
    // salt words: distinct ids, texts below the 0.9 jaccard threshold
    // but still LSH-candidate-similar across copies — so the scaled
    // probe is BOTH a volume check and a dup-heavy stress (the
    // candidate graph densifies ~50× at k=4: 3.3 M pairs from 69 k).
    val probeScale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "1").toInt
    val scaledDocs =
      if (probeScale <= 1) textDocs
      else (0 until probeScale).map { k =>
        if (k == 0) textDocs
        else textDocs
          .withColumn("doc_id", col("doc_id") + lit(k * 1000000000L))
          .withColumn("text", concat(col("text"),
            lit(s" c$k"), lit("x"), pmod(col("doc_id"), lit(101)),
            lit(s" d$k"), lit("y"), pmod(col("doc_id"), lit(103))))
      }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[scale]   text docs = ${scaledDocs.count()}")

    timed("exact dedup 600k") {
      println(s"[scale]   groups = ${graft.ops.Dedup.exactGroups(scaledDocs, "doc_id", "text").count()}")
    }

    timed("minhash+LSH candidates 600k") {
      val pairs = graft.ops.Dedup.lshCandidatePairs(scaledDocs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      println(s"[scale]   candidate pairs = ${pairs.count()}")
    }

    timed("ngram jaccard blocked+capped 600k") {
      val nd = graft.ops.Dedup.ngramJaccardBlocked(scaledDocs, "doc_id", "text",
        threshold = 0.9, shingleSize = 3, maxShingleFreq = 200)
      println(s"[scale]   near-dup pairs = ${nd.count()}")
    }

    timed("simhash near-dups 600k") {
      val nd = graft.ops.Dedup.simhashNearDuplicates(scaledDocs, "doc_id", "text",
        maxDistance = 2)
      println(s"[scale]   simhash pairs = ${nd.count()}")
    }

    timed("gopher quality + langid + stratified 600k") {
      val m = graft.ops.Curation.gopherMetrics(col("text"))
      val kept = scaledDocs
        .withColumn("keep", m.getField("keep"))
        .withColumn("lang", graft.ops.TextOps.languageId(col("text")))
        .filter(col("keep"))
      val sampled = graft.ops.Curation.stratifiedSample(kept, "lang", "doc_id",
        Map("en" -> 10), defaultRate = 50)
      println(s"[scale]   kept+sampled = ${sampled.count()}")
    }

    timed("domain cap 600k") {
      println(s"[scale]   capped = ${graft.ops.Curation.domainCap(
        scaledDocs, "source", "n_chars", "doc_id", maxPerDomain = 1000).count()}")
    }

    timed("pii scrub 600k") {
      val p = graft.ops.Curation.scrubPii(col("text"))
      println(s"[scale]   redactions = ${scaledDocs
        .select((p.getField("n_emails") + p.getField("n_phones")).as("n"))
        .agg(sum(col("n"))).head.get(0)}")
    }

    timed("decontaminate 600k vs 1k bench") {
      val bench = scaledDocs.filter(col("doc_id") % 600 === 0).select(col("text"))
      val d = graft.ops.Curation.decontaminate(scaledDocs, bench, "doc_id", "text")
      println(s"[scale]   contaminated = ${d.filter(col("contaminated")).count()}")
    }

    timed("chunk 600k (32/8)") {
      println(s"[scale]   chunks = ${graft.ops.Curation.chunk(
        scaledDocs, "doc_id", "text", size = 32, overlap = 8).count()}")
    }

    timed("greedy packing 600k (20 shards)") {
      println(s"[scale]   packed = ${graft.ops.Curation.packSequencesGreedy(
        scaledDocs, "source", "doc_id", "text", window = 512).count()}")
    }

    timed("cluster resolution over LSH pairs 600k") {
      val pairs = graft.ops.Dedup.lshCandidatePairs(scaledDocs, "doc_id", "text",
        k = 16, bands = 4, shingleSize = 3)
      val resolved = graft.ops.Dedup.resolveClusters(
        scaledDocs.select(col("doc_id")), "doc_id", pairs)
      println(s"[scale]   survivors = ${resolved.filter(col("keep")).count()}")
    }

    // --- embedding family at 600k × 16 dims --------------------------
    val embs = timed("build 600k embeddings (16d)") {
      // md5-hash components (same recipe as the SRP planes): linear
      // combinations of the integer keys put every vector on a 3-dim
      // lattice — pairwise cosines cluster near ±1 and "near-dup"
      // counts explode into the hundreds of millions (a data property,
      // not an operator property). Hash-derived components are
      // high-entropy in all 16 dims. Cast the COMPONENT to float —
      // Spark promotes `/` to double, the contract is array<float>.
      // vec_id must be UNIQUE for the same reason doc_id is above:
      // orderkey*10+linenumber collides on ~143k of 600k rows at
      // sf0.1, and colliding ids share their hash-derived embedding —
      // the SRP/IVF/topK baselines would be measured on a ~457k-
      // distinct corpus with duplicated ids. Same row_number recipe.
      def comp(d: Int) = ((conv(substring(md5(concat(
        col("vec_id").cast("string"), lit(s"|$d"))),
        1, 8), 16, 10).cast("long") % 1000000L).cast("double") / 1000000.0 - 0.5)
        .cast("float")
      li.withColumn("vec_id",
          (col("l_orderkey") * 100 + row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("l_orderkey"))
              .orderBy(col("l_linenumber"), col("l_partkey"),
                col("l_suppkey"), col("l_extendedprice")))).cast("long"))
        .select(col("vec_id"), array((0 until 16).map(comp): _*).as("embedding"))
        .localCheckpoint(true)
    }
    println(s"[scale]   embeddings = ${embs.count()}")

    timed("SRP near-dup 600k (16 planes × 2 tables, capped)") {
      // 16 planes → ~65k buckets/table → ~9 vectors per bucket: pair
      // counts stay linear-ish in n. 12 planes at this n means ~150 per
      // bucket = ~10k pairs per bucket — quadratic blow-up territory.
      val nd = graft.ops.Similarity.nearDuplicates(embs, threshold = 0.95,
        planes = 16, tables = 2, maxBucketSize = 2000)
      println(s"[scale]   embedding near-dups = ${nd.count()}")
    }

    timed("LSH topK: ~100 probes vs 600k") {
      val t = graft.ops.Similarity.lshTopK(embs.filter(col("vec_id") < 3200),
        embs, k = 5, planes = 10, tables = 2)
      println(s"[scale]   topk rows = ${t.count()}")
    }

    // k ≈ sqrt(n)/3: 600k vectors / 256 lists ≈ 2.3k per inverted list —
    // a codebook-sized coarse level, not a toy 8-centroid fixture
    val codebook = timed("IVF codebook train 600k (k=256, 2 rounds)") {
      graft.ops.Similarity.trainCodebook(embs, k = 256, iterations = 2)
        .localCheckpoint(true)
    }

    timed("IVF assign + search 600k (256 lists)") {
      val hits = graft.ops.Similarity.ivfSearch(embs.filter(col("vec_id") < 3200),
        embs, codebook, k = 5, nProbe = 2)
      println(s"[scale]   ivf rows = ${hits.count()}")
    }

    // m=4 subspaces over the 16-dim probe vectors (4× compression);
    // residual book trained per subspace off the coarse assignment
    val pqBook = timed("IVF-PQ residual book (m=4, k=16)") {
      graft.ops.Similarity.pqTrainCodebook(
        graft.ops.Similarity.coarseResiduals(embs, codebook), m = 4, k = 16,
        iterations = 1).localCheckpoint(true)
    }

    timed("IVF-PQ encode 600k") {
      val enc = graft.ops.Similarity.ivfPqEncode(embs, codebook, pqBook, m = 4)
      println(s"[scale]   encoded = ${enc.count()}")
    }

    timed("IVF-PQ ADC search: ~100 probes vs 600k codes") {
      val enc = graft.ops.Similarity.ivfPqEncode(embs, codebook, pqBook, m = 4)
        .localCheckpoint(true)
      val hits = graft.ops.Similarity.ivfPqSearch(
        embs.filter(col("vec_id") < 3200), enc, codebook, pqBook,
        k = 5, nProbe = 2, m = 4)
      println(s"[scale]   adc rows = ${hits.count()}")
    }

    timed("semantic dedup 600k (256 clusters, capped)") {
      val kept = graft.ops.Similarity.semanticDedup(embs, codebook,
        threshold = 0.95, maxClusterSize = 20000)
      println(s"[scale]   survivors = ${kept.count()}")
    }

    // --- round-5 statistics / sampling operators ---------------------
    timed("KMV native aggregate over 600k keys") {
      val est = graft.ops.Sketches.kmvDistinct(li, "l_partkey", k = 256)
        .head.getDouble(2)
      println(s"[scale]   estimate = $est")
    }

    timed("KMV relational (distinct shuffle) — A/B") {
      val est = graft.ops.Sketches.kmvDistinctRelational(li, "l_partkey", k = 256)
        .head.getDouble(2)
      println(s"[scale]   estimate = $est")
    }

    timed("exact deciles of 600k longs (two-pass rank)") {
      val out = graft.ops.Stats.exactQuantiles(li, "l_extendedprice",
        (1 to 9).map(_ / 10.0))
      println(s"[scale]   rows = ${out.count()}")
    }

    timed("heavy hitters over 600k keys (share >= 0.4%)") {
      val out = graft.ops.Stats.heavyHitters(li, "l_quantity", minShare = 0.004)
      println(s"[scale]   rows = ${out.count()}")
    }

    timed("mixture sample 600k -> ~60k (16 domains)") {
      val domed = li.withColumn("dom",
        concat(lit("d"), pmod(col("l_suppkey"), lit(16))))
        .withColumn("rid", col("l_orderkey") * 100 + col("l_linenumber"))
      val out = graft.ops.Curation.mixtureSample(domed, "dom", "rid",
        alpha = 0.5, targetRows = 60000)
      println(s"[scale]   sampled = ${out.count()}")
    }

    timed(s"paragraph dedup ${600 * probeScale}k (3-token paras, window df)") {
      // scaledDocs: dup-densification multiplies every paragraph's
      // h-group size ×scale — the window form's buffer hotspot
      val para = scaledDocs.withColumn("ptext",
        regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n"))
      val out = graft.ops.Dedup.paragraphDedup(para, "doc_id", "ptext",
        splitPattern = "\n", minDocFreq = 2)
      // force the rebuild: a bare count() prunes text_clean entirely
      val r = out.agg(sum(length(col("text_clean"))).as("chars"),
        sum(col("n_kept")).as("kept")).head()
      println(s"[scale]   chars = ${r.getLong(0)}, kept = ${r.getLong(1)}")
    }

    timed("CDC chunking 600k text docs") {
      val out = graft.ops.Curation.cdcChunks(textDocs, "doc_id", "text",
        window = 8, divisor = 32)
      println(s"[scale]   chunks = ${out.count()}")
    }

    timed("bigram LM score 600k (self-trained)") {
      val out = graft.ops.Relevance.bigramLmScore(textDocs, textDocs,
        "doc_id", "text")
      println(s"[scale]   scored = ${out.count()}")
    }

    timed("profile lineitem (4 cols, one scan)") {
      val out = graft.ops.Stats.profile(li,
        Seq("l_partkey", "l_suppkey", "l_quantity", "l_returnflag"), k = 256)
      println(s"[scale]   rows = ${out.count()}")
    }

    timed("pagerank 5 rounds, 600k nodes / ~1.2M edges") {
      val ids = li.select((col("l_orderkey") * 100 + col("l_linenumber"))
        .as("id")).distinct().localCheckpoint(true)
      val fwd = ids.select(col("id").as("src"),
        (pmod(col("id") * 7919 + 13, lit(600000)) * 100).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      val r = graft.ops.Graph.pageRank(ids, edges, iterations = 5)
      println(s"[scale]   ranked = ${r.count()}")
    }

    timed("contrastive triplets from 100k pairs over 600k corpus") {
      val ids = li.select((col("l_orderkey") * 100 + col("l_linenumber"))
        .as("doc_id")).distinct().localCheckpoint(true)
      val pairs = ids.filter(pmod(col("doc_id"), lit(6)) === 0)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b")).limit(100000)
      val out = graft.ops.Contrastive.contrastivePairs(ids, "doc_id", pairs)
      println(s"[scale]   triplets = ${out.count()}")
    }

    spark.stop()
  }
}
