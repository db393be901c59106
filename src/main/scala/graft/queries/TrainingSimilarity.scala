package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Similarity}

/** Similarity search / embedding family: cosine top-k, SRP and IVF ANN, quantization (int8/PQ/ADC/IVF-PQ), semantic dedup, cluster sampling, centroid and recall audits.
  *
  * Split from the monolithic TrainingData registry by domain (round
  * 10, maintainability only): every query's Spark definition and its
  * DuckDB oracle SQL live in THIS file, in the same key order, so a
  * semantics change cannot land on one side without the other being
  * one screen away. Registered through [[TrainingData]]. */
private[queries] object TrainingSimilarity {
  import TrainingShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact cosine top-3 for a 5-vector probe set.
    "q25_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs via multi-table SRP LSH;
    // md5-derived planes keep the bucketing oracle-reproducible.
    // 6 tables × 3 planes = full recall on this corpus. The 64-dim
    // embeddings take the COMPACT path (vectors ride the one bucket
    // shuffle, in-group cosine kernel — two exchanges); the ids-only
    // nearDuplicates form is the high-dim default (SimilaritySpec
    // pins the two forms equal).
    "q26_embed_neardup" -> ((s, d) => {
      Similarity.nearDuplicatesCompact(t(s, d, "embeddings"), threshold = 0.45,
          planes = 3, tables = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed ANN (SRP buckets from md5-derived planes → oracle-
    // checkable); 2 hash tables double the candidate recall.
    "q27_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 50), emb, k = 3, planes = 4,
          tables = 2)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // IVF ANN: 8 seed centroids (deterministic: lowest vec_ids stand in
    // for a trained codebook — the operator takes ANY centroid frame),
    // probes visit their 2 nearest inverted lists, exact cosine ranks.
    "q35_ivf_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfSearch(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbe = 2)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Symmetric int8 embedding quantization (4× storage at ~1% cosine
    // error): per-vector scale + floor codes, summarized per vector.
    "q42_quantize" -> ((s, d) => {
      val q = Similarity.quantize(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"), q.as("q"))
        .select(col("vec_id"),
          round(col("q.scale").cast("double"), 6).as("scale"),
          aggregate(col("q.codes"), lit(0L), (acc, c) => acc + c.cast("long")).as("qsum"),
          array_min(col("q.codes")).cast("long").as("qmin"),
          array_max(col("q.codes")).cast("long").as("qmax"))
        .orderBy(col("vec_id"))
    }),

    // Quantized IVF ANN: q35's index shape, but candidates ride the
    // join as int8 codes and scoring is the exact integer kernel —
    // per-vector scales cancel in cosine, so the search path never
    // touches float32 (4× less data at the 100 TB target).
    "q48_ivf_quantized" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfSearchQuantized(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbe = 2)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Cluster-balanced sampling (SemDeDup-style diverse subset):
    // IVF-assign to the 8 lowest-id seed centroids, then exactly 10
    // vectors per cluster by the stable md5-of-id order.
    "q54_cluster_sample" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.clusterBalancedSample(emb,
          emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          perCluster = 10)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }),

    // Product-quantization encoding: 64-dim float32 → 8 codes (one per
    // 8-dim subspace, argmin over the 4 lowest-id seed subvectors) —
    // 32× storage compression; one (vec, sub, code) row per code.
    "q55_pq_encode" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val book = Similarity.pqSeedCodebook(emb, m = 8, k = 4)
      // posexplode_outer: codes is a fixed-length literal array (never
      // empty), and the outer variant skips the size>0 Filter that
      // plain posexplode plans — which would re-evaluate all 8 argmin
      // kernels per row a second time
      Similarity.pqEncode(emb, book, m = 8)
        .select(col("vec_id"), posexplode_outer(col("codes")).as(Seq("sub", "code")))
        .select(col("vec_id"), col("sub").cast("long").as("sub"),
          col("code").cast("long").as("code"))
        .orderBy(col("vec_id"), col("sub"))
    }),

    // PQ ADC search: probes precompute per-subspace lookup tables and
    // every corpus vector scores from its 8 codes alone — the float-free
    // scan path over q55's codes.
    "q56_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val book = Similarity.pqSeedCodebook(emb, m = 8, k = 4)
      val codes = Similarity.pqEncode(emb, book, m = 8)
      Similarity.pqSearchADC(emb.filter(col("vec_id") < 10), codes, book,
          k = 3, m = 8)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Semantic dedup (SemDeDup): coarse IVF clusters scope the cosine
    // near-dup search; components collapse to one min-id survivor.
    "q59_semantic_dedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.semanticDedup(emb,
          emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          threshold = 0.4, maxClusterSize = 2000)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // IVF-PQ: coarse inverted lists + PQ codes over float RESIDUALS
    // (FAISS IndexIVFPQ layout); search is per-list L2² ADC over the
    // stored codes, ranked ascending.
    "q60_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val coarse = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      // seed the residual book OUTSIDE the coarse set: vecs 0-7 are the
      // coarse centroids, so their residuals are zero vectors — a book
      // seeded from them scores everything 0 and discriminates nothing
      val resBook = Similarity.pqSeedCodebook(
        Similarity.coarseResiduals(emb, coarse).filter(col("vec_id") >= 8),
        m = 8, k = 4)
      val encoded = Similarity.ivfPqEncode(emb, coarse, resBook, m = 8)
      Similarity.ivfPqSearch(emb.filter(col("vec_id") < 10), encoded, coarse,
          resBook, k = 3, nProbe = 2, m = 8)
        .orderBy(col("probe_id"), col("rank"))
    }),

    // Per-cluster embedding centroids via the native micro-unit vector
    // sum (buffer = dims+1 longs per group, no ×dims posexplode) —
    // the k-means M-step / cluster-diagnostics primitive. Exploded to
    // (cluster, dim) rows for the oracle compare.
    "q86_cluster_centroids" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val coarse = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      Similarity.clusterCentroids(Similarity.ivfAssign(emb, coarse),
          "cluster", "embedding")
        .select(col("cluster"), col("n_vecs"),
          posexplode_outer(col("centroid")).as(Seq("dim", "c")))
        .select(col("cluster"), col("n_vecs"), col("dim").cast("long").as("dim"),
          col("c"))
        .orderBy(col("cluster"), col("dim"))
    }),

    // ANN recall audit: measured recall@3 of IVF search at nProbe
    // 1/2/4/8 against exact brute force — q91's counterpart for the
    // embedding side; nProbe=8 probes every list, recall must be 1.
    "q94_ann_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.annRecallAudit(
          probes = emb.filter(col("vec_id") < 20),
          corpus = emb,
          centroids = emb.filter(col("vec_id") < 8)
            .select(col("vec_id").as("cid"), col("embedding")),
          k = 3, nProbeConfigs = Seq(1, 2, 4, 8))
        .orderBy(col("n_probe"))
    }),

    // Codebook seeding A/B under the recall audit: lowest-id seeds vs
    // deterministic farthest-first (Gonzalez) at the same nProbe —
    // the seeding-quality question answered with a measured recall
    // column instead of folklore. Truth is seed-independent (brute
    // force), shared across both audits.
    "q105_ann_seeding" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val probes = emb.filter(col("vec_id") < 20)
      val naive = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding"))
      // sampled greedy (kmeans‖ shape): one sample job, constant in k
      val far = Similarity.seedCodebookFarthest(emb, k = 8, sampleSize = 256)
      // fused multi-codebook audit: one corpus pass, one join, one
      // window — not two stacked audits; truth rides INSIDE the same
      // action (two references — cheaper recomputed in-action than a
      // dedicated checkpoint job at this probe count)
      val truth = Similarity.bruteForceTopK(probes, emb, k = 3)
        .select(col("probe_id"), col("neighbor_id"))
      Similarity.annRecallAuditMulti(probes, emb,
          Seq("naive" -> naive, "farthest" -> far), k = 3, Seq(1, 2),
          truthOverride = Some(truth))
        .orderBy(col("seeding"), col("n_probe"))
    }),

    // Lloyd k-means convergence audit: 3 rounds from the 8 lowest-id
    // seeds — per-round exact micro-unit inertia (must fall),
    // reassignment count (must dwindle), live clusters. The "is the
    // codebook done?" table, every number oracle-replayed.
    "q114_kmeans_audit" -> ((s, d) => {
      Similarity.kmeansAudit(t(s, d, "embeddings"), k = 8, rounds = 3)
        .orderBy(col("round"))
    }),

    // Cluster purity vs labels: IVF assignment from the 8 lowest-id
    // seeds, per cluster the majority label and purity — "does
    // unsupervised structure recover the labels".
    "q126_cluster_purity" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cb = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("long").as("cid"), col("embedding"))
      Similarity.clusterPurity(
          Similarity.ivfAssign(e, cb).select(col("cluster"), col("label")),
          "cluster", "label")
        .orderBy(col("cluster"))
    }),

    // Label-centroid separation: pairwise cosine of per-label
    // centroids — class separability in embedding space.
    "q127_label_separation" -> ((s, d) => {
      Similarity.labelCentroidMatrix(t(s, d, "embeddings"), "label",
          "embedding")
        .orderBy(col("label_a"), col("label_b"))
    }),

    // SEMANTIC ingestion gate — the q117/q135/q139 story for MEANING:
    // a new batch of embeddings screens against the published SRP
    // index (skinny (t, bucket) rows + vec payloads, the split-store
    // layout) with exact-cosine verification at 0.9. Every 10th batch
    // vector carries the embedding of indexed vector id+1 (cosine 1.0
    // — a paraphrase-grade planted dup); the rest keep their own, so
    // natural same-meaning hits surface too and the oracle replays
    // them all.
    "q149_embedding_gate" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idx = emb.filter(col("vec_id") % 5 =!= 0)
      val donors = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("__donor"))
      val batch = emb.filter(col("vec_id") % 5 === 0)
        .join(donors, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("vec_id") % 10 === 0 && col("__donor").isNotNull,
            col("__donor")).otherwise(col("embedding")).as("embedding"))
      // (8,4) = the SHIPPED SrpIndexStore default (raised r15 after
      // the q151 audit measured (8,2) at 0.851 recall; (8,4) 0.937)
      Similarity.embeddingDedupAgainstIndex(batch,
          Similarity.srpBucketRows(idx, "vec_id", "embedding",
            planes = 8, tables = 4),
          idx.select(col("vec_id"), col("embedding")),
          planes = 8, tables = 4, threshold = 0.9)
        .orderBy(col("new_id"))
    }),

    // The semantic gate's SRP construction, AUDITED (the q94
    // discipline for the gate path): q149's batch/index split PLUS a
    // graded planting — every vec_id%10==5 batch vector becomes
    // donor + 0.5·own (float-rounded once, both engines), landing its
    // true cosine in [0.87, 0.93] — exactly the band where SRP sign
    // agreement is probabilistic, so recall DISCRIMINATES between
    // constructions instead of saturating on identical-copy pairs.
    // The published SrpIndexStore default (planes=8, tables=4 —
    // sources/SrpIndex.scala, raised from (8,2) in r15 BECAUSE of
    // this audit's 0.851 row) ships with a measured recall row, not
    // folklore; (4,2)/(8,1)/(8,2) bracket it on cost and recall.
    "q151_gate_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idx = emb.filter(col("vec_id") % 5 =!= 0)
      val donors = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("__donor"))
      val batch = emb.filter(col("vec_id") % 5 === 0)
        .join(donors, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("vec_id") % 10 === 0 && col("__donor").isNotNull,
            col("__donor"))
          .when(col("vec_id") % 10 === 5 && col("__donor").isNotNull,
            zip_with(col("__donor"), col("embedding"),
              (dd, oo) => (dd.cast("double") + lit(0.5) * oo.cast("double"))
                .cast("float")))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.gateRecallAudit(batch, idx.select(col("vec_id"), col("embedding")),
          constructions = Seq((4, 2), (8, 1), (8, 2), (8, 4)),
          threshold = 0.9)
        .orderBy(col("planes"), col("tables"))
    })
  )

  val oracles: Map[String, String] = Map(
    // q86: q35's argmin assignment + exact micro-unit component sums
    // (round-half-away-from-zero on the double product — both engines'
    // round()); dims come from the data via a struct unnest.
    "q86_cluster_centroids" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |assign AS (SELECT vec_id, cid AS cluster FROM dist WHERE rn = 1),
        |comp AS (
        |  SELECT a.cluster, s.i AS dim, round(s.x * 1000000)::BIGINT AS m
        |  FROM (SELECT vec_id,
        |          unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
        |        FROM e) u
        |  JOIN assign a USING (vec_id)),
        |agg AS (SELECT cluster, dim, count(*)::BIGINT AS n_vecs, sum(m)::BIGINT AS ms
        |        FROM comp GROUP BY cluster, dim)
        |SELECT cluster, n_vecs, dim::BIGINT AS dim,
        |  round(ms / 1000000.0 / n_vecs, 6) AS c
        |FROM agg ORDER BY cluster, dim""".stripMargin,
    // q42: floor (not round) codes — floor is bit-identical across
    // engines; the scale replays Spark's float truncation via ::REAL.
    "q42_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |  round(CAST(CAST(maxabs / 127.0 AS REAL) AS DOUBLE), 6) AS scale,
        |  CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> 0::BIGINT)
        |       ELSE list_transform(embedding,
        |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT)) END AS codes
        |  FROM s)
        |SELECT vec_id, scale, list_sum(codes)::BIGINT AS qsum,
        |  list_min(codes)::BIGINT AS qmin, list_max(codes)::BIGINT AS qmax
        |FROM q ORDER BY vec_id""".stripMargin,
    "q25_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(p.v, c.v) /
        |      (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        |  FROM e p JOIN e c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
    "q26_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |kb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
         |  ${(0 until 6).map(t => s"${srpBucketSql(3, t * 3)} AS b$t").mkString(",\n  ")}
         |  FROM e)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
         |FROM kb a JOIN kb b ON a.vec_id < b.vec_id
         |  AND (${(0 until 6).map(t => s"a.b$t = b.b$t").mkString(" OR ")})
         |WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,
    "q27_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |kb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
         |       ${srpBucketSql(4, 0)} AS b0, ${srpBucketSql(4, 4)} AS b1 FROM e),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(p.v, c.v) / (p.norm * c.norm), 6) AS cosine
         |  FROM kb p JOIN kb c ON (p.b0 = c.b0 OR p.b1 = c.b1) AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 50),
         |ranked AS (
         |  SELECT probe_id, neighbor_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
         |ORDER BY probe_id, rank""".stripMargin,
    "q35_ivf_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |probe_clusters AS (
        |  SELECT vec_id AS probe_id, cid AS cluster FROM dist
        |  WHERE rn <= 2 AND vec_id < 20),
        |corpus AS (
        |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
        |    sqrt(list_dot_product(e.v, e.v)) AS norm
        |  FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    round(list_dot_product(pe.v, corpus.v) /
        |      (sqrt(list_dot_product(pe.v, pe.v)) * corpus.norm), 6) AS cosine
        |  FROM probe_clusters p
        |  JOIN corpus ON p.cluster = corpus.cluster AND p.probe_id <> corpus.neighbor_id
        |  JOIN e pe ON pe.vec_id = p.probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
    // q48: assignment replays q35's float argmin; scoring replays q42's
    // floor codes and ranks by integer-dot cosine (exact below 2^53 in
    // DOUBLE, so both engines agree bit-for-bit).
    "q48_ivf_quantized" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        |q AS (SELECT vec_id,
        |  CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::BIGINT)
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT)) END AS codes
        |  FROM s),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |probe_clusters AS (
        |  SELECT vec_id AS probe_id, cid AS cluster FROM dist
        |  WHERE rn <= 2 AND vec_id < 20),
        |corpus AS (
        |  SELECT d.vec_id AS neighbor_id, cid AS cluster, q.codes,
        |    sqrt(list_dot_product(q.codes, q.codes)) AS qnorm
        |  FROM dist d JOIN q ON d.vec_id = q.vec_id WHERE rn = 1),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    CASE WHEN sqrt(list_dot_product(pq.codes, pq.codes)) = 0 OR corpus.qnorm = 0
        |         THEN 0.0
        |         ELSE round(list_dot_product(pq.codes, corpus.codes) /
        |           (sqrt(list_dot_product(pq.codes, pq.codes)) * corpus.qnorm), 6)
        |    END AS qcosine
        |  FROM probe_clusters p
        |  JOIN corpus ON p.cluster = corpus.cluster AND p.probe_id <> corpus.neighbor_id
        |  JOIN q pq ON pq.vec_id = p.probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, qcosine,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY qcosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, qcosine, rank FROM ranked WHERE rank <= 3
        |ORDER BY probe_id, rank""".stripMargin,
    // q54: q35's argmin assignment + q44's stable md5-order take.
    "q54_cluster_sample" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, cid AS cluster FROM dist WHERE rn = 1),
        |r AS (SELECT vec_id, cluster,
        |  ROW_NUMBER() OVER (PARTITION BY cluster
        |    ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT, vec_id) AS rn
        |  FROM a)
        |SELECT vec_id, cluster FROM r WHERE rn <= 10 ORDER BY vec_id""".stripMargin,
    // q55: per-subspace argmin over the 4 lowest-id vectors' subvector
    // slices — q35's distance arithmetic on 8-dim slices.
    "q55_pq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |sv AS (SELECT vec_id, sub, list_slice(v, sub * 8 + 1, sub * 8 + 8) AS vs
        |       FROM e, range(8) s(sub)),
        |c AS (SELECT sub, vec_id AS cid, vs AS cs FROM sv WHERE vec_id < 4),
        |dist AS (
        |  SELECT sv.vec_id, sv.sub, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
        |      list_dot_product(sv.vs, sv.vs) - 2 * list_dot_product(sv.vs, c.cs)
        |        + list_dot_product(c.cs, c.cs), c.cid) AS rn
        |  FROM sv JOIN c ON sv.sub = c.sub)
        |SELECT vec_id, sub::BIGINT AS sub, cid::BIGINT AS code
        |FROM dist WHERE rn = 1 ORDER BY vec_id, sub""".stripMargin,
    // q56: ADC — lut[j][c] dots replayed with sequential
    // list_dot_product; the j-sum rides list_dot_product(parts, ones)
    // (left-to-right, matching Spark's aggregate over sequence(0,7)).
    "q56_pq_adc" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |sv AS (SELECT vec_id, sub, list_slice(v, sub * 8 + 1, sub * 8 + 8) AS vs
        |       FROM e, range(8) s(sub)),
        |c AS (SELECT sub, vec_id AS cid, vs AS cs FROM sv WHERE vec_id < 4),
        |dist AS (
        |  SELECT sv.vec_id, sv.sub, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
        |      list_dot_product(sv.vs, sv.vs) - 2 * list_dot_product(sv.vs, c.cs)
        |        + list_dot_product(c.cs, c.cs), c.cid) AS rn
        |  FROM sv JOIN c ON sv.sub = c.sub),
        |codes AS (SELECT vec_id, list(cid ORDER BY sub) AS cl
        |          FROM dist WHERE rn = 1 GROUP BY vec_id),
        |cents AS (SELECT sub, list(cs ORDER BY cid) AS cvs FROM c GROUP BY sub),
        |book AS (SELECT list(cvs ORDER BY sub) AS bk FROM cents),
        |n2 AS (SELECT vec_id, cl,
        |  list_dot_product(list_transform(range(8),
        |    j -> list_dot_product(bk[j + 1][cl[j + 1] + 1], bk[j + 1][cl[j + 1] + 1])),
        |    list_transform(range(8), x -> 1.0)) AS nn
        |  FROM codes, book),
        |probes AS (SELECT vec_id AS probe_id, v,
        |  sqrt(list_dot_product(v, v)) AS p_norm FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT p.probe_id, n2.vec_id AS neighbor_id,
        |    CASE WHEN p.p_norm = 0 OR n2.nn = 0 THEN 0.0
        |      ELSE round(list_dot_product(list_transform(range(8), j ->
        |        list_dot_product(list_slice(p.v, j * 8 + 1, j * 8 + 8),
        |          bk[j + 1][n2.cl[j + 1] + 1])),
        |        list_transform(range(8), x -> 1.0)) / (p.p_norm * sqrt(n2.nn)), 6)
        |    END AS adc_cosine
        |  FROM probes p, n2, book WHERE p.probe_id <> n2.vec_id),
        |r AS (SELECT probe_id, neighbor_id, adc_cosine,
        |  ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY adc_cosine DESC, neighbor_id) AS rank FROM scored)
        |SELECT probe_id, neighbor_id, adc_cosine, rank::BIGINT AS rank
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    // q59: q35's argmin assignment scopes an in-cluster all-pairs cosine
    // gate (mirroring the maxClusterSize=2000 cap), then q50's
    // reachability closure keeps the min-id survivor per component.
    "q59_semantic_dedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |a AS (SELECT d.vec_id, d.cid AS cluster, e.v
        |      FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
        |ok AS (SELECT cluster FROM a GROUP BY cluster HAVING COUNT(*) <= 2000),
        |verified AS (
        |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |  JOIN ok ON x.cluster = ok.cluster
        |  WHERE round(list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
        |    >= 0.4),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM verified
        |  UNION SELECT id_b, id_a FROM verified),
        |reach(n, m) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.n, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.m),
        |labels AS (SELECT n AS vec_id, min(m) AS cluster FROM reach GROUP BY n)
        |SELECT emb.vec_id, emb.label
        |FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.vec_id
        |WHERE emb.vec_id = COALESCE(l.cluster, emb.vec_id)
        |ORDER BY emb.vec_id""".stripMargin,
    // q60: residuals are FLOAT subtractions (DuckDB FLOAT−FLOAT is
    // IEEE float32, bit-equal to the JVM); every dot casts the float
    // values to DOUBLE lists first so accumulation matches the kernels;
    // code assignment replays the argmin kernel's ‖v‖²−2v·c+‖c‖² form,
    // ADC scoring the ‖diff‖² form; ranks compare ROUNDED distances.
    "q60_ivfpq" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    embedding AS vf FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv, vf AS cvf FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |resf AS (
        |  SELECT e.vec_id, d.cid AS cluster,
        |    list_transform(range(64), i -> e.vf[i + 1] - c.cvf[i + 1]) AS rf
        |  FROM e JOIN dist d ON e.vec_id = d.vec_id AND d.rn = 1
        |  JOIN c ON d.cid = c.cid),
        |-- book seeds are the 4 lowest ids OUTSIDE the coarse set (8-11):
        |-- coarse members' residuals are zero vectors
        |bookf AS (SELECT s.sub, r.vec_id - 8 AS cid,
        |    list_slice(r.rf, s.sub * 8 + 1, s.sub * 8 + 8) AS csf
        |  FROM resf r, range(8) s(sub) WHERE r.vec_id >= 8 AND r.vec_id < 12),
        |rsub AS (SELECT r.vec_id, s.sub,
        |    list_transform(list_slice(r.rf, s.sub * 8 + 1, s.sub * 8 + 8),
        |      x -> CAST(x AS DOUBLE)) AS rs
        |  FROM resf r, range(8) s(sub)),
        |bsub AS (SELECT sub, cid,
        |    list_transform(csf, x -> CAST(x AS DOUBLE)) AS cs FROM bookf),
        |cdist AS (
        |  SELECT rsub.vec_id, rsub.sub, bsub.cid,
        |    ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.sub ORDER BY
        |      list_dot_product(rs, rs) - 2 * list_dot_product(rs, cs)
        |        + list_dot_product(cs, cs), bsub.cid) AS rn
        |  FROM rsub JOIN bsub ON rsub.sub = bsub.sub),
        |codes AS (SELECT vec_id, list(cid ORDER BY sub) AS cl
        |          FROM cdist WHERE rn = 1 GROUP BY vec_id),
        |corpus AS (SELECT r.vec_id AS neighbor_id, r.cluster, codes.cl
        |           FROM resf r JOIN codes ON r.vec_id = codes.vec_id),
        |pres AS (
        |  SELECT e.vec_id AS probe_id, d.cid AS cluster,
        |    list_transform(range(64), i -> e.vf[i + 1] - c.cvf[i + 1]) AS pf
        |  FROM e JOIN dist d ON e.vec_id = d.vec_id AND d.rn <= 2
        |  JOIN c ON d.cid = c.cid
        |  WHERE e.vec_id < 10),
        |bnest AS (SELECT list(cl ORDER BY sub) AS bk FROM (
        |    SELECT sub, list(csf ORDER BY cid) AS cl FROM bookf GROUP BY sub)),
        |scored AS (
        |  SELECT p.probe_id, corpus.neighbor_id,
        |    round(list_dot_product(list_transform(range(8), j ->
        |      list_dot_product(
        |        list_transform(list_transform(range(8), i ->
        |          p.pf[j * 8 + i + 1] - bk[j + 1][corpus.cl[j + 1] + 1][i + 1]),
        |          x -> CAST(x AS DOUBLE)),
        |        list_transform(list_transform(range(8), i ->
        |          p.pf[j * 8 + i + 1] - bk[j + 1][corpus.cl[j + 1] + 1][i + 1]),
        |          x -> CAST(x AS DOUBLE)))),
        |      list_transform(range(8), x -> 1.0)), 6) AS adc_dist
        |  FROM pres p JOIN corpus ON p.cluster = corpus.cluster
        |    AND p.probe_id <> corpus.neighbor_id, bnest),
        |r AS (SELECT probe_id, neighbor_id, adc_dist,
        |  ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY adc_dist ASC, neighbor_id) AS rank FROM scored)
        |SELECT probe_id, neighbor_id, adc_dist, rank::BIGINT AS rank
        |FROM r WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    // q94: q25's exact truth + q35's IVF machinery replayed at four
    // nProbe settings; shared CTEs MATERIALIZED (read per config).
    "q94_ann_recall" -> {
      val configs = Seq(1, 2, 4, 8)
      val perConfig = configs.map { np =>
        s"""sel$np AS (
           |  SELECT $np AS n_probe, probe_id, neighbor_id FROM (
           |    SELECT pc.probe_id, corpus.neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY pc.probe_id ORDER BY
           |        round(list_dot_product(p.v, corpus.v) / (p.norm * corpus.norm), 6) DESC,
           |        corpus.neighbor_id) AS rank
           |    FROM (SELECT vec_id AS probe_id, cid AS cluster FROM dist
           |          WHERE rn <= $np AND vec_id < 20) pc
           |    JOIN corpus ON pc.cluster = corpus.cluster
           |      AND pc.probe_id <> corpus.neighbor_id
           |    JOIN pr p ON p.probe_id = pc.probe_id)
           |  WHERE rank <= 3)""".stripMargin
      }.mkString(",\n")
      val union = configs.map(np => s"SELECT * FROM sel$np").mkString("\nUNION ALL ")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |dist AS MATERIALIZED (
         |  SELECT e.vec_id, cid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
         |        + list_dot_product(c.cv, c.cv), cid) AS rn
         |  FROM e CROSS JOIN c),
         |corpus AS MATERIALIZED (
         |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
         |    sqrt(list_dot_product(e.v, e.v)) AS norm
         |  FROM dist d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1),
         |pr AS MATERIALIZED (
         |  SELECT vec_id AS probe_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM e WHERE vec_id < 20),
         |truth AS MATERIALIZED (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT p.probe_id, ce.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
         |        round(list_dot_product(p.v, ce.v) /
         |          (p.norm * sqrt(list_dot_product(ce.v, ce.v))), 6) DESC,
         |        ce.vec_id) AS rank
         |    FROM pr p JOIN e ce ON p.probe_id <> ce.vec_id)
         |  WHERE rank <= 3),
         |$perConfig,
         |cand AS ($union),
         |st AS (
         |  SELECT n_probe, count(*)::BIGINT AS n_returned,
         |    sum(CASE WHEN t.probe_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM cand LEFT JOIN truth t USING (probe_id, neighbor_id)
         |  GROUP BY n_probe),
         |spine AS (SELECT unnest([1, 2, 4, 8]) AS n_probe),
         |tt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
         |SELECT n_probe::BIGINT AS n_probe,
         |  COALESCE(n_returned, 0)::BIGINT AS n_returned, n_true,
         |  COALESCE(n_hits, 0)::BIGINT AS n_hits,
         |  CASE WHEN n_true > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_true, 6) END AS recall
         |FROM spine LEFT JOIN st USING (n_probe) CROSS JOIN tt
         |ORDER BY n_probe""".stripMargin
    },

    // q105: both seedings replayed against ONE brute-force truth —
    // the farthest-first chain is 7 argmax rounds (min-d² over the
    // chosen set, DESC, id tie-break), then each seeding gets q94's
    // dist/corpus/sel machinery with its own codebook.
    "q105_ann_seeding" -> {
      val d2 = "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)" +
        " + list_dot_product(c.cv, c.cv)"
      val farChain = (1 to 7).map { i =>
        s"""fn$i AS MATERIALIZED (
           |  SELECT $i AS cid, v AS cv FROM (
           |    SELECT e.vec_id, e.v, min($d2) AS dd
           |    FROM smp e CROSS JOIN fch${i - 1} c GROUP BY e.vec_id, e.v
           |    ORDER BY dd DESC, e.vec_id LIMIT 1)),
           |fch$i AS MATERIALIZED (SELECT * FROM fch${i - 1} UNION ALL SELECT * FROM fn$i)""".stripMargin
      }.mkString(",\n")
      def audit(tag: String, codebook: String) = {
        val dist =
          s"""dist$tag AS MATERIALIZED (
             |  SELECT e.vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $d2, cid) AS rn
             |  FROM e CROSS JOIN $codebook c),
             |corpus$tag AS MATERIALIZED (
             |  SELECT d.vec_id AS neighbor_id, cid AS cluster, e.v,
             |    sqrt(list_dot_product(e.v, e.v)) AS norm
             |  FROM dist$tag d JOIN e ON d.vec_id = e.vec_id WHERE rn = 1)""".stripMargin
        val sels = Seq(1, 2).map { np =>
          s"""sel$tag$np AS (
             |  SELECT $np AS n_probe, probe_id, neighbor_id FROM (
             |    SELECT pc.probe_id, cc.neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY pc.probe_id ORDER BY
             |        round(list_dot_product(p.v, cc.v) / (p.norm * cc.norm), 6) DESC,
             |        cc.neighbor_id) AS rank
             |    FROM (SELECT vec_id AS probe_id, cid AS cluster FROM dist$tag
             |          WHERE rn <= $np AND vec_id < 20) pc
             |    JOIN corpus$tag cc ON pc.cluster = cc.cluster
             |      AND pc.probe_id <> cc.neighbor_id
             |    JOIN pr p ON p.probe_id = pc.probe_id)
             |  WHERE rank <= 3)""".stripMargin
        }.mkString(",\n")
        s"$dist,\n$sels"
      }
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |pr AS MATERIALIZED (
         |  SELECT vec_id AS probe_id, v, sqrt(list_dot_product(v, v)) AS norm
         |  FROM e WHERE vec_id < 20),
         |truth AS MATERIALIZED (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT p.probe_id, ce.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
         |        round(list_dot_product(p.v, ce.v) /
         |          (p.norm * sqrt(list_dot_product(ce.v, ce.v))), 6) DESC,
         |        ce.vec_id) AS rank
         |    FROM pr p JOIN e ce ON p.probe_id <> ce.vec_id)
         |  WHERE rank <= 3),
         |cn AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |smp AS MATERIALIZED (
         |  SELECT vec_id, v FROM (
         |    SELECT vec_id, v,
         |      ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT AS h
         |    FROM e ORDER BY h, vec_id LIMIT 256)),
         |fch0 AS MATERIALIZED (
         |  SELECT 0 AS cid, v AS cv FROM smp
         |  WHERE vec_id = (SELECT min(vec_id) FROM smp)),
         |$farChain,
         |cf AS (SELECT cid, cv FROM fch7),
         |${audit("n", "cn")},
         |${audit("f", "cf")},
         |cand AS (
         |  SELECT 'naive' AS seeding, * FROM seln1
         |  UNION ALL SELECT 'naive', * FROM seln2
         |  UNION ALL SELECT 'farthest', * FROM self1
         |  UNION ALL SELECT 'farthest', * FROM self2),
         |st AS (
         |  SELECT seeding, n_probe, count(*)::BIGINT AS n_returned,
         |    sum(CASE WHEN t.probe_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM cand LEFT JOIN truth t USING (probe_id, neighbor_id)
         |  GROUP BY seeding, n_probe),
         |spine AS (
         |  SELECT s.seeding, np.n_probe
         |  FROM (VALUES ('naive'), ('farthest')) s(seeding)
         |  CROSS JOIN (SELECT unnest([1, 2]) AS n_probe) np),
         |tt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
         |SELECT spine.seeding, spine.n_probe::BIGINT AS n_probe,
         |  COALESCE(n_returned, 0)::BIGINT AS n_returned, n_true,
         |  COALESCE(n_hits, 0)::BIGINT AS n_hits,
         |  CASE WHEN n_true > 0
         |       THEN round(COALESCE(n_hits, 0)::DOUBLE / n_true, 6) END AS recall
         |FROM spine LEFT JOIN st USING (seeding, n_probe) CROSS JOIN tt
         |ORDER BY seeding, n_probe""".stripMargin
    },

    // q114: three Lloyd rounds replayed verbatim — argmin assignment
    // (d2, cid tie-break), micro-unit centroid update with the q86
    // arithmetic plus the ::REAL cast (the engine ships float
    // codebooks), inertia as Σ round(d2·1e6)::BIGINT (order-free),
    // reassignments via the a{r}×a{r-1} id join. MATERIALIZED keeps
    // the chain linear (the q79 lesson).
    "q114_kmeans_audit" -> {
      def roundCtes(r: Int, last: Boolean): String = {
        val assign =
          s"""d$r AS MATERIALIZED (
             |  SELECT e.vec_id, c.cid,
             |    list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
             |      + list_dot_product(c.cv, c.cv) AS d2
             |  FROM e CROSS JOIN cb${r - 1} c),
             |a$r AS MATERIALIZED (
             |  SELECT vec_id, cid, d2 FROM (
             |    SELECT vec_id, cid, d2,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             |    FROM d$r) WHERE rn = 1)""".stripMargin
        val update =
          s""",
             |u$r AS MATERIALIZED (
             |  SELECT cid, list(cc ORDER BY dim) AS cv FROM (
             |    SELECT a.cid, s.i AS dim,
             |      CAST(CAST(round(sum(round(s.x * 1000000))::BIGINT / 1000000.0 / count(*), 6)
             |        AS REAL) AS DOUBLE) AS cc
             |    FROM (SELECT vec_id,
             |            unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
             |          FROM e) q
             |    JOIN a$r a USING (vec_id)
             |    GROUP BY a.cid, s.i) t
             |  GROUP BY cid),
             |cb$r AS MATERIALIZED (
             |  SELECT o.cid, coalesce(u.cv, o.cv) AS cv
             |  FROM cb${r - 1} o LEFT JOIN u$r u USING (cid))""".stripMargin
        if (last) assign else assign + update
      }
      def auditRow(r: Int): String = {
        val moved =
          if (r == 1) "(-1)::BIGINT"
          else s"""(SELECT count(*)::BIGINT FROM a$r x JOIN a${r - 1} p
                  | ON x.vec_id = p.vec_id AND x.cid <> p.cid)""".stripMargin
        s"""SELECT $r::BIGINT AS round,
           |  (SELECT sum(round(d2 * 1000000)::BIGINT)::BIGINT FROM a$r) AS inertia_micro,
           |  $moved AS n_reassigned,
           |  (SELECT count(DISTINCT cid)::BIGINT FROM a$r) AS n_clusters""".stripMargin
      }
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |cb0 AS MATERIALIZED (
         |  SELECT vec_id::BIGINT AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         |${(1 to 3).map(r => roundCtes(r, r == 3)).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to 3).map(auditRow).mkString("\nUNION ALL\n")}
         |) ORDER BY round""".stripMargin
    },

    // q126: the q86 assignment CTE (argmin, cid tie-break) + the
    // majority window on the (cluster, label) frame.
    "q126_cluster_purity" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, e.label, cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
        |        + list_dot_product(c.cv, c.cv), cid) AS rn
        |  FROM e CROSS JOIN c),
        |assign AS (SELECT vec_id, label, cid AS cluster FROM dist WHERE rn = 1),
        |cl AS (SELECT cluster, label, count(*)::BIGINT AS n FROM assign GROUP BY 1, 2),
        |tot AS (SELECT cluster, sum(n)::BIGINT AS n_vecs FROM cl GROUP BY 1),
        |mx AS (SELECT cluster, label, n FROM (
        |    SELECT cluster, label, n,
        |      ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn
        |    FROM cl) WHERE rn = 1)
        |SELECT t.cluster, t.n_vecs, mx.label AS majority_label,
        |  mx.n AS n_majority, round(mx.n::DOUBLE / t.n_vecs, 6) AS purity
        |FROM tot t JOIN mx USING (cluster) ORDER BY cluster""".stripMargin,

    // q127: q86's micro-unit per-dim SUM replay keyed by label — the
    // exact integer sum vectors feed the cosine directly (cosine is
    // scale-invariant; no intermediate rounding, so no double-rounding
    // boundary for the engines to disagree on).
    "q127_label_separation" ->
      """WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |comp AS (
        |  SELECT label, s.i AS dim, round(s.x * 1000000)::BIGINT AS m
        |  FROM (SELECT label,
        |          unnest(list_transform(range(len(v)), i -> {'i': i, 'x': v[i+1]})) AS s
        |        FROM e) u),
        |agg AS (SELECT label, dim, count(*)::BIGINT AS n, sum(m)::BIGINT AS ms
        |        FROM comp GROUP BY 1, 2),
        |cent AS (
        |  SELECT label, max(n)::BIGINT AS n_vecs,
        |    list(ms::DOUBLE ORDER BY dim) AS c
        |  FROM agg GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  a.n_vecs AS n_a, b.n_vecs AS n_b,
        |  round(list_dot_product(a.c, b.c) /
        |    (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c))), 6)
        |    AS cosine
        |FROM cent a JOIN cent b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,

    // q149: both sides' SRP buckets replayed with the md5-portable
    // plane arithmetic (the q27 machinery), candidates from any
    // shared (t, bucket) excluding self-ids, exact cosine at the same
    // rounded threshold, one verdict row per batch vector.
    "q149_embedding_gate" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |idx AS (SELECT vec_id, v FROM e WHERE vec_id % 5 <> 0),
         |bat AS (
         |  SELECT b.vec_id,
         |    CASE WHEN b.vec_id % 10 = 0 AND d.v IS NOT NULL THEN d.v
         |         ELSE b.v END AS v
         |  FROM e b LEFT JOIN e d ON d.vec_id = b.vec_id + 1
         |  WHERE b.vec_id % 5 = 0),
         |ib AS (
         |  SELECT vec_id, 0 AS t, ${srpBucketSql(8, 0)} AS bk FROM idx
         |  UNION ALL
         |  SELECT vec_id, 1, ${srpBucketSql(8, 8)} FROM idx
         |  UNION ALL
         |  SELECT vec_id, 2, ${srpBucketSql(8, 16)} FROM idx
         |  UNION ALL
         |  SELECT vec_id, 3, ${srpBucketSql(8, 24)} FROM idx),
         |bb AS (
         |  SELECT vec_id, 0 AS t, ${srpBucketSql(8, 0)} AS bk FROM bat
         |  UNION ALL
         |  SELECT vec_id, 1, ${srpBucketSql(8, 8)} FROM bat
         |  UNION ALL
         |  SELECT vec_id, 2, ${srpBucketSql(8, 16)} FROM bat
         |  UNION ALL
         |  SELECT vec_id, 3, ${srpBucketSql(8, 24)} FROM bat),
         |cand AS (
         |  SELECT DISTINCT bb.vec_id AS new_id, ib.vec_id AS old_id
         |  FROM bb JOIN ib ON bb.t = ib.t AND bb.bk = ib.bk
         |  WHERE bb.vec_id <> ib.vec_id),
         |sc AS (
         |  SELECT c.new_id, c.old_id,
         |    round(list_dot_product(b.v, i.v) /
         |      (sqrt(list_dot_product(b.v, b.v)) *
         |       sqrt(list_dot_product(i.v, i.v))), 6) AS cosine
         |  FROM cand c JOIN bat b ON b.vec_id = c.new_id
         |  JOIN idx i ON i.vec_id = c.old_id),
         |hits AS (
         |  SELECT new_id, count(*)::BIGINT AS n, min(old_id)::BIGINT AS dup_of,
         |    max(cosine) AS best
         |  FROM sc WHERE cosine >= 0.9 GROUP BY 1)
         |SELECT b.vec_id AS new_id, coalesce(n, 0)::BIGINT AS n_dup_matches,
         |  dup_of, best AS best_cosine, coalesce(n, 0) > 0 AS is_dup
         |FROM bat b LEFT JOIN hits ON b.vec_id = hits.new_id
         |ORDER BY new_id""".stripMargin,
    // q151: q149's batch/index split; per construction the SAME
    // md5-portable SRP bucket replay on both sides, exact-cosine
    // verification at 0.9, vs the exact all-pairs truth.
    "q151_gate_recall" -> {
      val constructions = Seq((4, 2), (8, 1), (8, 2), (8, 4))
      def sides(src: String, alias: String): String =
        constructions.zipWithIndex.flatMap { case ((p, ts), ci) =>
          (0 until ts).map { t =>
            s"SELECT vec_id, $ci AS cons, $t AS t, ${srpBucketSql(p, t * p)} AS bk FROM $src"
          }
        }.mkString(s"$alias AS (\n", "\n  UNION ALL\n", "),")
      val spineVals = constructions.zipWithIndex
        .map { case ((p, ts), ci) => s"($ci, $p, $ts)" }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |idx AS (SELECT vec_id, v FROM e WHERE vec_id % 5 <> 0),
         |bat AS (
         |  SELECT b.vec_id,
         |    CASE WHEN b.vec_id % 10 = 0 AND d.embedding IS NOT NULL
         |           THEN list_transform(d.embedding, x -> CAST(x AS DOUBLE))
         |         WHEN b.vec_id % 10 = 5 AND d.embedding IS NOT NULL
         |           THEN list_transform(range(1, len(d.embedding) + 1),
         |                i -> CAST(CAST(CAST(d.embedding[i] AS DOUBLE)
         |                  + 0.5 * CAST(b.embedding[i] AS DOUBLE) AS FLOAT) AS DOUBLE))
         |         ELSE list_transform(b.embedding, x -> CAST(x AS DOUBLE)) END AS v
         |  FROM embeddings b LEFT JOIN embeddings d ON d.vec_id = b.vec_id + 1
         |  WHERE b.vec_id % 5 = 0),
         |${sides("idx", "ib")}
         |${sides("bat", "bb")}
         |cand AS (
         |  SELECT DISTINCT bb.cons, bb.vec_id AS new_id, ib.vec_id AS old_id
         |  FROM bb JOIN ib ON bb.cons = ib.cons AND bb.t = ib.t AND bb.bk = ib.bk
         |  WHERE bb.vec_id <> ib.vec_id),
         |sc AS (
         |  SELECT c.cons,
         |    round(list_dot_product(b.v, i.v) /
         |      (sqrt(list_dot_product(b.v, b.v)) *
         |       sqrt(list_dot_product(i.v, i.v))), 6) AS cosine
         |  FROM cand c JOIN bat b ON b.vec_id = c.new_id
         |  JOIN idx i ON i.vec_id = c.old_id),
         |per AS (
         |  SELECT cons, count(*)::BIGINT AS n_candidates,
         |    count(*) FILTER (WHERE cosine >= 0.9)::BIGINT AS n_found
         |  FROM sc GROUP BY 1),
         |tru AS (
         |  SELECT count(*)::BIGINT AS n_true
         |  FROM bat b CROSS JOIN idx i
         |  WHERE b.vec_id <> i.vec_id
         |    AND round(list_dot_product(b.v, i.v) /
         |      (sqrt(list_dot_product(b.v, b.v)) *
         |       sqrt(list_dot_product(i.v, i.v))), 6) >= 0.9),
         |spine AS (SELECT * FROM (VALUES $spineVals) AS s(cons, planes, tables))
         |SELECT spine.planes::BIGINT AS planes, spine.tables::BIGINT AS tables,
         |  n_true,
         |  coalesce(n_candidates, 0)::BIGINT AS n_candidates,
         |  coalesce(n_found, 0)::BIGINT AS n_found,
         |  CASE WHEN n_true > 0
         |       THEN round(coalesce(n_found, 0)::DOUBLE / n_true, 6) END AS recall,
         |  CASE WHEN coalesce(n_candidates, 0) > 0
         |       THEN round(coalesce(n_found, 0)::DOUBLE / n_candidates, 6) END AS precision
         |FROM spine LEFT JOIN per ON spine.cons = per.cons CROSS JOIN tru
         |ORDER BY planes, tables""".stripMargin
    }
  )
}
