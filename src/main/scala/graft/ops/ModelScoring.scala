package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.sources.{ResourceCache, Resources}

/** The INJECTABLE model-scoring contract — the [[MediaCodec]] move
  * applied to quality scoring, and the engine's shape for the
  * reference's own declared direction (the v0.21 changelog announces
  * an LLM version centered on a `PromptResource`;
  * /root/reference/CHANGELOG.md:14-16): a scorer is a remote model
  * judged one BATCH of texts at a time, its verdicts are resources —
  * cached first, signature-keyed, fetched exactly once — and every
  * gate downstream consumes scores through this interface, never a
  * model client directly. A production scorer (an RPC to a model
  * server) implements two members and drops in without touching the
  * gating operators.
  *
  * Contract rules every implementation must keep:
  *  - `scoreBatch` returns exactly one score per input text, in input
  *    order, each a finite Double (gates compare against thresholds;
  *    NaN would silently drop rows on either side of every gate);
  *  - scores are DETERMINISTIC per (signature, text) — the cache
  *    serves a score forever, so a drifting scorer must change its
  *    `signature` (that is what makes cached scores safe to reuse);
  *  - implementations are Serializable and thread-safe per instance
  *    (they run inside task-side mapPartitions closures);
  *  - batching is the unit of cost: a real scorer pays per REQUEST,
  *    so implementations should expect `scoreBatch` sizes up to the
  *    caller's `batchSize` and must not assume singleton batches.
  */
trait Scorer extends Serializable {

  /** Stable identity of the model + scoring configuration. Part of
    * every cache key: two scorers with different signatures NEVER
    * share cached scores, and bumping the signature is how a
    * retrained model invalidates its predecessor's verdicts. */
  def signature: String

  /** Score one batch of texts — one finite Double per text, same
    * order. Called only for cache MISSES. */
  def scoreBatch(texts: Seq[String]): Seq[Double]
}

object Scorer {

  /** Deterministic closed-form default: a stand-in with a model
    * scorer's SHAPE (batched, signature-keyed, cacheable) whose score
    * is reproducible in any engine — the oracle replays it in SQL.
    * Score = mean of an ASCII-letter-density signal (weighted 2×) and
    * a saturating length signal: (2·alpha/len + min(len,2000)/2000)/3,
    * 0 for empty text, where len counts Unicode CODE POINTS — what SQL
    * `length()` counts in DuckDB and Spark alike; a UTF-16-unit count
    * would silently diverge on any supplementary character (the
    * Bpe.scala surrogate-pair doctrine). The arithmetic ORDER matches
    * the SQL replay exactly (same IEEE double ops), so raw doubles
    * agree bit-for-bit; queries round for display like every other
    * oracle row. */
  object Default extends Scorer {
    val signature: String = "graft-closed-form-v1"

    def scoreBatch(texts: Seq[String]): Seq[Double] = texts.map(score)

    def score(text: String): Double = {
      if (text == null || text.isEmpty) return 0.0
      val len = text.codePointCount(0, text.length)
      var alpha = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
        i += 1
      }
      (2.0 * alpha / len + math.min(len, 2000) / 2000.0) / 3.0
    }
  }
}

/** A [[Scorer]] backed by the HTTP resource layer — the engine's
  * concrete bridge to the reference's PromptResource direction: each
  * batch POSTs a JSON array of texts to `endpoint` through an injected
  * [[graft.sources.Fetcher]] (so the transport's robustness envelope —
  * timeout, 0/2/4/8/16 backoff on 420/429/5xx, pacing, auth injection —
  * is the SAME one every HTTP resource rides), and expects a JSON
  * array of numbers back, one score per text in order. Model-server
  * misbehavior surfaces as errors, never as silently-wrong verdicts:
  * a non-2xx response, a non-array body, a wrong-arity array or a
  * non-numeric element all throw (the [[ModelScoring.scoreWithCache]]
  * kernel validates arity and finiteness again on its side).
  *
  * Note the division of labor: THIS class is one request-response
  * exchange; caching, exactly-once persistence and distinct-text
  * dedupe belong to [[ModelScoring.scoreWithCache]], which keys rows
  * by `signature` — callers must bump the signature when the endpoint
  * serves a retrained model. */
final class HttpScorer(val signature: String, endpoint: String,
                       fetcher: graft.sources.Fetcher,
                       auth: graft.sources.AuthConfig =
                         graft.sources.AuthConfig.none) extends Scorer {
  // one mapper per task-side instance, not per batch: ObjectMapper
  // construction is Jackson's expensive operation and is thread-safe
  // once configured (the PyJson.mapper discipline)
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  def scoreBatch(texts: Seq[String]): Seq[Double] = {
    val arr = mapper.createArrayNode()
    texts.foreach(arr.add)
    val resp = fetcher.fetch("POST",
      graft.sources.AuthConfig.withParameters(endpoint, auth.parameters),
      mapper.writeValueAsString(arr), auth.headers)
    require(resp.status >= 200 && resp.status < 300,
      s"scorer endpoint $endpoint returned status ${resp.status}")
    val node = graft.core.PyJson.parse(resp.body)
    require(node.isArray && node.size == texts.length,
      s"scorer endpoint $endpoint returned ${if (node.isArray) node.size
        else "non-array"} scores for ${texts.length} texts")
    (0 until node.size).map { i =>
      val v = node.get(i)
      require(v.isNumber, s"scorer endpoint $endpoint returned a " +
        s"non-numeric score at index $i")
      v.asDouble
    }
  }
}

/** Cache-first batched scoring over a corpus, riding the SAME durable
  * resource machinery as every HTTP fetch ([[graft.sources.CacheStore]]
  * / [[graft.sources.BucketedCacheStore]]): a score is a resource row
  * `(uri = scorer://signature/sha1(text), body = score)`, appended
  * after an eager checkpoint so the scorer runs exactly once per new
  * text, served from the store forever after. The uri keeps its
  * `scorer://` scheme LITERALLY — the fetch path's canonical keys are
  * scheme-stripped ([[graft.core.Hashing.uriFromUrl]]), so no fetch
  * row's uri can contain `://` and collision between scoring rows and
  * fetch rows in a shared store is structurally impossible; the
  * data_hash rides the fetch path's own body-hash function.
  *
  * Scale shape: one distinct over (uri, data_hash) so a duplicated
  * text costs ONE model call per corpus, a cache join that broadcasts
  * (plain store) or co-locates (bucketed store) on the key columns,
  * and a `mapPartitions` over misses with partition count capped by
  * `maxConcurrency` — request parallelism is bounded the way the
  * fetch kernel bounds it, and each partition groups its rows into
  * `batchSize` batches (the per-request unit a real model server
  * prices). Nothing collects; the returned frame is per-doc skinny
  * (doc_id, score, from_cache).
  */
object ModelScoring {

  /** Score every document, cache-first. Output: one row per input row
    * — (doc_id (as `idCol`), score, from_cache). `cache = None` runs
    * store-less (every text scored live — tests, ad-hoc runs). */
  def scoreWithCache(docs: DataFrame, idCol: String, textCol: String,
                     scorer: Scorer, cache: Option[ResourceCache] = None,
                     batchSize: Int = 64, maxConcurrency: Int = 32,
                     broadcastCache: Boolean = true): DataFrame = {
    require(batchSize >= 1, "batchSize must be at least 1")
    val spark = docs.sparkSession
    // library entry point: the canonical key function must exist even
    // on a session that never went through the queries/Tables layer
    // (registration is idempotent — the streaming twin's discipline)
    graft.functions.GraftFunctions.register(spark)
    val sig = scorer.signature
    // charset-tight, not just '/'-free: the signature is interpolated
    // RAW into both the `scorer://` key namespace and the provenance
    // head JSON — a quote or backslash would store malformed JSON in
    // every score row, so refuse it at the door instead of escaping
    // downstream
    require(sig != null && sig.nonEmpty &&
        sig.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'),
      "scorer signature must be a non-empty [A-Za-z0-9._-] token " +
        s"(got '$sig')")
    // the stored uri keeps its scheme LITERALLY (no uriFromUrl pass):
    // the fetch path's canonical keys are scheme-STRIPPED, so no fetch
    // row's uri can ever contain "://" — keeping it makes collision
    // with fetch rows structurally impossible rather than merely
    // namespaced by the signature segment
    val keyed = docs
      .select(col(idCol).as("__doc_id"),
        coalesce(col(textCol), lit("")).as("request_body"))
      .withColumn("url",
        concat(lit(s"scorer://$sig/"), sha1(col("request_body"))))
      .withColumn("uri", col("url"))
      .withColumn("data_hash",
        call_function("graft_hash_from_data", col("request_body")))
    // store-less (cache = None) runs skip the cache join OUTRIGHT —
    // joining against a provably-empty frame still plans and executes
    // a join stage per run; the store-backed path is byte-identical
    // from the miss branch on (the spec pins run-2 equality through
    // plain and bucketed stores)
    val live = cache.map(_.read()
      .filter(Resources.successCol(col("status")))
      .select(col("uri"), col("data_hash"), col("body").as("__c_body"))
      .dropDuplicates("uri", "data_hash"))
    // the cache-join SNAPSHOT is eager and taken BEFORE the miss
    // append lands: the store view is lazy, and BucketedCacheStore's
    // append refreshes the relation cache — a tail action that
    // re-listed the store post-append would see the batch's own fresh
    // rows as hits and emit every new key TWICE (caught by the
    // mixed-warm-store spec). The checkpoint is batch-bounded (one row
    // per input doc), the same discipline as the fetch kernel's
    // checkpoint-before-append.
    val joined = live match {
      case Some(l) => keyed.join(
          if (broadcastCache) broadcast(l) else l,
          Seq("uri", "data_hash"), "left_outer")
        .localCheckpoint(true)
      case None =>
        keyed.withColumn("__c_body", lit(null).cast(StringType))
    }
    // one model call per DISTINCT text, not per row: the distinct is
    // on the key columns, so a boilerplate text duplicated across a
    // million docs costs one batch slot. The explicit hash-repartition
    // BEFORE dropDuplicates serves both masters in ONE exchange: it
    // satisfies the dedup aggregation's clustering requirement (no
    // second exchange) and fixes the scoring parallelism at `parts`
    // (an AQE-coalesced tiny frame would otherwise score on one task;
    // an unbounded one would exceed the request-concurrency cap).
    val parts = math.max(1, math.min(maxConcurrency,
      spark.sparkContext.defaultParallelism))
    val missKeys = joined.filter(col("__c_body").isNull)
      .select(col("uri"), col("data_hash"), col("url"), col("request_body"))
      .repartition(parts, col("uri"), col("data_hash"))
      .dropDuplicates("uri", "data_hash")
    val scoredRdd = missKeys.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(_.getAs[String]("request_body")))
        require(scores.length == batch.length,
          s"scorer '$sig' returned ${scores.length} scores for ${batch.length} texts")
        batch.zip(scores).map { case (row, s) =>
          require(!s.isNaN && !s.isInfinite,
            s"scorer '$sig' returned a non-finite score")
          Row(row.getAs[String]("uri"), row.getAs[String]("data_hash"),
            "SCORE", row.getAs[String]("url"), row.getAs[String]("request_body"),
            200, s"""{"signature":"$sig"}""", s.toString, false,
            new java.sql.Timestamp(System.currentTimeMillis()))
        }
      }
    }
    val scored = spark.createDataFrame(scoredRdd, Resources.schema)
    val persisted = cache match {
      case Some(store) =>
        // score exactly once, BEFORE the append re-reads the frame —
        // the CacheStore.fetch checkpoint-then-append discipline
        val once = scored.localCheckpoint(true)
        store.append(once)
        once
      // the store-less path checkpoints too: an UNMATERIALIZED scored
      // frame re-invokes scoreBatch on every action over the result
      // (count + collect = 2x the live POSTs with HttpScorer, and a
      // task retry re-POSTs its partition) — store-less means "no
      // durable rows", not "at-least-twice scoring"
      case None => scored.localCheckpoint(true)
    }
    val freshRows = persisted
      .select(col("uri"), col("data_hash"), col("body").as("__c_body"),
        lit(false).as("from_cache"))
    // hit rows come from the pre-append SNAPSHOT, never a re-read of
    // the store (see the `joined` comment); keys dedupe because the
    // same cached text may back many docs
    val scoreRows = live match {
      case Some(_) => freshRows.unionByName(
        joined.filter(col("__c_body").isNotNull)
          .select(col("uri"), col("data_hash"), col("__c_body"))
          .dropDuplicates("uri", "data_hash")
          .withColumn("from_cache", lit(true)))
      case None => freshRows
    }
    // the (doc, key) spine reads the snapshot too — for the
    // store-backed path that frame is already materialized, so the
    // tail costs no second evaluation of anything
    joined
      .select(col("__doc_id"), col("uri"), col("data_hash"))
      .join(scoreRows, Seq("uri", "data_hash"), "inner")
      .select(col("__doc_id").as(idCol),
        col("__c_body").cast("double").as("score"), col("from_cache"))
  }

  /** Takedown/retention parity for the score store (the LabelStore
    * removeMembers / index-expiry discipline, applied to scores): drop
    * EXACTLY the `scorer://signature/` namespace from `cache` — a
    * retrained model's predecessor rows are dead weight forever once
    * its signature is bumped. Rides the store's own compact-shaped
    * rewrite ([[graft.sources.ResourceCache.purgePrefix]]); other
    * signatures and ordinary fetch rows are untouched, and the next
    * scoring run under the purged signature re-scores from the model. */
  def purgeScores(cache: ResourceCache, signature: String): Unit = {
    // DELIBERATELY looser than scoreWithCache's [A-Za-z0-9._-] gate
    // (only the r14-era rule: non-empty, no '/'): the write path was
    // tightened in r15, and purge must still reach namespaces written
    // under the old rule — e.g. 'model:v2' — or their rows become the
    // exact dead weight this function exists to remove. A '/' is still
    // refused because it would cross the sha1(text) segment boundary
    // and purge more than one namespace.
    require(signature != null && signature.nonEmpty &&
        !signature.contains("/"),
      "scorer signature must be a non-empty path segment (no '/') " +
        s"(got '$signature')")
    cache.purgePrefix(s"scorer://$signature/")
  }

  /** The gate the scores exist for: every doc keeps its score and a
    * `keep` verdict against `threshold`. Rows are never dropped here —
    * the caller filters on `keep` (the filter_documents convention:
    * verdicts are data, removal is the caller's explicit act).
    *
    * PRECONDITION: `idCol` must be unique and non-null per doc row —
    * the verdict join is an inner equi-join on it, so a null id row
    * would vanish silently and a duplicated id would fan out (each
    * doc row matching every score row of that id). The oracle
    * fixtures and every `documents`-table caller already satisfy it;
    * callers gating ad-hoc frames must dedupe ids first. */
  def gateByScore(docs: DataFrame, idCol: String, textCol: String,
                  scorer: Scorer, threshold: Double,
                  cache: Option[ResourceCache] = None,
                  batchSize: Int = 64, maxConcurrency: Int = 32,
                  broadcastCache: Boolean = true): DataFrame = {
    val scores = scoreWithCache(docs, idCol, textCol, scorer, cache,
      batchSize, maxConcurrency, broadcastCache)
    docs.join(scores.withColumnRenamed(idCol, "__s_id"),
        docs(idCol) === col("__s_id"), "inner")
      .drop("__s_id")
      .withColumn("keep", col("score") >= threshold)
  }
}
