package graft.ops

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.CacheStore

/** The injectable-Scorer contract (ops/ModelScoring.scala): batching,
  * cache-first exactly-once scoring, signature keying, and the
  * MediaCodec-style equivalence pin — two scorer implementations with
  * the same scores must produce IDENTICAL gate verdicts through the
  * whole path. */
class ModelScoringSpec extends SparkTestBase {
  import spark.implicits._
  import ModelScoringSpec._

  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, s"document $i with some alphabetic content ${"x" * (i % 40)}")
  }.toDF("doc_id", "text")

  test("default scorer closed form: hand-computed values, empty/null → 0") {
    assert(Scorer.Default.score("") === 0.0)
    assert(Scorer.Default.score(null) === 0.0)
    // "ab cd": len 5, alpha 4 → (2*4/5 + 5/2000)/3
    assert(Scorer.Default.score("ab cd") === (2.0 * 4 / 5 + 5 / 2000.0) / 3.0)
  }

  test("scoreWithCache batches (≤ batchSize, one call set) and dedupes repeated texts") {
    RecordingScorer.reset()
    val docs = corpus(100)
      // plant the SAME text in 20 extra docs: one model slot, not 20
      .unionByName((1000 until 1020).map(i => (i.toLong, "shared body")).toDF("doc_id", "text"))
    val out = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("rec-v1"), cache = None, batchSize = 16)
    val rows = out.collect()
    assert(rows.length === 120)
    assert(RecordingScorer.texts.get() === 101,
      "distinct texts only: 100 unique + 1 shared")
    assert(RecordingScorer.maxBatch.get() <= 16, "batches must respect batchSize")
    assert(rows.forall(!_.getBoolean(2)), "store-less run: nothing from cache")
    // the shared text scores identically everywhere
    val shared = out.filter(col("doc_id") >= 1000).select("score")
      .distinct().collect()
    assert(shared.length === 1)
  }

  test("cache-first exactly-once: run 2 serves every score from the store") {
    val dir = Files.createTempDirectory("graft-scorer").resolve("cache").toString
    val store = new CacheStore(dir, spark)
    val docs = corpus(50)
    RecordingScorer.reset()
    val first = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer(Scorer.Default.signature), cache = Some(store),
      batchSize = 8)
    val f = first.collect()
    assert(f.length === 50 && f.forall(!_.getBoolean(2)))
    assert(RecordingScorer.texts.get() === 50)
    // second run: a scorer that THROWS on contact — every row must be
    // a cache hit, and scores must equal run 1 bit-for-bit
    val second = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      ThrowingScorer, cache = Some(store), batchSize = 8)
    val s = second.collect()
    assert(s.length === 50 && s.forall(_.getBoolean(2)), "all rows from cache")
    val m1 = f.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m2 = s.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m1 === m2, "cached scores round-trip exactly")
  }

  test("signature keying: a different signature never shares cached scores") {
    val dir = Files.createTempDirectory("graft-scorer").resolve("cache2").toString
    val store = new CacheStore(dir, spark)
    val docs = corpus(20)
    RecordingScorer.reset()
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-a"), cache = Some(store), batchSize = 8).collect()
    assert(RecordingScorer.texts.get() === 20)
    // same store, same texts, DIFFERENT signature → full re-score
    val out = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-b"), cache = Some(store), batchSize = 8).collect()
    assert(RecordingScorer.texts.get() === 40, "model-b must not read model-a's rows")
    assert(out.forall(!_.getBoolean(2)))
    // and the store now serves BOTH signatures independently
    val again = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      ThrowingScorer2("model-a"), cache = Some(store), batchSize = 8).collect()
    assert(again.forall(_.getBoolean(2)))
  }

  test("gate equivalence across scorer implementations (the MediaCodec move)") {
    val docs = corpus(80)
    val viaDefault = ModelScoring.gateByScore(docs, "doc_id", "text",
        Scorer.Default, threshold = 0.55)
      .select("doc_id", "score", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    // an "alien model client": same verdicts through a different
    // implementation — batched differently, different signature
    val viaAlien = ModelScoring.gateByScore(docs, "doc_id", "text",
        AlienScorer, threshold = 0.55, batchSize = 7)
      .select("doc_id", "score", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(viaDefault === viaAlien,
      "gate verdicts must not depend on the scorer implementation")
    assert(viaDefault.values.exists(_._2) && viaDefault.values.exists(!_._2),
      "fixture must exercise both verdicts")
  }

  test("bucketed store path: scores persist and serve from a BucketedCacheStore") {
    // the at-scale layout — same store family the fetch kernel uses
    // co-located; run 1 scores live and appends, run 2 through a
    // THROWING scorer is served entirely from the bucketed table
    val store = new graft.sources.BucketedCacheStore(spark,
      table = "scoring_cache_spec", buckets = 4)
    val docs = corpus(40)
    RecordingScorer.reset()
    val first = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer(Scorer.Default.signature), cache = Some(store),
      batchSize = 8, broadcastCache = false).collect()
    assert(first.length === 40 && RecordingScorer.texts.get() === 40)
    val second = ModelScoring.scoreWithCache(docs, "doc_id", "text",
      ThrowingScorer, cache = Some(store), batchSize = 8,
      broadcastCache = false).collect()
    assert(second.length === 40 && second.forall(_.getBoolean(2)))
    assert(first.map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      second.map(r => r.getLong(0) -> r.getDouble(1)).toMap)
  }

  test("mixed warm-store batch: hits and misses in ONE call, one row per doc") {
    // the torn-read hazard: `live` is bound lazily, the miss append
    // lands mid-call (and BucketedCacheStore.append refreshes the
    // relation cache) — if the final action re-listed the store AFTER
    // the append, every fresh key would surface twice (once
    // from_cache=false from the scored frame, once =true from the
    // re-read) and the verdict join would double rows
    for (bucketed <- Seq(false, true)) {
      val store: graft.sources.ResourceCache =
        if (bucketed) new graft.sources.BucketedCacheStore(spark,
          table = s"scoring_mixed_spec_$bucketed", buckets = 4)
        else new graft.sources.CacheStore(
          Files.createTempDirectory("graft-scorer").resolve("mixed").toString,
          spark)
      // warm the store with docs 0..19
      ModelScoring.scoreWithCache(corpus(20), "doc_id", "text",
        new RecordingScorer(Scorer.Default.signature), cache = Some(store),
        batchSize = 8, broadcastCache = !bucketed).collect()
      // mixed batch: 20 cached + 20 new
      RecordingScorer.reset()
      val out = ModelScoring.scoreWithCache(corpus(40), "doc_id", "text",
        new RecordingScorer(Scorer.Default.signature), cache = Some(store),
        batchSize = 8, broadcastCache = !bucketed).collect()
      assert(out.length === 40,
        s"bucketed=$bucketed: exactly one verdict per doc (no post-append re-read dup)")
      assert(RecordingScorer.texts.get() === 20, "only the 20 new texts score")
      val byCache = out.groupBy(_.getBoolean(2)).view.mapValues(_.length).toMap
      assert(byCache === Map(true -> 20, false -> 20), s"got $byCache")
    }
  }

  test("HttpScorer: batched JSON POST through the Fetcher, verdicts ≡ Default") {
    val docs = corpus(30)
    val viaDefault = ModelScoring.gateByScore(docs, "doc_id", "text",
        Scorer.Default, threshold = 0.55)
      .select("doc_id", "score", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val viaHttp = ModelScoring.gateByScore(docs, "doc_id", "text",
        new HttpScorer("model-server-v3", "http://scorer.test/v1/score",
          FakeModelServer),
        threshold = 0.55, batchSize = 7)
      .select("doc_id", "score", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(viaHttp === viaDefault,
      "verdicts through the HTTP transport must equal the local closed form")
    assert(FakeModelServer.bodies.get() > 0)
  }

  test("HttpScorer surfaces model-server misbehavior: non-2xx, wrong arity, non-numeric") {
    val docs = corpus(5)
    for (mode <- Seq("503", "arity", "nonnum")) {
      intercept[org.apache.spark.SparkException] {
        ModelScoring.scoreWithCache(docs, "doc_id", "text",
          new HttpScorer(s"broken-$mode", "http://scorer.test/s",
            MisbehavingServer(mode)), batchSize = 8).collect()
      }
    }
  }

  test("transport retries end-to-end: 429,503,200 schedule lands every " +
      "score exactly once; exhausted retries append NOTHING") {
    FlakyTransport.reset()
    val docs = corpus(12)
    val dir = Files.createTempDirectory("graft-flaky").resolve("cache").toString
    val store = new CacheStore(dir, spark)
    val scorer = new HttpScorer("flaky-v1", "http://scorer.test/v1/score",
      new FlakyTransport)
    // maxConcurrency=1 → one scoring partition → sequential batches of
    // 4 → exactly 3 requests, each surviving a 429-then-503 greeting
    val out = ModelScoring.scoreWithCache(docs, "doc_id", "text", scorer,
        cache = Some(store), batchSize = 4, maxConcurrency = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === corpus(12).collect()
      .map(r => r.getLong(0) -> Scorer.Default.score(r.getString(1))).toMap,
      "scores after transport retries must equal the closed form")
    // the 0/2/4 schedule, per request: attempt 1 unslept (delay 0),
    // then 2 s after the 429, 4 s after the 503 — recorded, not slept
    import scala.jdk.CollectionConverters._
    assert(FlakyTransport.sleeps.asScala.toSeq === Seq(2, 4, 2, 4, 2, 4),
      s"got ${FlakyTransport.sleeps.asScala.toSeq}")
    assert(FlakyTransport.sends.get() === 9, "3 requests x 3 attempts")
    // exactly once DESPITE the retries: one stored row per distinct
    // text, and a replay run never consults any scorer
    val stored = store.read()
      .filter(col("uri").startsWith("scorer://flaky-v1/"))
    assert(stored.count() === 12)
    assert(stored.select("uri").distinct().count() === 12,
      "a retried batch must never append a key twice")
    val replay = ModelScoring.scoreWithCache(docs, "doc_id", "text",
        ThrowingScorer2("flaky-v1"), cache = Some(store))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(replay === out)
    // a request that EXHAUSTS the envelope (503 on all 5 attempts,
    // full 2/4/8/16 schedule slept-and-recorded) FAILS the run with
    // no partial append: the checkpoint that makes scoring
    // exactly-once sits BEFORE the store append
    FlakyTransport.reset()
    intercept[org.apache.spark.SparkException] {
      ModelScoring.scoreWithCache(docs, "doc_id", "text",
        new HttpScorer("dead-v1", "http://scorer.test/v1/score",
          new DeadTransport),
        cache = Some(store), batchSize = 4, maxConcurrency = 1).collect()
    }
    assert(FlakyTransport.sleeps.asScala.toSeq.take(4) === Seq(2, 4, 8, 16),
      s"full backoff schedule must run: ${FlakyTransport.sleeps.asScala.toSeq}")
    assert(store.read().filter(col("uri").startsWith("scorer://dead-v1/"))
      .count() === 0, "an exhausted-retry batch must append nothing")
  }

  test("purgeScores removes exactly one signature's namespace; the " +
      "next run re-scores; other signatures and fetch rows untouched") {
    RecordingScorer.reset()
    val docs = corpus(10)
    val dir = Files.createTempDirectory("graft-purge").resolve("cache").toString
    val store = new CacheStore(dir, spark)
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-a"), cache = Some(store)).collect()
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-b"), cache = Some(store)).collect()
    // plus an ordinary FETCH row sharing the store — purge must not
    // touch the non-scorer namespace
    store.append(Seq(("example.org/page", "h1", "GET",
        "http://example.org/page", null.asInstanceOf[String], 200, "{}",
        "body!", false, new java.sql.Timestamp(1L)))
      .toDF(graft.sources.Resources.schema.fieldNames: _*))
    assert(store.read().filter(col("uri")
      .startsWith("scorer://model-a/")).count() === 10)
    ModelScoring.purgeScores(store, "model-a")
    val after = store.read()
    assert(after.filter(col("uri").startsWith("scorer://model-a/"))
      .count() === 0, "purged namespace must be empty")
    assert(after.filter(col("uri").startsWith("scorer://model-b/"))
      .count() === 10, "other signatures must survive")
    assert(after.filter(col("uri") === "example.org/page").count() === 1,
      "fetch rows must survive a score purge")
    // a replay under the purged signature RE-SCORES; model-b still
    // serves from cache (ThrowingScorer2 proves zero model calls)
    RecordingScorer.reset()
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-a"), cache = Some(store)).collect()
    assert(RecordingScorer.calls.get() > 0, "purged scores must re-score")
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      ThrowingScorer2("model-b"), cache = Some(store)).collect()
    intercept[IllegalArgumentException] {
      ModelScoring.purgeScores(store, "evil/../../sig")
    }
    // the bucketed layout purges identically (compact-shaped rewrite
    // keeps the bucketing)
    val bStore = new graft.sources.BucketedCacheStore(spark,
      table = "scoring_purge_spec", buckets = 4)
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-a"), cache = Some(bStore),
      broadcastCache = false).collect()
    ModelScoring.scoreWithCache(docs, "doc_id", "text",
      new RecordingScorer("model-b"), cache = Some(bStore),
      broadcastCache = false).collect()
    ModelScoring.purgeScores(bStore, "model-a")
    assert(bStore.read().filter(col("uri").startsWith("scorer://model-a/"))
      .count() === 0)
    assert(bStore.read().filter(col("uri").startsWith("scorer://model-b/"))
      .count() === 10)
  }

  test("scorer contract violations surface, not corrupt: wrong arity and NaN") {
    val docs = corpus(5)
    val e1 = intercept[org.apache.spark.SparkException] {
      ModelScoring.scoreWithCache(docs, "doc_id", "text", ShortScorer,
        batchSize = 8).collect()
    }
    assert(e1.getMessage.contains("scores") || e1.getCause != null)
    intercept[org.apache.spark.SparkException] {
      ModelScoring.scoreWithCache(docs, "doc_id", "text", NanScorer,
        batchSize = 8).collect()
    }
  }
}

/** Scorer fixtures at FILE scope: a Scorer serializes into task-side
  * closures, so fixtures must not capture the (non-serializable) spec
  * instance. Counters are static — local mode shares the JVM. */
object ModelScoringSpec {

  /** Counts calls and texts; scores via the closed-form default —
    * a stand-in "remote model" with an observable wire. */
  class RecordingScorer(val signature: String) extends Scorer {
    def scoreBatch(texts: Seq[String]): Seq[Double] = {
      RecordingScorer.calls.incrementAndGet()
      RecordingScorer.texts.addAndGet(texts.length)
      RecordingScorer.maxBatch.accumulateAndGet(texts.length, math.max)
      texts.map(Scorer.Default.score)
    }
  }
  object RecordingScorer {
    val calls = new AtomicInteger(0)
    val texts = new AtomicLong(0)
    val maxBatch = new AtomicInteger(0)
    def reset(): Unit = { calls.set(0); texts.set(0); maxBatch.set(0) }
  }

  /** A scorer that must never be consulted — proves cache hits. */
  object ThrowingScorer extends Scorer {
    val signature: String = Scorer.Default.signature // SAME keys as Default
    def scoreBatch(texts: Seq[String]): Seq[Double] =
      throw new IllegalStateException("scorer consulted on a full cache hit")
  }

  /** [[ThrowingScorer]] under an arbitrary signature. */
  case class ThrowingScorer2(signature: String) extends Scorer {
    def scoreBatch(texts: Seq[String]): Seq[Double] =
      throw new IllegalStateException("scorer consulted on a full cache hit")
  }

  /** Same scores as Default through a different implementation path
    * and signature — the equivalence fixture. */
  object AlienScorer extends Scorer {
    val signature = "alien-rpc-v7"
    def scoreBatch(texts: Seq[String]): Seq[Double] =
      texts.toList.map(Scorer.Default.score)
  }

  object ShortScorer extends Scorer {
    val signature = "broken-arity"
    def scoreBatch(texts: Seq[String]): Seq[Double] = Seq(0.5)
  }

  object NanScorer extends Scorer {
    val signature = "broken-nan"
    def scoreBatch(texts: Seq[String]): Seq[Double] = texts.map(_ => Double.NaN)
  }

  /** A model server misbehaving in a named way. */
  case class MisbehavingServer(mode: String) extends graft.sources.Fetcher {
    def fetch(method: String, url: String,
              requestBody: String): graft.sources.FetchResponse = {
      val n = graft.core.PyJson.parse(requestBody).size
      mode match {
        case "503" => graft.sources.FetchResponse(503, "{}", "")
        case "arity" => graft.sources.FetchResponse(200, "{}", "[0.5]")
        case "nonnum" => graft.sources.FetchResponse(200, "{}",
          (1 to n).map(_ => "\"hi\"").mkString("[", ",", "]"))
      }
    }
  }

  /** [[graft.sources.HttpFetcher]] with transport + clock injected
    * (its own test seams): every REQUEST is greeted by 429 then 503
    * before the 200 with real closed-form scores, so a scoring run
    * drives the full 0/2/4/8/16 backoff machinery end-to-end; sleeps
    * are recorded, never slept. */
  class FlakyTransport extends graft.sources.HttpFetcher {
    override protected def sleep(seconds: Int): Unit =
      FlakyTransport.sleeps.add(seconds)
    override protected def fetchOnce(method: String, url: String,
        requestBody: String,
        headers: Map[String, String]): graft.sources.FetchResponse = {
      FlakyTransport.sends.incrementAndGet()
      val k: Int = FlakyTransport.attempts.merge(requestBody, 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (k == 1) graft.sources.FetchResponse(429, "{}", "")
      else if (k == 2) graft.sources.FetchResponse(503, "{}", "")
      else {
        val node = graft.core.PyJson.parse(requestBody)
        val scores = (0 until node.size)
          .map(i => Scorer.Default.score(node.get(i).asText))
        graft.sources.FetchResponse(200, "{}",
          scores.mkString("[", ",", "]"))
      }
    }
  }
  object FlakyTransport {
    val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val sends = new AtomicInteger(0)
    val attempts =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def reset(): Unit = { sleeps.clear(); sends.set(0); attempts.clear() }
  }

  /** Always-503 transport on the same recorded clock: the fetch
    * envelope runs its FULL 0/2/4/8/16 schedule and still fails. */
  class DeadTransport extends graft.sources.HttpFetcher {
    override protected def sleep(seconds: Int): Unit =
      FlakyTransport.sleeps.add(seconds)
    override protected def fetchOnce(method: String, url: String,
        requestBody: String,
        headers: Map[String, String]): graft.sources.FetchResponse =
      graft.sources.FetchResponse(503, "{}", "")
  }

  /** A fake model server behind the Fetcher seam: parses the batch
    * JSON, scores with the closed form, answers a JSON array — what a
    * real scoring endpoint does, minus the network. */
  object FakeModelServer extends graft.sources.Fetcher {
    val bodies = new AtomicInteger(0)
    def fetch(method: String, url: String,
              requestBody: String): graft.sources.FetchResponse = {
      bodies.incrementAndGet()
      require(method == "POST" && url.startsWith("http://scorer.test/"))
      val node = graft.core.PyJson.parse(requestBody)
      require(node.isArray, "batch body must be a JSON array of texts")
      val scores = (0 until node.size)
        .map(i => Scorer.Default.score(node.get(i).asText))
      graft.sources.FetchResponse(200, "{}",
        scores.mkString("[", ",", "]"))
    }
  }
}
