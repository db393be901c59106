package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Drives HttpFetcher's retry/backoff loop with an injected clock and
  * transport — the reference's backoff envelope (generic.py:541-563,
  * datagrowth.yml:32): delays 0/2/4/8/16 s on statuses
  * 420/429/502/503/504, first non-retryable response returned
  * immediately. */
class ResourcesSpec extends AnyFunSuite {

  /** Canned-response fetcher recording attempts and sleeps. */
  class FlakyFetcher(responses: Int*) extends HttpFetcher {
    val sleeps = new ArrayBuffer[Int]
    val attempts = new ArrayBuffer[Int]
    private var i = -1
    override protected def sleep(seconds: Int): Unit = sleeps += seconds
    override protected def fetchOnce(m: String, u: String, b: String,
                                     h: Map[String, String]): FetchResponse = {
      i += 1
      val status = responses(math.min(i, responses.length - 1))
      attempts += status
      FetchResponse(status, "{}", if (status == 200) "ok" else null)
    }
  }

  test("429,429,200: three attempts, delays 0/2/4, success returned") {
    val f = new FlakyFetcher(429, 429, 200)
    val resp = f.fetch("get", "http://x/", null)
    assert(resp.status === 200 && resp.body === "ok")
    assert(f.attempts.toSeq === Seq(429, 429, 200))
    assert(f.sleeps.toSeq === Seq(2, 4), "attempt 1 runs immediately, then 2s, 4s")
  }

  test("persistent 503 exhausts the full 0/2/4/8/16 schedule and returns the last failure") {
    val f = new FlakyFetcher(503)
    val resp = f.fetch("get", "http://x/", null)
    assert(resp.status === 503)
    assert(f.attempts.length === 5, "initial + 4 retries")
    assert(f.sleeps.toSeq === Seq(2, 4, 8, 16))
  }

  test("non-retryable status (404) returns immediately — no sleeps, one attempt") {
    val f = new FlakyFetcher(404)
    assert(f.fetch("get", "http://x/", null).status === 404)
    assert(f.attempts.length === 1 && f.sleeps.isEmpty)
  }

  test("interval pacing: one sleep per send, after the response, not per retry") {
    // clock-injected: paced sleeps recorded via sleepMillis, backoff via
    // sleep(Int) — the schedules are independent (generic.py:139-140)
    class PacedFetcher(responses: Int*) extends HttpFetcher(intervalMillis = 250) {
      val paced = new ArrayBuffer[Long]
      val events = new ArrayBuffer[String]
      private var i = -1
      override protected def sleep(seconds: Int): Unit = events += s"backoff:$seconds"
      override protected def sleepMillis(ms: Long): Unit = { paced += ms; events += "pace" }
      override protected def fetchOnce(m: String, u: String, b: String,
                                       h: Map[String, String]): FetchResponse = {
        i += 1
        events += "send"
        FetchResponse(responses(math.min(i, responses.length - 1)), "{}", "ok")
      }
    }
    val f = new PacedFetcher(200)
    f.fetch("get", "http://x/1", null)
    f.fetch("get", "http://x/2", null)
    f.fetch("get", "http://x/3", null)
    assert(f.paced.toSeq === Seq(250L, 250L, 250L), "one interval per request")
    assert(f.events.toSeq === Seq("send", "pace", "send", "pace", "send", "pace"),
      "the pacing sleep follows each response")
    // a retried send paces ONCE (after the final attempt), with backoff
    // sleeps interleaved before each retry
    val g = new PacedFetcher(429, 200)
    g.fetch("get", "http://x/4", null)
    assert(g.events.toSeq === Seq("send", "backoff:2", "send", "pace"))
  }

  test("configured User-Agent is prefixed to the transport agent; auth headers ride along") {
    class HeaderCapture extends HttpFetcher(userAgent = "datascope/2.1") {
      var seen: Map[String, String] = Map.empty
      override protected def fetchOnce(m: String, u: String, b: String,
                                       h: Map[String, String]): FetchResponse = {
        seen = h
        FetchResponse(200, "{}", "ok")
      }
    }
    val f = new HeaderCapture
    f.fetch("get", "http://x/", null, Map("Authorization" -> "Bearer tok-123"))
    assert(f.seen("User-Agent") === s"datascope/2.1; ${HttpFetcher.BaseAgent}")
    assert(f.seen("Authorization") === "Bearer tok-123")
  }

  test("AuthConfig.withParameters merges into the query, replaces same keys, keeps fragments") {
    assert(AuthConfig.withParameters("http://h/p", Map("key" -> "s3cr3t")) ===
      "http://h/p?key=s3cr3t")
    assert(AuthConfig.withParameters("http://h/p?a=1&b=2", Map("b" -> "9", "k" -> "x")) ===
      "http://h/p?a=1&b=9&k=x")
    assert(AuthConfig.withParameters("http://h/p?a=1#frag", Map("k" -> "x")) ===
      "http://h/p?a=1&k=x#frag")
    assert(AuthConfig.withParameters("http://h/p?a=1", Map.empty) === "http://h/p?a=1")
  }

  test("MicroService endpoint resolution (generic.py:291-318)") {
    val config = graft.core.Configuration(namespace = Seq("http_resource"))
      .withValues(Map("connections" -> Map(
        "tokenizer" -> Map("protocol" -> "http", "host" -> "tokenize.local:8080",
          "path" -> "/v1/tokenize"),
        "broken" -> Map("protocol" -> "http", "host" -> "x"))))
    assert(MicroService.resolveUrl(config, "tokenizer") ===
      "http://tokenize.local:8080/v1/tokenize")
    // unknown service and missing path raise, mirroring the reference asserts
    intercept[IllegalArgumentException](MicroService.resolveUrl(config, "nope"))
    intercept[IllegalArgumentException](MicroService.resolveUrl(config, "broken"))
  }
}

/** What every send saw, recorded through a JVM-static holder (the
  * fetcher is serialized into tasks; instance fields would record into
  * the task's copy). */
object AuthSeenHolder {
  val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val headers = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]
  def reset(): Unit = { urls.clear(); headers.clear() }
}

class AuthSeeingFetcher extends Fetcher {
  def fetch(method: String, url: String, requestBody: String): FetchResponse =
    fetch(method, url, requestBody, Map.empty)
  override def fetch(method: String, url: String, requestBody: String,
                     headers: Map[String, String]): FetchResponse = {
    AuthSeenHolder.urls.add(url)
    AuthSeenHolder.headers.add(headers)
    FetchResponse(200, "{}", """{"ok": true}""")
  }
}

/** The reference's strip guarantee ("Any authentication data gets
  * stripped before storage", generic.py:39-43): credentials are applied
  * at send time (:136, request_with_auth :433-447) and never reach the
  * stored uri/url/request_body (request_without_auth :449-463 feeds
  * `clean()` at :617-620). */
class AuthFetchSpec extends graft.SparkTestBase {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private val auth = AuthConfig(
    headers = Map("Authorization" -> "Bearer tok-SECRET"),
    parameters = Map("api_key" -> "key-SECRET"))

  private def requests() =
    Seq(("get", "http://api.test/items?page=1", null: String))
      .toDF("method", "url", "request_body")

  test("the transport sees the credential; the cache rows never contain it") {
    AuthSeenHolder.reset()
    val out = Resources.fetchWithCache(requests(), Resources.emptyCache(spark),
      new AuthSeeingFetcher, auth = auth)
    val rows = out.collect()
    assert(rows.length === 1)
    // (a) the fetcher saw both credentials
    assert(AuthSeenHolder.urls.asScala.toSeq === Seq("http://api.test/items?page=1&api_key=key-SECRET"))
    assert(AuthSeenHolder.headers.asScala.head("Authorization") === "Bearer tok-SECRET")
    // (b) no stored column carries either credential
    val dumped = rows.map(_.toSeq.map(String.valueOf).mkString("|")).mkString("\n")
    assert(!dumped.contains("SECRET") && !dumped.contains("api_key") &&
      !dumped.contains("Authorization"), s"credential leaked into storage: $dumped")
  }

  test("cache keys are credential-free: identical with and without auth") {
    AuthSeenHolder.reset()
    val withAuth = Resources.fetchWithCache(requests(), Resources.emptyCache(spark),
      new AuthSeeingFetcher, auth = auth).select("uri", "data_hash").collect()
    val withoutAuth = Resources.fetchWithCache(requests(), Resources.emptyCache(spark),
      new AuthSeeingFetcher).select("uri", "data_hash").collect()
    assert(withAuth.toSeq === withoutAuth.toSeq)
    // and an authenticated run's rows HIT the cache built without auth
    val cache = Resources.fetchWithCache(requests(), Resources.emptyCache(spark),
      new AuthSeeingFetcher)
    val hits = Resources.fetchWithCache(requests(), cache, new AuthSeeingFetcher, auth = auth)
    assert(hits.filter(org.apache.spark.sql.functions.col("from_cache")).count() === 1)
  }
}
