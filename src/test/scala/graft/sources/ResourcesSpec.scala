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
    override protected def fetchOnce(m: String, u: String, b: String): FetchResponse = {
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
