package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Hashing

/** One interaction with an external source — the Spark shape of the
  * reference's `Resource` rows (reference: datagrowth/resources/base.py:
  * 17-187, http/generic.py:85-141). Keyed by `(uri, data_hash)` exactly
  * like the reference's cache lookup (generic.py:117), with the same
  * canonical key functions (Hashing.uriFromUrl / hashFromData) so cached
  * fixtures hit byte-for-byte.
  */
object Resources {

  val schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("data_hash", StringType, nullable = false),
    StructField("method", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("request_body", StringType, nullable = true),
    StructField("status", IntegerType, nullable = false),
    StructField("head", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("from_cache", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = true)))

  def emptyCache(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def successful(status: Int): Boolean = status >= 200 && status < 300

  def successCol(status: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    status >= 200 && status < 300

  /** The cache-aware fetch operator — the engine's core "optimization"
    * (SURVEY §4). Input: a requests frame with `method`, `url`,
    * `request_body` columns. Steps, all distributed:
    *   1. stamp cache keys (uri = scheme-stripped sorted-params URL,
    *      data_hash = SHA-1 canonical payload);
    *   2. broadcast-join against the cache table; successful rows hit;
    *   3. misses go through `fetcher` inside `mapPartitions`, with the
    *      partition count capped by `maxConcurrency` so request
    *      parallelism is bounded (reference throttles instead);
    *   4. union of hits + live rows; new rows carry from_cache=false so
    *      the caller can append them to the cache table.
    * `cacheOnly` forbids live fetches (reference generic.py:119-124) —
    * misses come back with status 0.
    *
    * `auth` carries credentials applied at SEND time only (headers
    * merged into the request, parameters merged into the query string —
    * reference `request_with_auth`, generic.py:433-447 applied at
    * `:136`). Cache keys and every stored column (`uri`, `url`,
    * `request_body`) are computed from the credential-free request, so
    * authentication data never reaches the cache table — the
    * `request_without_auth` strip guarantee (generic.py:39-43, 449-463)
    * holds structurally: credentials exist only inside the send call.
    *
    * `broadcastCache = false` drops the broadcast hint: when the cache
    * is a (uri, data_hash)-bucketed table ([[BucketedCacheStore]]) the
    * planner then co-locates on the bucketing — the cache side of the
    * join runs WITHOUT an Exchange and only the requests side shuffles
    * (a broadcast would instead materialize the whole cache per
    * executor, wrong once the cache outgrows memory).
    */
  def fetchWithCache(requests: DataFrame, cache: DataFrame, fetcher: Fetcher,
                     cacheOnly: Boolean = false, maxConcurrency: Int = 32,
                     auth: AuthConfig = AuthConfig.none,
                     broadcastCache: Boolean = true): DataFrame = {
    val spark = requests.sparkSession
    val keyed = requests
      .withColumn("uri", call_function("graft_uri_from_url", col("url")))
      .withColumn("data_hash", call_function("graft_hash_from_data",
        coalesce(col("request_body"), lit(""))))

    val liveCache = liveCacheView(cache)
    val joined = keyed.join(
      if (broadcastCache) broadcast(liveCache) else liveCache,
      Seq("uri", "data_hash"), "left_outer")
    val hits = joined.filter(col("c_status").isNotNull)
      .select(col("uri"), col("data_hash"), col("method"), col("url"), col("request_body"),
        col("c_status").as("status"), col("c_head").as("head"), col("c_body").as("body"),
        lit(true).as("from_cache"), col("c_created").as("created_at"))
    val misses = joined.filter(col("c_status").isNull)
      .select("uri", "data_hash", "method", "url", "request_body")

    val fetched: DataFrame =
      if (cacheOnly)
        misses.select(col("uri"), col("data_hash"), col("method"), col("url"),
          col("request_body"), lit(0).as("status"), lit(null).cast(StringType).as("head"),
          lit(null).cast(StringType).as("body"), lit(false).as("from_cache"),
          current_timestamp().as("created_at"))
      else {
        val parts = math.max(1, math.min(maxConcurrency,
          spark.sparkContext.defaultParallelism))
        val fetchedRdd = misses.repartition(parts).rdd.mapPartitions { it =>
          it.map { row =>
            val method = row.getAs[String]("method")
            val url = row.getAs[String]("url")
            val body = row.getAs[String]("request_body")
            // credentials enter here and go nowhere else: the stored row
            // keeps the credential-free url/body the keys were cut from.
            // A THROWING Fetcher becomes a failed-resource row, never a
            // task failure: the Fetcher trait is injectable and doesn't
            // promise no-throw (only HttpFetcher catches internally), and
            // a task death here makes Spark retry the whole partition —
            // re-sending every side-effectful request already answered
            // in it — before aborting the round after 4 attempts. 597 is
            // a private "transport threw" status (the shell twin's
            // status-1 convention): non-2xx, so never cached as live.
            val resp =
              try fetcher.fetch(method,
                AuthConfig.withParameters(url, auth.parameters),
                body, auth.headers)
              catch {
                case e: Exception => FetchResponse(597,
                  graft.core.PyJson.canonical(graft.core.PyJson.mapper
                    .createObjectNode()
                    .put("error", e.getClass.getSimpleName)
                    .put("message", Option(e.getMessage).getOrElse(""))),
                  null)
              }
            Row(row.getAs[String]("uri"), row.getAs[String]("data_hash"), method, url, body,
              resp.status, resp.head, resp.body, false,
              new java.sql.Timestamp(System.currentTimeMillis()))
          }
        }
        spark.createDataFrame(fetchedRdd, schema)
      }
    hits.unionByName(fetched)
  }

  /** The cache side of the fetch join: successful rows only, one row
    * per key (latest wins, matching the reference's get()). Factored so
    * the spec pins the EXACT plan shape the fetch path runs. */
  private[sources] def liveCacheView(cache: DataFrame): DataFrame =
    cache.filter(col("status") >= 200 && col("status") < 300)
      .select(col("uri"), col("data_hash"), col("status").as("c_status"),
        col("head").as("c_head"), col("body").as("c_body"), col("created_at").as("c_created"))
      .dropDuplicates("uri", "data_hash")
}

/** MicroServiceResource endpoint resolution (reference:
  * resources/http/generic.py:291-318): the service name looks up the
  * `connections` configuration (registered through defaults, like the
  * reference's `register_defaults`); `protocol`, `host` and `path` are
  * all required; the URI template is `{protocol}://{host}{path}`. The
  * resolved URL then flows through the normal cache-aware fetch kernel
  * like any other HttpResource — same cache keys, same retry envelope.
  */
object MicroService {

  def resolveUrl(config: graft.core.Configuration, service: String): String = {
    require(service != null && service.nonEmpty,
      "You should specify a micro service name under the MICRO_SERVICE attribute")
    val connections = config.getOption("connections") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Map[String, String]]]
      case _ => Map.empty[String, Map[String, String]]
    }
    val connection = connections.getOrElse(service, throw new IllegalArgumentException(
      s""""$service" is an unknown micro service in the "connections" configuration. """ +
        "Is it added through register_defaults?"))
    def required(key: String): String = connection.get(key).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"A $key should be specified in the micro service configuration"))
    s"${required("protocol")}://${required("host")}${required("path")}"
  }
}

/** A fetch response; `head` is a JSON object of response headers. */
final case class FetchResponse(status: Int, head: String, body: String)

/** Send-time credentials (reference `auth_headers`/`auth_parameters`,
  * generic.py:410-431): `headers` merge into the request headers,
  * `parameters` into the URL query string — at send time only. The
  * cache pipeline never stores either (generic.py:39-43).
  */
final case class AuthConfig(headers: Map[String, String] = Map.empty,
                            parameters: Map[String, String] = Map.empty) extends Serializable

object AuthConfig {
  val none: AuthConfig = AuthConfig()

  /** `request_with_auth`'s query merge (generic.py:437-442): auth
    * parameters replace same-named keys and append otherwise; the
    * fragment survives. Values are taken verbatim (callers encode). */
  def withParameters(url: String, params: Map[String, String]): String = {
    if (params.isEmpty) return url
    val (base, fragment) = url.indexOf('#') match {
      case -1 => (url, "")
      case i => (url.substring(0, i), url.substring(i))
    }
    val (path, query) = base.indexOf('?') match {
      case -1 => (base, "")
      case i => (base.substring(0, i), base.substring(i + 1))
    }
    val existing = query.split("&").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }
    }
    val merged = scala.collection.mutable.LinkedHashMap(existing: _*)
    params.foreach { case (k, v) => merged(k) = v }
    val qs = merged.map { case (k, v) => s"$k=$v" }.mkString("&")
    s"$path?$qs$fragment"
  }
}

/** Injectable transport. Implementations MUST be serializable — the
  * growth path ships the fetcher to executors inside mapPartitions.
  * (The reference's analogue of swapping this out is `TestClientResource`
  * + `cache_only` fixtures, resources/testing.py:17-35.)
  */
trait Fetcher extends Serializable {
  def fetch(method: String, url: String, requestBody: String): FetchResponse

  /** Send with extra request headers (auth injection). The default
    * ignores them so minimal test transports keep working; real
    * transports must apply them. */
  def fetch(method: String, url: String, requestBody: String,
            headers: Map[String, String]): FetchResponse =
    fetch(method, url, requestBody)
}

/** Live HTTP transport with the reference's robustness envelope:
  * 30 s timeout (datagrowth.yml:23), backoff 0/2/4/8/16 s on statuses
  * 420/429/502/503/504 (generic.py:541-563, datagrowth.yml:32),
  * `interval_duration`-style pacing after every send (generic.py:
  * 139-140 — per transport instance, so total politeness against one
  * host is interval × concurrent partitions), and a configured
  * User-Agent prefixed to the transport's own (generic.py:229).
  */
class HttpFetcher(timeoutSeconds: Int = 30,
                  backoffDelays: Seq[Int] = Seq(2, 4, 8, 16),
                  retryStatuses: Set[Int] = Set(420, 429, 502, 503, 504),
                  userAgent: String = "",
                  intervalMillis: Long = 0L)
    extends Fetcher {

  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  def fetch(method: String, url: String, requestBody: String): FetchResponse =
    fetch(method, url, requestBody, Map.empty)

  override def fetch(method: String, url: String, requestBody: String,
                     headers: Map[String, String]): FetchResponse = {
    val ua =
      if (userAgent.nonEmpty) Map("User-Agent" -> s"$userAgent; ${HttpFetcher.BaseAgent}")
      else Map.empty[String, String]
    val effective = ua ++ headers
    try {
      var attempt = -1
      var last: FetchResponse = null
      val delays = 0 +: backoffDelays
      while (attempt < delays.length - 1) {
        attempt += 1
        if (delays(attempt) > 0) sleep(delays(attempt))
        last = fetchOnce(method, url, requestBody, effective)
        if (!retryStatuses.contains(last.status)) return last
      }
      last
    } finally {
      // one pacing interval per send (not per retry attempt), after the
      // response — the reference's interval_duration sleep placement
      if (intervalMillis > 0) sleepMillis(intervalMillis)
    }
  }

  /** Overridable for tests (clock injection — the retry schedule is
    * asserted without real waiting). */
  protected def sleep(seconds: Int): Unit = sleepMillis(seconds * 1000L)

  /** Pacing clock — separate hook so tests can assert the politeness
    * schedule independently of backoff. */
  protected def sleepMillis(ms: Long): Unit = Thread.sleep(ms)

  /** Overridable for tests (transport injection). */
  protected def fetchOnce(method: String, url: String, requestBody: String,
                          headers: Map[String, String]): FetchResponse =
    try {
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      headers.foreach { case (k, v) => builder.header(k, v) }
      val withMethod = (Option(method).getOrElse("get").toUpperCase, Option(requestBody)) match {
        case ("GET", _) => builder.GET()
        case (m, Some(b)) => builder
          .header("Content-Type", "application/json")
          .method(m, java.net.http.HttpRequest.BodyPublishers.ofString(b))
        case (m, None) => builder.method(m, java.net.http.HttpRequest.BodyPublishers.noBody())
      }
      val resp = client.send(withMethod.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val headJson = {
        import scala.jdk.CollectionConverters._
        val obj = graft.core.PyJson.mapper.createObjectNode()
        resp.headers().map().asScala.foreach { case (k, vs) =>
          obj.put(k, vs.asScala.mkString(", "))
        }
        graft.core.PyJson.canonical(obj)
      }
      FetchResponse(resp.statusCode(), headJson, resp.body())
    } catch {
      case e: Exception =>
        FetchResponse(502, s"""{"error":"${e.getClass.getSimpleName}"}""", null)
    }
}

object HttpFetcher {
  /** The transport's own agent string, suffixed after any configured
    * user agent, like the reference suffixes python-requests'. */
  val BaseAgent = "graft-http/1.0"
}
