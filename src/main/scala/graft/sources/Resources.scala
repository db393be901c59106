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
    */
  def fetchWithCache(requests: DataFrame, cache: DataFrame, fetcher: Fetcher,
                     cacheOnly: Boolean = false, maxConcurrency: Int = 32): DataFrame = {
    val spark = requests.sparkSession
    val keyed = requests
      .withColumn("uri", call_function("graft_uri_from_url", col("url")))
      .withColumn("data_hash", call_function("graft_hash_from_data",
        coalesce(col("request_body"), lit(""))))

    val liveCache = cache.filter(col("status") >= 200 && col("status") < 300)
      .select(col("uri"), col("data_hash"), col("status").as("c_status"),
        col("head").as("c_head"), col("body").as("c_body"), col("created_at").as("c_created"))
      // one row per key — latest wins, matching the reference's get()
      .dropDuplicates("uri", "data_hash")

    val joined = keyed.join(broadcast(liveCache), Seq("uri", "data_hash"), "left_outer")
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
            val resp = fetcher.fetch(method, url, body)
            Row(row.getAs[String]("uri"), row.getAs[String]("data_hash"), method, url, body,
              resp.status, resp.head, resp.body, false,
              new java.sql.Timestamp(System.currentTimeMillis()))
          }
        }
        spark.createDataFrame(fetchedRdd, schema)
      }
    hits.unionByName(fetched)
  }
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

/** Injectable transport. Implementations MUST be serializable — the
  * growth path ships the fetcher to executors inside mapPartitions.
  * (The reference's analogue of swapping this out is `TestClientResource`
  * + `cache_only` fixtures, resources/testing.py:17-35.)
  */
trait Fetcher extends Serializable {
  def fetch(method: String, url: String, requestBody: String): FetchResponse
}

/** Live HTTP transport with the reference's robustness envelope:
  * 30 s timeout (datagrowth.yml:23), backoff 0/2/4/8/16 s on statuses
  * 420/429/502/503/504 (generic.py:541-563, datagrowth.yml:32).
  */
class HttpFetcher(timeoutSeconds: Int = 30,
                  backoffDelays: Seq[Int] = Seq(2, 4, 8, 16),
                  retryStatuses: Set[Int] = Set(420, 429, 502, 503, 504))
    extends Fetcher {

  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  def fetch(method: String, url: String, requestBody: String): FetchResponse = {
    var attempt = -1
    var last: FetchResponse = null
    val delays = 0 +: backoffDelays
    while (attempt < delays.length - 1) {
      attempt += 1
      if (delays(attempt) > 0) sleep(delays(attempt))
      last = fetchOnce(method, url, requestBody)
      if (!retryStatuses.contains(last.status)) return last
    }
    last
  }

  /** Overridable for tests (clock injection — the retry schedule is
    * asserted without real waiting). */
  protected def sleep(seconds: Int): Unit = Thread.sleep(seconds * 1000L)

  /** Overridable for tests (transport injection). */
  protected def fetchOnce(method: String, url: String, requestBody: String): FetchResponse =
    try {
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
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
