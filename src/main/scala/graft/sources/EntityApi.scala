package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

import graft.core.PyJson

/** Deterministic synthetic entity source — a faithful re-implementation
  * of the reference's in-process test API (reference:
  * tests/django_project/project/entities/{constants,generators,views}.py),
  * which is its "TPC-H": paper/author/journal seeds with sequence and
  * cycle properties, served paginated with `size`, `page`, `page_size`,
  * `deletes` and `nested` query params. Used as the injectable Fetcher in
  * specs (the reference's `cache_only` fixture analogue).
  */
object EntityApi {

  val FirstNames = Seq("Marie", "Isaac", "Daniel", "Niels", "Albert")
  val LastNames = Seq("Curie", "Newton", "Kahneman", "Bohr")
  val Descriptions = Seq("Science is da bomb!", "Nature is where it's at!", "I'm boring.")
  val Websites = Seq("https://science.org", "https://nature.org", "https://academic.oup.com")
  val UrlPatterns = Seq("https://science.org/%d.pdf", "https://nature.org/%d.pdf",
    "https://academic.oup.com/%d.pdf")
  val EmailDomains = Seq("science.org", "nature.org", "academic.oup.com")

  /** `seed_generator` (generators.py:10-27). */
  def seeds(entity: String, size: Int): Seq[ObjectNode] = (0 until size).map { ix =>
    val m = PyJson.mapper
    val o = m.createObjectNode()
    entity match {
      case "paper" =>
        o.put("id", ix).put("state", "open")
        o.put("doi", s"https://doi.org/10.$ix")
        o.put("title", s"Title for $ix").put("abstract", s"Abstract for $ix")
        o.set[JsonNode]("authors", m.createArrayNode())
        o.put("url", UrlPatterns(ix % UrlPatterns.length).format(ix))
        o.putNull("published_at").putNull("modified_at")
      case "author" =>
        val first = FirstNames(ix % FirstNames.length)
        val last = LastNames(ix % LastNames.length)
        o.put("id", ix).put("state", "open")
        o.put("isni", s"https://isni.org/$ix")
        o.put("first_name", first).put("last_name", last)
        o.put("email", s"${first.toLowerCase}.${last.toLowerCase}@${EmailDomains(ix % EmailDomains.length)}")
      case "journal" =>
        o.put("id", ix).put("state", "open")
        o.put("title", s"Title for $ix")
        o.put("description", Descriptions(ix % Descriptions.length))
        o.put("website", Websites(ix % Websites.length))
        o.set[JsonNode]("papers", m.createArrayNode())
        o.set[JsonNode]("authors", m.createArrayNode())
      case other => throw new IllegalArgumentException(s"Entity doesn't exist: $other")
    }
    o
  }

  private[sources] def query(url: String): Map[String, String] = {
    val qIx = url.indexOf('?')
    if (qIx < 0) Map.empty
    else url.substring(qIx + 1).split('&').filter(_.contains('='))
      .map { p => val Array(k, v) = p.split("=", 2); k -> v }.toMap
  }

  /** Path segments after "/entities": (entity) | (entity, "ids") |
    * (entity, pk) — mirrors the reference's three entity endpoints. */
  private[sources] def route(url: String): Seq[String] = {
    val path = url.replaceAll("https?://[^/]+", "").takeWhile(_ != '?')
    val segs = path.split('/').filter(_.nonEmpty).toSeq
    if (segs.isEmpty || segs.head != "entities" || segs.length < 2)
      throw new IllegalArgumentException(s"Not an entity URL: $url")
    segs.drop(1)
  }
}

/** The paginated list endpoint (views.py:13-50): applies `deletes`
  * (every Nth seed gets state=deleted) and `nested` (child seeds dealt
  * ix%3 at a time into each parent), then pages with DRF page-number
  * semantics: `next` link present while more pages exist, HTTP 404 past
  * the last page.
  */
class EntityApiFetcher(host: String = "http://localhost:8000") extends Fetcher {
  import EntityApi._

  def fetch(method: String, url: String, requestBody: String): FetchResponse = {
    try {
      val m = PyJson.mapper
      val params = EntityApi.query(url)
      val routeSegs = EntityApi.route(url)
      val entity = routeSegs.head
      routeSegs.drop(1).headOption match {
        case Some("ids") => return idList(entity, params)
        case Some(pk) => return detail(entity, pk, params)
        case None =>
      }
      val size = params.getOrElse("size", "20").toInt
      val seeds = EntityApi.seeds(entity, size).map(_.deepCopy[ObjectNode])

      val deletes = params.getOrElse("deletes", "0").toInt
      if (deletes != 0) seeds.zipWithIndex.foreach { case (seed, ix) =>
        if (deletes < 0 || ix % deletes == 0) seed.put("state", "deleted")
      }

      params.get("nested").foreach { nestedEntity =>
        val nested = scala.collection.mutable.Queue(
          EntityApi.seeds(nestedEntity, size).map(_.deepCopy[ObjectNode]): _*)
        seeds.zipWithIndex.foreach { case (seed, ix) =>
          val arr = m.createArrayNode()
          if (seed.get("state").asText != "deleted")
            (0 until ix % 3).foreach { _ => if (nested.nonEmpty) arr.add(nested.dequeue()) }
          else (0 until ix % 3).foreach { _ => if (nested.nonEmpty) nested.dequeue() }
          seed.set[JsonNode](s"${nestedEntity}s", arr)
        }
      }

      val pageSize = params.getOrElse("page_size", "10").toInt
      val page = params.getOrElse("page", "1").toInt
      val pages = math.max(1, math.ceil(seeds.length.toDouble / pageSize).toInt)
      if (page < 1 || page > pages)
        return FetchResponse(404, """{"content-type":"application/json"}""",
          """{"detail":"Invalid page."}""")
      val pageData = seeds.slice((page - 1) * pageSize, page * pageSize)

      def pageUrl(p: Int): String = {
        val kept = params.filter { case (k, _) => k != "page" } + ("page" -> p.toString)
        val qs = kept.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
        s"$host/entities/$entity/?$qs"
      }
      val out = m.createObjectNode()
      out.put("count", seeds.length)
      if (page < pages) out.put("next", pageUrl(page + 1)) else out.putNull("next")
      if (page > 1) out.put("previous", pageUrl(page - 1)) else out.putNull("previous")
      val results = m.createArrayNode()
      pageData.foreach(results.add)
      out.set[JsonNode]("results", results)
      FetchResponse(200, """{"content-type":"application/json"}""",
        PyJson.dumps(out, itemSep = ",", kvSep = ":", ensureAscii = false))
    } catch {
      case e: IllegalArgumentException =>
        // the message may carry the offending URL verbatim (quotes,
        // backslashes) — serialize through the mapper like the success
        // paths, never raw interpolation into the JSON body
        FetchResponse(404, """{"content-type":"application/json"}""",
          PyJson.dumps(PyJson.mapper.createObjectNode()
            .put("detail", e.getMessage), itemSep = ",", kvSep = ":",
            ensureAscii = false))
    }
  }

  /** `EntityIdListAPIView` (views.py:53-69): flat id list with `deletes`
    * filtered OUT (deleted ids never appear). */
  private def idList(entity: String, params: Map[String, String]): FetchResponse = {
    val m = PyJson.mapper
    val size = params.getOrElse("size", "20").toInt
    val deletes = params.getOrElse("deletes", "0").toInt
    val arr = m.createArrayNode()
    (0 until size).foreach { ix =>
      val deleted = deletes != 0 && (deletes < 0 || ix % deletes == 0)
      if (!deleted) arr.add(m.createObjectNode().put("id", ix))
    }
    FetchResponse(200, """{"content-type":"application/json"}""",
      PyJson.dumps(arr, itemSep = ",", kvSep = ":", ensureAscii = false))
  }

  /** `EntityDetailAPIView` (views.py:72-81): one seed by pk or 404. */
  private def detail(entity: String, pk: String, params: Map[String, String]): FetchResponse = {
    val size = params.getOrElse("size", "20").toInt
    EntityApi.seeds(entity, size).find(_.get("id").asText == pk) match {
      case Some(seed) => FetchResponse(200, """{"content-type":"application/json"}""",
        PyJson.dumps(seed, itemSep = ",", kvSep = ":", ensureAscii = false))
      case None => FetchResponse(404, """{"content-type":"application/json"}""",
        s"""{"detail":"Object with primary key not found: $pk"}""")
    }
  }
}
