package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** The extraction objective — the reference's `ExtractProcessor` for JSON
  * payloads (reference: datagrowth/processors/input/extraction.py:52-72 +
  * 137-154). An objective is a dict with:
  *  - `"@"`: a `$`-path selecting the node list to iterate (a dict at `@`
  *    is iterated over its VALUES when `extractFromObjectValues`; a
  *    scalar/object becomes a single-element list);
  *  - `"#name"`: context keys evaluated once against the WHOLE payload,
  *    copied into every output object (as `name`);
  *  - `"name"`: per-node `$`-paths evaluated against each node.
  *
  * Output: one JSON object per node, same keys as the objective minus
  * `@`, `#` stripped. Values keep their JSON types (not stringified).
  */
final case class Objective(
    at: String,
    fields: Seq[(String, String)],
    context: Seq[(String, String)] = Nil,
    extractFromObjectValues: Boolean = false,
    atFunction: Option[JsonNode => Seq[JsonNode]] = None,
    fieldFunctions: Seq[(String, JsonNode => JsonNode)] = Nil) {

  require(atFunction.isDefined || (at != null && at.nonEmpty),
    "Objective needs '@' to select nodes")

  /** Extract from a parsed payload; empty output when `@` finds nothing
    * (the reference raises DGNoContent — callers treat it as no seeds).
    * `atFunction`/`fieldFunctions` are the reference's callable
    * objectives (extraction.py:140,153 — any objective value may be a
    * callable): Scala functions evaluated per payload/node. */
  def extract(data: JsonNode): Seq[ObjectNode] = {
    val ctx: Seq[(String, Option[JsonNode])] =
      context.map { case (name, path) => name -> Reach.reach(path, data) }
    val nodes: Seq[JsonNode] = atFunction match {
      case Some(f) => f(data)
      case None =>
        Reach.reach(at, data) match {
          case None => return Seq.empty
          case Some(o: ObjectNode) if extractFromObjectValues =>
            o.fields.asScala.map(_.getValue).toSeq
          case Some(a: ArrayNode) => a.elements.asScala.toSeq
          case Some(other) => Seq(other)
        }
    }
    nodes.map { node =>
      val out = PyJson.mapper.createObjectNode()
      ctx.foreach { case (name, v) =>
        out.set[JsonNode](name, v.getOrElse(out.nullNode))
      }
      fields.foreach { case (name, path) =>
        out.set[JsonNode](name, Reach.reach(path, node).getOrElse(out.nullNode))
      }
      fieldFunctions.foreach { case (name, f) =>
        out.set[JsonNode](name, f(node))
      }
      out
    }
  }

  def extractJson(json: String): Array[String] = {
    if (json == null) return Array.empty
    PyJson.tryParse(json) match {
      case Some(tree) =>
        extract(tree).map(PyJson.dumps(_, itemSep = ",", kvSep = ":", ensureAscii = false)).toArray
      case None => Array.empty
    }
  }
}

/** Markup (HTML/XML) extraction objective — the reference's
  * `_extract_soup` contract (extraction.py:156-181) with soup-path
  * strings (see [[Markup.SoupPath]]) in place of `eval`'d BeautifulSoup
  * expressions:
  *  - `"@"`: selects the element list (`soup.find_all('a')`); a
  *    single-element path is wrapped, like the reference wraps non-list
  *    `at` results;
  *  - `"#name"`: context evaluated once against the document;
  *  - `"name"`: per-element value paths (`el.text`, `el['href']`,
  *    `el.find('url').text`); EMPTY objectives are skipped (reference
  *    `if not objective: continue`).
  * Callable forms mirror the reference's callable objectives:
  * `atFunction(soup)` and `fieldFunctions(soup, el)`.
  * Divergence from the reference: a missing attribute/element yields
  * JSON null instead of raising ValueError — extraction over dirty
  * markup at scale must not abort the batch on one bad row.
  */
final case class MarkupObjective(
    at: String,
    fields: Seq[(String, String)],
    context: Seq[(String, String)] = Nil,
    atFunction: Option[Markup.Elem => Seq[Markup.Elem]] = None,
    fieldFunctions: Seq[(String, (Markup.Elem, Markup.Elem) => String)] = Nil) {

  require(atFunction.isDefined || (at != null && at.nonEmpty),
    "MarkupObjective needs '@' to select elements")

  @transient private lazy val atPath: Markup.SoupPath =
    if (atFunction.isDefined) null else Markup.SoupPath.parse(at)
  @transient private lazy val fieldPaths: Seq[(String, Markup.SoupPath)] =
    fields.filter(_._2 != null).filter(_._2.nonEmpty)
      .map { case (n, p) => n -> Markup.SoupPath.parse(p) }
  @transient private lazy val contextPaths: Seq[(String, Markup.SoupPath)] =
    context.map { case (n, p) => n -> Markup.SoupPath.parse(p) }

  def extract(soup: Markup.Elem): Seq[ObjectNode] = {
    val ctx: Seq[(String, Option[String])] =
      contextPaths.map { case (name, p) => name -> p.evalValue(soup, None) }
    val elements: Seq[Markup.Elem] = atFunction match {
      case Some(f) => f(soup)
      case None => atPath.evalNodes(soup, None)
    }
    elements.map { el =>
      val out = PyJson.mapper.createObjectNode()
      ctx.foreach { case (name, v) =>
        v match {
          case Some(s) => out.put(name, s)
          case None => out.set[JsonNode](name, out.nullNode)
        }
      }
      fieldPaths.foreach { case (name, p) =>
        p.evalValue(soup, Some(el)) match {
          case Some(s) => out.put(name, s)
          case None => out.set[JsonNode](name, out.nullNode)
        }
      }
      fieldFunctions.foreach { case (name, f) => out.put(name, f(soup, el)) }
      out
    }
  }

  /** Extract from raw markup: `text/html` through the tolerant HTML
    * parser, `text/xml`/`application/xml` XML-first with tolerant
    * fallback. */
  def extractMarkup(contentType: String, body: String): Array[String] = {
    if (body == null) return Array.empty
    val soup = contentType match {
      case "text/html" => Markup.parseHtml(body)
      case "text/xml" | "application/xml" => Markup.parseXml(body)
      case other => throw new IllegalArgumentException(
        s"Transform processor does not support content_type $other")
    }
    extract(soup)
      .map(PyJson.dumps(_, itemSep = ",", kvSep = ":", ensureAscii = false)).toArray
  }
}

object MarkupObjective {

  /** Parse the reference's objective dict form with soup-path values,
    * e.g. `{"@": "soup.find_all('a')", "text": "el.text",
    * "link": "el['href']", "#page": "soup.find('title').text"}`. */
  def fromJson(objectiveJson: String): MarkupObjective = {
    val node = PyJson.parse(objectiveJson)
    require(node.isInstanceOf[ObjectNode], "An objective should be a dict")
    var at: String = null
    val fields = Seq.newBuilder[(String, String)]
    val context = Seq.newBuilder[(String, String)]
    node.asInstanceOf[ObjectNode].fields.asScala.foreach { e =>
      val value = e.getValue.asText
      e.getKey match {
        case "@" => at = value
        case k if k.startsWith("#") => context += (k.substring(1) -> value)
        case k => fields += (k -> value)
      }
    }
    MarkupObjective(at, fields.result(), context.result())
  }
}

object Objective {

  /** Content-type dispatch (`ExtractProcessor.transform`, extraction.py:
    * 110-135): any `application/...json` mime routes to the JSON
    * extractor; `text/html`, `text/xml` and `application/xml` route to
    * the markup extractor when one is configured; unknown types raise
    * (matching the reference's TypeError). */
  def extractByContentType(objective: Objective, contentType: String,
                           body: String,
                           markup: Option[MarkupObjective] = None): Array[String] = {
    if (contentType == null) return Array.empty
    if (TextUtils.isJsonMimetype(contentType)) objective.extractJson(body)
    else contentType match {
      case ct @ ("text/html" | "text/xml" | "application/xml") if markup.isDefined =>
        markup.get.extractMarkup(ct, body)
      case other => throw new IllegalArgumentException(
        s"Transform processor does not support content_type $other")
    }
  }

  /** Mimetype from a response-head JSON object (case-insensitive
    * Content-Type lookup, parameters stripped the way the reference's
    * `HttpResource.content` strips them: `split(';')[0]`,
    * generic.py:207 — NOT `parse_content_type`, whose
    * `[A-Za-z]+/[A-Za-z]+` regex would truncate suffixed mimetypes
    * like `application/vnd.api+json` to `application/vnd` and throw
    * outright on a wildcard star-slash-star header). Absent head or
    * header defaults
    * to JSON — a documented lenience OVER the reference, which
    * defaults to `unknown/unknown` and lets transform raise
    * (generic.py:207, extraction.py:135); headless fixture responses
    * in a distributed round are treated as the JSON they are. */
  def mimeFromHead(head: String): String =
    Option(head).flatMap { h =>
      PyJson.tryParse(h).flatMap { tree =>
        tree.properties().asScala
          .find(_.getKey.equalsIgnoreCase("content-type"))
          .map(e => e.getValue.asText.split(";")(0))
      }
    }.getOrElse("application/json")

  /** Extract a fetched response by its content type: JSON mimetypes run
    * the reach objective, markup mimetypes the markup objective, other
    * types raise (ExtractProcessor.transform, extraction.py:110-135).
    * The shared dispatch of the growth and seeding pipelines. */
  def extractResponse(head: String, body: String, json: Objective,
                      markup: Option[MarkupObjective]): Array[String] = {
    if (body == null) return Array.empty
    mimeFromHead(head) match {
      case m if TextUtils.isJsonMimetype(m) =>
        require(json != null, s"No JSON objective configured for content_type $m")
        json.extractJson(body)
      case m @ ("text/html" | "text/xml" | "application/xml") if markup.isDefined =>
        markup.get.extractMarkup(m, body)
      case other => throw new IllegalArgumentException(
        s"Transform processor does not support content_type $other")
    }
  }

  /** Parse the reference's objective dict form, e.g.
    * `{"@": "$.results", "#unit": "$.unit", "id": "$.id"}`
    * (extraction.py:62-72). */
  def fromJson(objectiveJson: String, extractFromObjectValues: Boolean = false): Objective = {
    val node = PyJson.parse(objectiveJson)
    require(node.isInstanceOf[ObjectNode], "An objective should be a dict")
    var at: String = null
    val fields = Seq.newBuilder[(String, String)]
    val context = Seq.newBuilder[(String, String)]
    node.asInstanceOf[ObjectNode].fields.asScala.foreach { e =>
      val value = e.getValue.asText
      e.getKey match {
        case "@" => at = value
        case k if k.startsWith("#") => context += (k.substring(1) -> value)
        case k => fields += (k -> value)
      }
    }
    Objective(at, fields.result(), context.result(), extractFromObjectValues)
  }
}
