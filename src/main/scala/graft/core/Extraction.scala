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

object Objective {

  /** Content-type dispatch (`ExtractProcessor.transform`, extraction.py:
    * 110-135): any `application/...json` mime routes to the JSON
    * extractor; unknown types raise (the reference's HTML/XML path runs
    * BeautifulSoup expressions through `eval` — deliberately NOT
    * reproduced; HTML objectives become Scala `atFunction`s instead). */
  def extractByContentType(objective: Objective, contentType: String,
                           body: String): Array[String] = {
    if (contentType == null) return Array.empty
    if (TextUtils.isJsonMimetype(contentType)) objective.extractJson(body)
    else throw new IllegalArgumentException(
      s"Transform processor does not support content_type $contentType")
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
