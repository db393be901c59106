package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode, NullNode}
import scala.jdk.CollectionConverters._

/** Driver-side template resolution — `Document.output_from_content`
  * (reference: datagrowth/datatypes/documents/db/document.py:134-169)
  * over parsed JSON, used where templates are evaluated on the driver
  * (seeding arg/kwarg construction, seeding.py:41-66). The Column-based
  * twin for per-row projection lives in graft.model.OutputTemplate.
  */
object Templates {

  /** Resolve a template node against content. Strings starting with the
    * replacement char become reach lookups (missing → null); lists/dicts
    * expand recursively preserving shape; `\`-prefixed strings are
    * literals; everything else passes through.
    */
  def resolve(tpl: JsonNode, content: JsonNode, replacement: Char = '$'): JsonNode = tpl match {
    case t: TextNode =>
      val s = t.textValue
      if (s.nonEmpty && s.charAt(0) == replacement) {
        val path = "$" + s.substring(1)
        if (path == "$") content
        else Reach.reach(path, content).getOrElse(NullNode.getInstance)
      }
      else if (s.startsWith("\\")) TextNode.valueOf(s.substring(1))
      else t
    case a: ArrayNode =>
      val out = PyJson.mapper.createArrayNode()
      a.elements.asScala.foreach(el => out.add(resolve(el, content, replacement)))
      out
    case o: ObjectNode =>
      val out = PyJson.mapper.createObjectNode()
      o.fields.asScala.foreach(e => out.set[JsonNode](e.getKey, resolve(e.getValue, content, replacement)))
      out
    case other => other
  }

  /** Render a resolved node as a positional argument (URL/command slot):
    * raw text for strings, compact JSON otherwise, "" for null. */
  def renderArg(node: JsonNode): String =
    if (node == null || node.isNull) ""
    else if (node.isTextual) node.textValue
    else PyJson.dumps(node, itemSep = ",", kvSep = ":", ensureAscii = false)
}
