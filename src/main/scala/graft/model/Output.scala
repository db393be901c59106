package graft.model

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.core.PyJson
import graft.functions.GraftFunctions

/** The objective compiler for `Document.output` templates (reference:
  * datagrowth/datatypes/documents/db/document.py:131-169). A template is
  * JSON whose strings starting with the replacement character (default
  * `$`, `#` during seeding) become `reach` lookups into the document
  * content; lists and dicts expand recursively preserving shape;
  * `\`-prefixed strings are literals with the backslash stripped.
  *
  * Spark-first: the template is compiled ONCE on the driver into a tree
  * of Column expressions (struct/array constructors around
  * ReachExpression) — per-row work is just the reach walks, inside
  * whole-stage codegen'd projections. Value representation follows
  * graft_reach: strings raw, other JSON values as compact JSON text.
  */
object OutputTemplate {

  sealed trait Template
  case class PathT(path: String) extends Template
  case class LitT(value: String) extends Template
  /** Non-string JSON scalar passed through as-is (number/bool/null). */
  case class LitJsonT(json: String) extends Template
  case class ArrT(items: Seq[Template]) extends Template
  case class ObjT(fields: Seq[(String, Template)]) extends Template

  /** Parse a JSON template text (e.g. `{"id": "$.id", "t": ["$.title"]}`). */
  def parse(templateJson: String, replacement: Char = '$'): Template =
    fromNode(PyJson.parse(templateJson), replacement)

  def fromNode(node: JsonNode, replacement: Char = '$'): Template = node match {
    case t: TextNode =>
      val s = t.textValue
      if (s.nonEmpty && s.charAt(0) == replacement)
        PathT("$" + s.substring(1)) // replacement char → canonical $-path
      else if (s.startsWith("\\")) LitT(s.substring(1))
      else LitT(s)
    case a: ArrayNode => ArrT(a.elements.asScala.map(fromNode(_, replacement)).toSeq)
    case o: ObjectNode =>
      ObjT(o.fields.asScala.map(e => e.getKey -> fromNode(e.getValue, replacement)).toSeq)
    case other => LitJsonT(PyJson.dumps(other, itemSep = ",", kvSep = ":", ensureAscii = false))
  }

  /** Compile a template against a JSON content column. Scalars come out
    * as StringType (reach rendering), lists as arrays, dicts as structs.
    */
  def compile(content: Column, tpl: Template): Column = tpl match {
    case PathT(p) =>
      if (p == "$") content else GraftFunctions.reach(content, p)
    case LitT(s) => lit(s)
    case LitJsonT(j) => lit(j)
    case ArrT(items) => array(items.map(compile(content, _)): _*)
    case ObjT(fields) =>
      struct(fields.map { case (k, t) => compile(content, t).as(k) }: _*)
  }

  def compileJson(content: Column, templateJson: String, replacement: Char = '$'): Column =
    compile(content, parse(templateJson, replacement))
}
