package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** The reference's universal `$`-path getter (reference:
  * datagrowth/utils/data.py:10-76). Paths are `$` (the whole document) or
  * `$.a.b.1.c` — dict keys and list indexes mixed, digit-only parts index
  * lists. Non-standard fallback: when the dotted traversal fails, the
  * entire remaining path is retried as a single literal key (this is how
  * a literal `"dotted.key"` property is reachable).
  */
object Reach {

  /** Walk `path` over a parsed JSON tree. Returns None when the path
    * does not resolve (the reference returns its `default`, i.e. None).
    * A JSON `null` value resolves to Some(NullNode) — callers decide.
    */
  def reach(path: String, data: JsonNode): Option[JsonNode] = {
    if (path == "$") return Option(data)
    require(path != null && path.startsWith("$.") && path.length >= 3,
      "Reach needs a path starting with $ followed by a dot and a key")
    val rest = path.substring(2)
    walk(rest.split('.'), data) match {
      case some @ Some(_) => some
      case None => literalFallback(rest, data)
    }
  }

  private def walk(parts: Array[String], data: JsonNode): Option[JsonNode] = {
    var current = data
    var i = 0
    while (i < parts.length) {
      if (current == null) return None
      val part = parts(i)
      current = current match {
        case a: ArrayNode if part.nonEmpty && part.forall(_.isDigit) =>
          // guarded parse: Python's int() takes any digit run, and an
          // out-of-range index is an IndexError the reference catches
          // into the fallback — an unguarded toInt would instead throw
          // NumberFormatException out of the expression and abort the
          // job on one 11-digit segment
          part.toIntOption match {
            case Some(ix) if ix < a.size => a.get(ix)
            case _ => return None
          }
        case o: ObjectNode =>
          if (o.has(part)) o.get(part) else return None
        case _ => return None
      }
      i += 1
    }
    Option(current)
  }

  /** Reference fallback (`data.py:73-76`): retry the whole remaining path
    * as one literal key against the root. Digit-only paths against arrays
    * use Python `in` semantics (value membership) before indexing; in
    * practice the fallback matters for object keys containing dots.
    */
  private def literalFallback(rest: String, data: JsonNode): Option[JsonNode] =
    data match {
      case o: ObjectNode if o.has(rest) => Option(o.get(rest))
      case a: ArrayNode if rest.nonEmpty && rest.forall(_.isDigit) =>
        // guarded like [[walk]]: digit runs past Long range can't be
        // members of a JSON long array and must not throw
        rest.toLongOption match {
          case Some(v) =>
            val isMember = a.elements.asScala
              .exists(e => e.isIntegralNumber && e.longValue == v)
            if (isMember && v < a.size) Option(a.get(v.toInt)) else None
          case None => None
        }
      case _ => None
    }

  /** Render a resolved node the way `get_json_object` would: raw text for
    * strings, JSON text for everything else; JSON null → null.
    */
  def render(node: JsonNode): String = {
    if (node == null || node.isNull) null
    else if (node.isTextual) node.textValue
    else PyJson.dumps(node, itemSep = ",", kvSep = ":", ensureAscii = false)
  }

  /** reach + render over a JSON string; None/null-resolution → null. */
  def reachString(path: String, json: String): String = {
    if (json == null) return null
    PyJson.tryParse(json) match {
      case Some(tree) => reach(path, tree).map(render).orNull
      case None => null
    }
  }

  /** reach to an array: array node → rendered elements; with
    * `objectValues` an object node yields its values (reference
    * `extract_from_object_values`, extraction.py:143-144). */
  def reachArray(path: String, json: String, objectValues: Boolean): Array[String] = {
    if (json == null) return null
    PyJson.tryParse(json) match {
      case Some(tree) =>
        reach(path, tree) match {
          case Some(a: ArrayNode) => a.elements.asScala.map(render).toArray
          case Some(o: ObjectNode) if objectValues =>
            o.fields.asScala.map(e => render(e.getValue)).toArray
          case Some(other) => Array(render(other))
          case None => null
        }
      case None => null
    }
  }
}
