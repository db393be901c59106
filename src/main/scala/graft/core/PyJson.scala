package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._

/** JSON parse + Python-`json.dumps`-compatible serialization.
  *
  * The reference engine canonicalizes request payloads with Python's
  * `json.dumps` before hashing (reference: datagrowth/resources/http/
  * generic.py:644-669 and datagrowth/signatures.py:85-89). Cache keys only
  * hit across runs if our byte output matches Python's, so this emitter
  * reproduces `json.dumps` exactly for the JSON value domain:
  *  - dict/list/str/int/float/bool/null
  *  - `ensure_ascii=True` (default) escapes non-ASCII as \\uXXXX
  *  - default separators are `", "` and `": "`; compact form `","`/`":"`
  *  - floats rendered with Python `repr` semantics (shortest round-trip)
  *
  * Jackson (shipped with Spark) is used for parsing only.
  */
object PyJson {
  // ObjectMapper is thread-safe after configuration.
  val mapper = new ObjectMapper()

  /** Observability: total parses (used by plan tests to prove fusion
    * rules actually reduce per-row parse counts). LongAdder ≈ free. */
  val parseCount = new java.util.concurrent.atomic.LongAdder

  def parse(s: String): JsonNode = { parseCount.increment(); mapper.readTree(s) }

  def tryParse(s: String): Option[JsonNode] = {
    parseCount.increment()
    try Option(mapper.readTree(s)) catch { case _: Exception => None }
  }

  /** Python-compatible float repr: shortest round-trip, `e+NN`/`e-NN`
    * exponents, always a fractional or exponent part. Java's
    * `Double.toString` is also shortest-round-trip but formats
    * differently (`1.0E16` vs Python `1e+16`), so we normalize.
    */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isPosInfinity) return "Infinity"
    if (d.isNegInfinity) return "-Infinity"
    val s = java.lang.Double.toString(d)
    if (!s.contains('E')) {
      // Java always prints a fraction part (e.g. "1.0") like Python.
      // Python drops the trailing ".0" only inside exponent forms.
      s
    } else {
      // Java: "1.0E16", "-1.23E-7" → Python: "1e+16", "-1.23e-07"
      val Array(mant0, exp0) = s.split('E')
      val mant = if (mant0.endsWith(".0")) mant0.dropRight(2) else mant0
      val expVal = exp0.toInt
      // Python uses scientific repr only for exp >= 16 or <= -5; Java
      // switches at >= 7 / <= -4. Expand the middle range manually.
      if (expVal >= 16 || expVal <= -5) {
        val sign = if (expVal < 0) "-" else "+"
        val mag = math.abs(expVal)
        val digits = if (mag < 10) f"0$mag%d" else mag.toString
        s"${mant}e$sign$digits"
      } else {
        // Expand to positional notation (exact: shortest digits + shift).
        new java.math.BigDecimal(s).stripTrailingZeros.toPlainString match {
          case p if p.contains('.') => p
          case p => p + ".0"
        }
      }
    }
  }

  private def escape(s: String, ensureAscii: Boolean, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c if c > 126 && ensureAscii => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** `json.dumps(node, sort_keys=sortKeys, separators=(itemSep, kvSep),
    * ensure_ascii=ensureAscii)`. */
  def dumps(node: JsonNode, sortKeys: Boolean = false,
            itemSep: String = ", ", kvSep: String = ": ",
            ensureAscii: Boolean = true): String = {
    val sb = new StringBuilder
    def write(n: JsonNode): Unit = n match {
      case null => sb.append("null")
      case _ if n.isNull => sb.append("null")
      case b: BooleanNode => sb.append(if (b.booleanValue) "true" else "false")
      case t: TextNode => escape(t.textValue, ensureAscii, sb)
      case i if i.isIntegralNumber => sb.append(i.asText)
      case f if f.isFloatingPointNumber => sb.append(pyFloatRepr(f.doubleValue))
      case a: ArrayNode =>
        sb.append('[')
        var first = true
        a.elements.asScala.foreach { el =>
          if (!first) sb.append(itemSep); first = false
          write(el)
        }
        sb.append(']')
      case o: ObjectNode =>
        sb.append('{')
        val fields = o.fields.asScala.map(e => (e.getKey, e.getValue)).toSeq
        val ordered = if (sortKeys) fields.sortBy(_._1) else fields
        var first = true
        ordered.foreach { case (k, v) =>
          if (!first) sb.append(itemSep); first = false
          escape(k, ensureAscii, sb)
          sb.append(kvSep)
          write(v)
        }
        sb.append('}')
      case other => sb.append(other.toString)
    }
    write(node)
    sb.toString
  }

  /** Compact canonical form used by signature hashing:
    * `json.dumps(x, sort_keys=True, separators=(",",":"), ensure_ascii=False)`
    * (reference: datagrowth/signatures.py:87-89). */
  def canonical(node: JsonNode): String =
    dumps(node, sortKeys = true, itemSep = ",", kvSep = ":", ensureAscii = false)
}
