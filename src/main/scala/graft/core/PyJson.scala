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
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    // SHORTEST round-trip digits, searched explicitly: this JDK's
    // Double.toString is NOT shortest (Ryu landed in JDK 19) — it
    // prints 1e23 as "9.999999999999999E22" where Python's repr says
    // "1e+23", and the whole point of this function is byte parity
    // with CPython for cache keys. At each precision p the two p-digit
    // neighbours of the EXACT binary value (round toward / away from
    // zero) are tested for a bit-exact round trip; if both recover d
    // the NEARER wins, and an exact tie goes to the candidate with the
    // EVEN last digit — David Gay's dtoa rules, which a 200k-random-
    // double fuzz against CPython repr confirms digit for digit (a
    // plain %.pe HALF_UP diverges on the ~3e-4 of doubles where only
    // the lower p-digit neighbour round-trips, and half-even decides
    // the genuine double-round-trip ties).
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    val bits = java.lang.Double.doubleToLongBits(d)
    val exact = new JBD(d)
    def roundTrips(c: JBD): Boolean =
      java.lang.Double.doubleToLongBits(
        java.lang.Double.parseDouble(c.toString)) == bits
    var chosen: JBD = null
    var p = 1
    while (chosen == null && p <= 17) {
      val down = exact.round(new MathContext(p, RoundingMode.DOWN))
      val up = exact.round(new MathContext(p, RoundingMode.UP))
      val dOk = roundTrips(down)
      val uOk = up.compareTo(down) != 0 && roundTrips(up)
      chosen =
        if (dOk && uOk) {
          val dd = exact.subtract(down).abs
          val du = up.subtract(exact).abs
          val c = du.compareTo(dd)
          if (c < 0) up
          else if (c > 0) down
          else { // exact tie → even last digit
            val lastEven = down.unscaledValue.testBit(0) == false
            if (lastEven) down else up
          }
        } else if (dOk) down
        else if (uOk) up
        else null
      p += 1
    }
    if (chosen == null) chosen = exact.round(new MathContext(17, RoundingMode.HALF_EVEN))
    val norm = chosen.stripTrailingZeros
    val digits = norm.unscaledValue.abs.toString
    val expVal = digits.length - 1 - norm.scale
    // Python uses scientific repr only for exp >= 16 or <= -5.
    if (expVal >= 16 || expVal <= -5) {
      val neg = if (d < 0) "-" else ""
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val sign = if (expVal < 0) "-" else "+"
      val mag = math.abs(expVal)
      val expDigits = if (mag < 10) f"0$mag%d" else mag.toString
      s"$neg${mant}e$sign$expDigits"
    } else {
      // Positional notation (exact: shortest digits + shift).
      norm.toPlainString match {
        case pl if pl.contains('.') => pl
        case pl => pl + ".0"
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
        // sort_keys compares by code point (Python sorted), not UTF-16
        // code-unit order — supplementary-plane keys would otherwise
        // order before U+E000..U+FFFF ones and break canonical parity
        val ordered =
          if (sortKeys) fields.sortBy(_._1)(Hashing.codePointOrder) else fields
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

  /** Python `==` over parsed JSON values: numbers compare by VALUE
    * across representations (`1 == 1.0`), booleans participate as
    * 1/0 (Python's bool-is-int), containers recurse, everything else
    * by node equality. Jackson's own equals type-splits IntNode from
    * DoubleNode, which is NOT what any reference `!=` check means. */
  def pyEquals(a: JsonNode, b: JsonNode): Boolean = {
    if (a == null || b == null) return a eq b
    def num(n: JsonNode): java.math.BigDecimal = n match {
      case bn: BooleanNode =>
        if (bn.booleanValue) java.math.BigDecimal.ONE else java.math.BigDecimal.ZERO
      case x if x.isNumber => x.decimalValue
      case _ => null
    }
    val (na, nb) = (num(a), num(b))
    if (na != null || nb != null)
      na != null && nb != null && na.compareTo(nb) == 0
    else (a, b) match {
      case (ao: ObjectNode, bo: ObjectNode) =>
        ao.size == bo.size && ao.properties().asScala.forall { e =>
          val other = bo.get(e.getKey)
          other != null && pyEquals(e.getValue, other)
        }
      case (aa: ArrayNode, ba: ArrayNode) =>
        aa.size == ba.size &&
          aa.elements.asScala.zip(ba.elements.asScala).forall {
            case (x, y) => pyEquals(x, y) }
      case _ => a == b
    }
  }
}
