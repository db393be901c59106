package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON-Schema Draft-4 validation for documents and resource inputs
  * (reference: `Document.validate` document.py:45-71, resource input
  * validation generic.py:339-369 — the reference validates with the
  * Python `jsonschema` library at Draft-4). No JVM jsonschema library
  * ships in this environment, so this is a from-scratch Draft-4
  * implementation: `type`, `required`, `properties`,
  * `patternProperties`, `additionalProperties`, `items` (schema and
  * tuple form) + `additionalItems`, `enum`, `pattern`,
  * `minLength`/`maxLength`, `minimum`/`maximum` with Draft-4 boolean
  * `exclusiveMinimum`/`exclusiveMaximum`, `multipleOf`,
  * `minItems`/`maxItems`/`uniqueItems`,
  * `minProperties`/`maxProperties`, `dependencies`,
  * `allOf`/`anyOf`/`oneOf`/`not`, and local `$ref`
  * (`#/definitions/...`). `_id` is stripped before validation
  * (document.py:63-64).
  */
object Validation {

  final case class ValidationError(path: String, message: String) {
    override def toString = s"$path: $message"
  }

  def validateDocument(propertiesJson: String, schemaJson: String): Seq[ValidationError] = {
    // a malformed properties string is a VALIDATION failure, not a
    // crash: this runs per-row inside distributed jobs, where one
    // corrupt document aborting the whole pass is the wrong trade.
    // (The schema is the CALLER's artifact — that one still throws.)
    val data = PyJson.tryParse(propertiesJson).getOrElse(
      return Seq(ValidationError("$", "properties is not valid JSON")))
    data match {
      case o: ObjectNode => o.remove("_id")
      case _ =>
    }
    validate(data, PyJson.parse(schemaJson), "$")
  }

  /** Draft-4 enum equality: numbers compare by VALUE across JSON
    * representations (`1` matches `1.0` — the jsonschema library's
    * semantics, where Jackson node equality would type-split them),
    * booleans only match booleans (no Python bool-is-int leak), and
    * everything else falls back to structural node equality. Numeric
    * compare goes through BigDecimal so 64-bit integers past 2^53
    * don't collide through a double. */
  private def enumEquals(a: JsonNode, b: JsonNode): Boolean =
    if (a.isBoolean || b.isBoolean) a.isBoolean && b.isBoolean &&
      a.asBoolean() == b.asBoolean()
    else if (a.isNumber && b.isNumber)
      a.decimalValue().compareTo(b.decimalValue()) == 0
    else if (a.isArray && b.isArray)
      a.size() == b.size() &&
        a.elements.asScala.zip(b.elements.asScala).forall {
          case (x, y) => enumEquals(x, y) }
    else if (a.isObject && b.isObject)
      a.size() == b.size() &&
        a.properties().asScala.forall { e =>
          val other = b.get(e.getKey)
          other != null && enumEquals(e.getValue, other) }
    else a == b

  private def typeMatches(t: String, node: JsonNode): Boolean = t match {
    case "object" => node.isObject
    case "array" => node.isArray
    case "string" => node.isTextual
    // Draft-4: a float literal like 1.0 is NOT an integer
    case "number" => node.isNumber
    case "integer" => node.isIntegralNumber
    case "boolean" => node.isBoolean
    case "null" => node.isNull
    case _ => false
  }

  def validate(data: JsonNode, schema: JsonNode, path: String): Seq[ValidationError] =
    validate(data, schema, path, schema)

  /** Resolve a local JSON pointer ref (`#/definitions/name`). */
  private def resolveRef(ref: String, root: JsonNode): JsonNode = {
    require(ref.startsWith("#"), s"Only local refs supported, got: $ref")
    var node = root
    ref.stripPrefix("#").split("/").filter(_.nonEmpty).foreach { seg =>
      val key = seg.replace("~1", "/").replace("~0", "~")
      node = if (node.isArray) node.get(key.toInt) else node.get(key)
      require(node != null, s"Unresolvable ref: $ref (at segment '$key')")
    }
    node
  }

  // scalastyle:off cyclomatic.complexity method.length
  private def validate(data: JsonNode, schema: JsonNode, path: String,
                       root: JsonNode): Seq[ValidationError] = {
    // $ref replaces all sibling keywords (Draft-4 semantics)
    Option(schema.get("$ref")).filter(_.isTextual).foreach { ref =>
      return validate(data, resolveRef(ref.asText, root), path, root)
    }
    val errors = Seq.newBuilder[ValidationError]

    Option(schema.get("type")).foreach { t =>
      val types = if (t.isArray) t.elements.asScala.map(_.asText).toSeq else Seq(t.asText)
      if (!types.exists(typeMatches(_, data)))
        errors += ValidationError(path, s"expected type ${types.mkString("/")}")
    }
    Option(schema.get("enum")).filter(_.isArray).foreach { e =>
      if (!e.elements.asScala.exists(enumEquals(_, data)))
        errors += ValidationError(path, "value not in enum")
    }

    // ----- combinators
    Option(schema.get("allOf")).filter(_.isArray).foreach { subs =>
      subs.elements.asScala.foreach(sub => errors ++= validate(data, sub, path, root))
    }
    Option(schema.get("anyOf")).filter(_.isArray).foreach { subs =>
      val ok = subs.elements.asScala.exists(sub => validate(data, sub, path, root).isEmpty)
      if (!ok) errors += ValidationError(path, "matches no schema in anyOf")
    }
    Option(schema.get("oneOf")).filter(_.isArray).foreach { subs =>
      val matches = subs.elements.asScala.count(sub => validate(data, sub, path, root).isEmpty)
      if (matches != 1)
        errors += ValidationError(path, s"matches $matches schemas in oneOf, expected exactly 1")
    }
    Option(schema.get("not")).foreach { sub =>
      if (validate(data, sub, path, root).isEmpty)
        errors += ValidationError(path, "matches schema in not")
    }

    // ----- strings
    if (data.isTextual) {
      val s = data.textValue
      Option(schema.get("minLength")).foreach(m =>
        if (s.codePointCount(0, s.length) < m.asInt) errors += ValidationError(path, "too short"))
      Option(schema.get("maxLength")).foreach(m =>
        if (s.codePointCount(0, s.length) > m.asInt) errors += ValidationError(path, "too long"))
      Option(schema.get("pattern")).foreach { p =>
        // Draft-4 pattern is an UNANCHORED regex search
        if (!java.util.regex.Pattern.compile(p.asText).matcher(s).find())
          errors += ValidationError(path, s"does not match pattern ${p.asText}")
      }
    }

    // ----- numbers
    if (data.isNumber) {
      val v = data.decimalValue
      val exclusiveMin = Option(schema.get("exclusiveMinimum")).exists(_.asBoolean(false))
      val exclusiveMax = Option(schema.get("exclusiveMaximum")).exists(_.asBoolean(false))
      Option(schema.get("minimum")).foreach { m =>
        val cmp = v.compareTo(m.decimalValue)
        if (cmp < 0 || (exclusiveMin && cmp == 0))
          errors += ValidationError(path, "below minimum")
      }
      Option(schema.get("maximum")).foreach { m =>
        val cmp = v.compareTo(m.decimalValue)
        if (cmp > 0 || (exclusiveMax && cmp == 0))
          errors += ValidationError(path, "above maximum")
      }
      Option(schema.get("multipleOf")).foreach { m =>
        if (v.remainder(m.decimalValue).compareTo(java.math.BigDecimal.ZERO) != 0)
          errors += ValidationError(path, s"not a multiple of ${m.asText}")
      }
    }

    // ----- objects
    if (data.isObject) {
      val fields = data.asInstanceOf[ObjectNode].properties.asScala.map(_.getKey).toSeq
      Option(schema.get("required")).filter(_.isArray).foreach { req =>
        req.elements.asScala.foreach { r =>
          if (!data.has(r.asText))
            errors += ValidationError(s"$path.${r.asText}", "required property missing")
        }
      }
      Option(schema.get("minProperties")).foreach(m =>
        if (fields.length < m.asInt) errors += ValidationError(path, "too few properties"))
      Option(schema.get("maxProperties")).foreach(m =>
        if (fields.length > m.asInt) errors += ValidationError(path, "too many properties"))

      val propSchemas: Map[String, JsonNode] =
        Option(schema.get("properties")).filter(_.isObject)
          .map(_.properties.asScala.map(e => e.getKey -> e.getValue).toMap)
          .getOrElse(Map.empty)
      val patternSchemas: Seq[(java.util.regex.Pattern, JsonNode)] =
        Option(schema.get("patternProperties")).filter(_.isObject)
          .map(_.properties.asScala.map(e =>
            java.util.regex.Pattern.compile(e.getKey) -> e.getValue).toSeq)
          .getOrElse(Seq.empty)

      fields.foreach { name =>
        val value = data.get(name)
        var matched = false
        propSchemas.get(name).foreach { s =>
          matched = true
          errors ++= validate(value, s, s"$path.$name", root)
        }
        patternSchemas.foreach { case (pat, s) =>
          if (pat.matcher(name).find()) {
            matched = true
            errors ++= validate(value, s, s"$path.$name", root)
          }
        }
        if (!matched) Option(schema.get("additionalProperties")).foreach {
          case b if b.isBoolean =>
            if (!b.asBoolean)
              errors += ValidationError(s"$path.$name", "additional property not allowed")
          case s if s.isObject =>
            errors ++= validate(value, s, s"$path.$name", root)
          case _ =>
        }
      }

      // dependencies: property form (array of names) and schema form
      Option(schema.get("dependencies")).filter(_.isObject).foreach { deps =>
        deps.properties.asScala.foreach { e =>
          if (data.has(e.getKey)) e.getValue match {
            case arr if arr.isArray =>
              arr.elements.asScala.foreach { need =>
                if (!data.has(need.asText))
                  errors += ValidationError(s"$path.${need.asText}",
                    s"required by dependency on ${e.getKey}")
              }
            case sub if sub.isObject =>
              errors ++= validate(data, sub, path, root)
            case _ =>
          }
        }
      }
    }

    // ----- arrays
    if (data.isArray) {
      val elems = data.asInstanceOf[ArrayNode].elements.asScala.toSeq
      Option(schema.get("minItems")).foreach(m =>
        if (elems.length < m.asInt) errors += ValidationError(path, "too few items"))
      Option(schema.get("maxItems")).foreach(m =>
        if (elems.length > m.asInt) errors += ValidationError(path, "too many items"))
      Option(schema.get("uniqueItems")).filter(_.asBoolean(false)).foreach { _ =>
        if (elems.distinct.length != elems.length)
          errors += ValidationError(path, "items are not unique")
      }
      Option(schema.get("items")).foreach {
        case tuple if tuple.isArray => // tuple form + additionalItems
          val itemSchemas = tuple.elements.asScala.toSeq
          elems.zipWithIndex.foreach { case (el, i) =>
            if (i < itemSchemas.length)
              errors ++= validate(el, itemSchemas(i), s"$path[$i]", root)
            else Option(schema.get("additionalItems")).foreach {
              case b if b.isBoolean =>
                if (!b.asBoolean)
                  errors += ValidationError(s"$path[$i]", "additional item not allowed")
              case s if s.isObject => errors ++= validate(el, s, s"$path[$i]", root)
              case _ =>
            }
          }
        case itemSchema =>
          elems.zipWithIndex.foreach { case (el, i) =>
            errors ++= validate(el, itemSchema, s"$path[$i]", root)
          }
      }
    }
    errors.result()
  }
  // scalastyle:on cyclomatic.complexity method.length
}
