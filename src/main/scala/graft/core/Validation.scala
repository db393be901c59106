package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** JSON-Schema validation for documents and resource inputs (reference:
  * `Document.validate` document.py:45-71, resource input validation
  * generic.py:339-369 — JSON Schema Draft-4 subset). No JVM jsonschema
  * library ships in this environment, so this implements the subset the
  * reference's schemas actually use: `type`, `required`, `properties`,
  * `items`, `enum`, `minLength`/`maxLength`, `minimum`/`maximum`.
  * `_id` is stripped before validation (document.py:63-64).
  */
object Validation {

  final case class ValidationError(path: String, message: String) {
    override def toString = s"$path: $message"
  }

  def validateDocument(propertiesJson: String, schemaJson: String): Seq[ValidationError] = {
    val data = PyJson.parse(propertiesJson)
    data match {
      case o: ObjectNode => o.remove("_id")
      case _ =>
    }
    validate(data, PyJson.parse(schemaJson), "$")
  }

  private def typeMatches(t: String, node: JsonNode): Boolean = t match {
    case "object" => node.isObject
    case "array" => node.isArray
    case "string" => node.isTextual
    case "number" => node.isNumber
    case "integer" => node.isIntegralNumber
    case "boolean" => node.isBoolean
    case "null" => node.isNull
    case _ => false
  }

  def validate(data: JsonNode, schema: JsonNode, path: String): Seq[ValidationError] = {
    val errors = Seq.newBuilder[ValidationError]
    Option(schema.get("type")).foreach { t =>
      val types = if (t.isArray) t.elements.asScala.map(_.asText).toSeq else Seq(t.asText)
      if (!types.exists(typeMatches(_, data)))
        errors += ValidationError(path, s"expected type ${types.mkString("/")}")
    }
    Option(schema.get("enum")).filter(_.isArray).foreach { e =>
      if (!e.elements.asScala.contains(data))
        errors += ValidationError(path, "value not in enum")
    }
    if (data.isTextual) {
      Option(schema.get("minLength")).foreach(m =>
        if (data.textValue.length < m.asInt) errors += ValidationError(path, "too short"))
      Option(schema.get("maxLength")).foreach(m =>
        if (data.textValue.length > m.asInt) errors += ValidationError(path, "too long"))
    }
    if (data.isNumber) {
      Option(schema.get("minimum")).foreach(m =>
        if (data.doubleValue < m.doubleValue) errors += ValidationError(path, "below minimum"))
      Option(schema.get("maximum")).foreach(m =>
        if (data.doubleValue > m.doubleValue) errors += ValidationError(path, "above maximum"))
    }
    if (data.isObject) {
      Option(schema.get("required")).filter(_.isArray).foreach { req =>
        req.elements.asScala.foreach { r =>
          if (!data.has(r.asText))
            errors += ValidationError(s"$path.${r.asText}", "required property missing")
        }
      }
      Option(schema.get("properties")).filter(_.isObject).foreach { props =>
        props.fields.asScala.foreach { e =>
          if (data.has(e.getKey))
            errors ++= validate(data.get(e.getKey), e.getValue, s"$path.${e.getKey}")
        }
      }
    }
    if (data.isArray) {
      Option(schema.get("items")).foreach { itemSchema =>
        data.asInstanceOf[ArrayNode].elements.asScala.zipWithIndex.foreach { case (el, i) =>
          errors ++= validate(el, itemSchema, s"$path[$i]")
        }
      }
    }
    errors.result()
  }
}
