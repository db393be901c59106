package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Validation subset specs (document.py:45-71 + generic.py:339-369). */
class ValidationSpec extends AnyFunSuite {

  val schema =
    """{"type":"object","required":["id","title"],
      |"properties":{
      |  "id":{"type":"integer","minimum":0},
      |  "title":{"type":"string","minLength":1,"maxLength":20},
      |  "state":{"enum":["open","closed"]},
      |  "tags":{"type":"array","items":{"type":"string"}}}}""".stripMargin

  test("valid document passes; _id stripped before validation (document.py:63-64)") {
    assert(Validation.validateDocument(
      """{"id":1,"title":"ok","state":"open","tags":["a"],"_id":999}""", schema).isEmpty)
  }

  test("missing required, wrong types, enum and bounds violations reported") {
    val errs = Validation.validateDocument(
      """{"id":-1,"state":"deleted","tags":["a",2]}""", schema)
    val paths = errs.map(_.path).toSet
    assert(paths.contains("$.title")) // required missing
    assert(paths.contains("$.id")) // below minimum
    assert(paths.contains("$.state")) // enum
    assert(paths.contains("$.tags[1]")) // item type
  }

  test("enum compares numbers by value across JSON representations; booleans stay distinct") {
    val numEnum = """{"enum":[1, 2.5]}"""
    // 1.0 matches enum member 1 (JSON value equality — the jsonschema
    // semantics; Jackson node equality would type-split them)
    assert(Validation.validateDocument("""{"x":1.0}""",
      s"""{"properties":{"x":$numEnum}}""").isEmpty)
    assert(Validation.validateDocument("""{"x":2.5}""",
      s"""{"properties":{"x":$numEnum}}""").isEmpty)
    assert(Validation.validateDocument("""{"x":3}""",
      s"""{"properties":{"x":$numEnum}}""").nonEmpty)
    // true must NOT match 1 (no bool-is-int leak)
    assert(Validation.validateDocument("""{"x":true}""",
      s"""{"properties":{"x":$numEnum}}""").nonEmpty)
    assert(Validation.validateDocument("""{"x":true}""",
      """{"properties":{"x":{"enum":[true]}}}""").isEmpty)
    // value equality recurses into containers
    assert(Validation.validateDocument("""{"x":{"a":[1.0]}}""",
      """{"properties":{"x":{"enum":[{"a":[1]}]}}}""").isEmpty)
  }

  test("malformed properties JSON is a validation error, not a crash; a malformed schema still throws") {
    val errs = Validation.validateDocument("not json", schema)
    assert(errs.exists(e => e.path == "$" && e.message.contains("not valid JSON")))
    intercept[Exception](Validation.validateDocument("{}", "not json"))
  }

  // tests/django_project/datatypes/tests/test_document.py:22-32
  val referenceDocSchema =
    """{"additionalProperties": false,
      | "required": ["value"],
      | "type": "object",
      | "properties": {
      |   "word": {"type": "string"},
      |   "value": {"type": "string"},
      |   "language": {"type": "string"},
      |   "country": {"type": "string"}}}""".stripMargin

  test("reference document schema: additionalProperties rejects extras (test_document.py:316-323)") {
    assert(Validation.validateDocument(
      """{"word":"pension","value":"pension","language":"en","country":"X"}""",
      referenceDocSchema).isEmpty)
    // wrong_content["wrong"] = True → ValidationError
    val errs = Validation.validateDocument(
      """{"value":"pension","wrong":true}""", referenceDocSchema)
    assert(errs.exists(e => e.path == "$.wrong" && e.message.contains("additional")))
    // missing required value
    assert(Validation.validateDocument("{}", referenceDocSchema)
      .exists(_.path == "$.value"))
  }

  // tests/django_project/resources/models/http.py:24-42 GET_SCHEMA.args
  val referenceArgsSchema =
    """{"title": "resource mock arguments",
      | "type": "array",
      | "items": [
      |   {"type": "string", "enum": ["en", "nl"]},
      |   {"type": "string", "pattern": "[A-Za-z0-9]+"}],
      | "additionalItems": false,
      | "minItems": 2}""".stripMargin

  test("reference args schema: tuple items, enum, pattern, additionalItems, minItems") {
    def errs(json: String) =
      Validation.validate(PyJson.parse(json), PyJson.parse(referenceArgsSchema), "$")
    assert(errs("""["en", "test"]""").isEmpty)
    assert(errs("""["de", "test"]""").exists(_.path == "$[0]")) // enum
    assert(errs("""["en", "!!!"]""").exists(_.path == "$[1]")) // pattern
    assert(errs("""["en"]""").nonEmpty) // minItems
    assert(errs("""["en", "test", "extra"]""").exists(_.path == "$[2]")) // additionalItems
  }

  test("draft-4 combinators: anyOf/oneOf/not/allOf and $ref") {
    val s =
      """{"definitions": {"posint": {"type": "integer", "minimum": 1}},
        | "type": "object",
        | "properties": {
        |   "n": {"anyOf": [{"$ref": "#/definitions/posint"}, {"type": "string"}]},
        |   "x": {"oneOf": [{"type": "integer"}, {"minimum": 5}]},
        |   "y": {"not": {"type": "null"}},
        |   "z": {"allOf": [{"type": "integer"}, {"multipleOf": 3}]}}}""".stripMargin
    def errs(json: String) = Validation.validate(PyJson.parse(json), PyJson.parse(s), "$")
    assert(errs("""{"n": 2, "y": "ok", "z": 9}""").isEmpty)
    assert(errs("""{"n": 0}""").exists(_.path == "$.n")) // fails posint via $ref
    assert(errs("""{"n": "text"}""").isEmpty)
    assert(errs("""{"x": 7}""").exists(_.path == "$.x")) // matches both in oneOf
    assert(errs("""{"x": 5.5}""").isEmpty) // only the minimum branch matches
    assert(errs("""{"y": null}""").exists(_.path == "$.y"))
    assert(errs("""{"z": 10}""").exists(_.path == "$.z"))
  }

  test("draft-4 object/number keywords: patternProperties, dependencies, exclusive bounds") {
    val s =
      """{"type": "object",
        | "patternProperties": {"^x_": {"type": "integer"}},
        | "properties": {
        |   "rate": {"type": "number", "minimum": 0, "exclusiveMinimum": true,
        |            "maximum": 1, "exclusiveMaximum": false},
        |   "card": {"type": "string"}},
        | "dependencies": {"card": ["cvv"]}}""".stripMargin
    def errs(json: String) = Validation.validate(PyJson.parse(json), PyJson.parse(s), "$")
    assert(errs("""{"x_a": 1, "rate": 1, "card": "42", "cvv": "1"}""").isEmpty)
    assert(errs("""{"x_a": "no"}""").exists(_.path == "$.x_a"))
    assert(errs("""{"rate": 0}""").exists(_.message == "below minimum")) // exclusive
    assert(errs("""{"rate": 1.5}""").exists(_.message == "above maximum"))
    assert(errs("""{"card": "42"}""").exists(_.path == "$.cvv")) // dependency
    // draft-4: 1.0 is not an integer
    assert(Validation.validate(PyJson.parse("1.0"),
      PyJson.parse("""{"type": "integer"}"""), "$").nonEmpty)
  }

  test("draft-4 array keywords: uniqueItems, maxItems") {
    val s = """{"type": "array", "uniqueItems": true, "maxItems": 3}"""
    def errs(json: String) = Validation.validate(PyJson.parse(json), PyJson.parse(s), "$")
    assert(errs("""[1, 2, 3]""").isEmpty)
    assert(errs("""[1, 1]""").exists(_.message.contains("unique")))
    assert(errs("""[1, 2, 3, 4]""").exists(_.message.contains("too many")))
  }

  test("content-type dispatch: json routes, others raise (extraction.py:110-135)") {
    val obj = Objective("$.results", Seq("id" -> "$.id"))
    val out = Objective.extractByContentType(obj, "application/vnd.api+json",
      """{"results":[{"id":1}]}""")
    assert(out.length === 1)
    assert(Objective.extractByContentType(obj, null, "{}").isEmpty)
    intercept[IllegalArgumentException](
      Objective.extractByContentType(obj, "text/html", "<html/>"))
  }
}
