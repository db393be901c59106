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
