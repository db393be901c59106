package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Specs for Configuration (tests/configuration/test_types.py shapes)
  * and the §2.8 scalar utilities. */
class ConfigurationSpec extends AnyFunSuite {

  test("lookup order: private, $-variable, plain, defaults, namespaced defaults") {
    val c = Configuration(namespace = Seq("http_resource"),
      privateKeys = Configuration.DefaultPrivate + "_secret")
      .withValues(Map("purge_immediately" -> true, "$setting1" -> "variable",
        "secret" -> "hidden"))
    assert(c.get("purge_immediately") === true)
    assert(c.get("setting1") === "variable") // $-variable reachable bare
    assert(c.get("secret") === "hidden") // private key shielded but readable
    assert(c.get("timeout") === 30) // namespaced default http_resource_timeout
    assert(c.get("batch_size") === 100) // global fallback
    intercept[Configuration.ConfigurationNotFound](c.get("nope"))
  }

  test("to_dict visibility: plain always, protected/private opt-in") {
    val c = Configuration(namespace = Seq("test"),
      privateKeys = Configuration.DefaultPrivate + "_priv")
      .withValues(Map("plain" -> 1, "priv" -> 2, "_prot" -> 3))
    assert(c.toMap() === Map("plain" -> 1))
    assert(c.toMap(protectedKeys = true) === Map("plain" -> 1, "_prot" -> 3))
    assert(c.toMap(includePrivate = true) === Map("plain" -> 1, "_priv" -> 2))
  }

  test("supplement only fills missing keys") {
    val c = Configuration(namespace = Seq("test")).withValues(Map("a" -> 1))
    val s = c.supplement(Map("a" -> 9, "b" -> 2))
    assert(s.get("a") === 1 && s.get("b") === 2)
  }

  test("a value stored under a non-lowercase key is retrievable as stored (attribute protocol, types.py:110,235-237)") {
    // update stores keys as given; the lookup's direct probe hits the
    // exact key BEFORE the lowercased _/$/defaults chain — without it
    // "batchSize" would be stored yet permanently unretrievable
    val c = Configuration(namespace = Seq("test"))
      .withValues(Map("batchSize" -> 50))
    assert(c.get("batchSize") === 50)
    // the lowercased chain still misses it, like Python __getattr__
    intercept[Configuration.ConfigurationNotFound](c.get("batchsize"))
  }
}

class TextUtilsSpec extends AnyFunSuite {

  test("parse_content_type (generic.py:671-687)") {
    assert(TextUtils.parseContentType("application/json") === ("application/json", "utf-8"))
    assert(TextUtils.parseContentType("text/html; charset=latin-1") === ("text/html", "latin-1"))
    intercept[IllegalArgumentException](TextUtils.parseContentType("~nonsense~"))
  }

  test("is_json_mimetype") {
    assert(TextUtils.isJsonMimetype("application/json"))
    assert(TextUtils.isJsonMimetype("application/vnd.api+json"))
    assert(!TextUtils.isJsonMimetype("text/html"))
    // Python re.match is a PREFIX match: jsonp is json-truthy there
    assert(TextUtils.isJsonMimetype("application/jsonp"))
  }

  test("mimeFromHead: split-on-semicolon like HttpResource.content (generic.py:207), never parse_content_type's regex") {
    import graft.core.Objective.mimeFromHead
    // suffixed mimetype survives whole (the regex would truncate to
    // application/vnd and misroute away from JSON)
    assert(mimeFromHead("""{"Content-Type":"application/vnd.api+json"}""")
      === "application/vnd.api+json")
    // a wildcard header is an unsupported mimetype, not a crash
    assert(mimeFromHead("""{"content-type":"*/*; q=0.8"}""") === "*/*")
    assert(mimeFromHead("""{"content-type":"text/html; charset=utf-8"}""")
      === "text/html")
    // documented lenience: absent head or header defaults to JSON
    assert(mimeFromHead(null) === "application/json")
    assert(mimeFromHead("{}") === "application/json")
  }

  test("camel→snake (dataset.py:95-110)") {
    assert(TextUtils.camelToSnake("PaperDataset") === "paper")
    assert(TextUtils.camelToSnake("MyBigThingDataset") === "my_big_thing")
    assert(TextUtils.camelToSnake("Dataset") === "dataset")
  }

  test("datetime format pair round-trips; failure → epoch (utils/datetime.py:138-162)") {
    val dt = java.time.LocalDateTime.of(2024, 3, 5, 13, 37, 42, 123456000)
    val s = TextUtils.formatDatetime(dt)
    assert(s === "20240305133742123456")
    assert(TextUtils.parseDatetimeString(s) === dt)
    assert(TextUtils.parseDatetimeString("garbage") ===
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0))
  }

  test("clean output strips NULs") {
    assert(TextUtils.cleanOutput("a\u0000b".getBytes("UTF-8")) === "ab")
  }

  test("Tika extract_texts heuristic (tika.py:62-111)") {
    val title = "The Great Paper"
    val text = Seq(
      "junk header", // before title → junk
      "The Great Paper", // title line
      "Section One", // short line → bucket (title candidate)
      "this line has more than ten words so it is a paragraph for sure yes",
      "short one", "short two",
      "short three", // bucket full + paragraphs passed → junk_only flips (line dropped)
      "trailing junk" // now collected as junk
    ).mkString("\n")
    val (titles, paragraphs, junk) = TextUtils.extractTexts(title, text)
    assert(titles === Seq("The Great Paper", "Section One"))
    assert(paragraphs.length === 1)
    assert(junk.contains("junk header"))
    assert(junk.contains("trailing junk"))
    assert(TextUtils.extractTexts("", text) === ((Nil, Nil, Nil)))
  }
}
