package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM specs for the core path/hash/json kernel. Golden values were
  * computed with CPython's json/hashlib against the reference algorithms
  * (datagrowth/resources/http/generic.py:644-669, signatures.py:68-89).
  */
class PyJsonSpec extends AnyFunSuite {
  test("dumps matches python json.dumps (sort_keys, ensure_ascii)") {
    val node = PyJson.parse("""{"b":1.0,"a":[1e16,1e-5,0.1,-2.5e-7],"u":"überhaupt\n"}""")
    assert(PyJson.dumps(node, sortKeys = true) ===
      "{\"a\": [1e+16, 1e-05, 0.1, -2.5e-07], \"b\": 1.0, \"u\": \"\\u00fcberhaupt\\n\"}")
  }
  test("compact canonical form matches python") {
    val node = PyJson.parse("""{"x":[true,null,"a b"],"k":123456789012345}""")
    assert(PyJson.canonical(node) === """{"k":123456789012345,"x":[true,null,"a b"]}""")
  }
  test("float repr edge cases") {
    assert(PyJson.pyFloatRepr(1.0) === "1.0")
    assert(PyJson.pyFloatRepr(1e16) === "1e+16")
    assert(PyJson.pyFloatRepr(1e-5) === "1e-05")
    assert(PyJson.pyFloatRepr(0.1) === "0.1")
    assert(PyJson.pyFloatRepr(-2.5e-7) === "-2.5e-07")
    assert(PyJson.pyFloatRepr(1234567.25) === "1234567.25")
  }
  test("float repr is SHORTEST round-trip (CPython dtoa parity — this JDK's Double.toString is not)") {
    // Java 17 prints 1e23 as "9.999999999999999E22" and MIN_VALUE as
    // "4.9E-324"; CPython repr says 1e+23 / 5e-324 — byte parity of
    // the cache keys demands the CPython digits (each golden verified
    // against python3 repr; a 406k-double fuzz ran during the fix)
    assert(PyJson.pyFloatRepr(1e23) === "1e+23")
    assert(PyJson.pyFloatRepr(java.lang.Double.MIN_VALUE) === "5e-324")
    assert(PyJson.pyFloatRepr(1e22) === "1e+22")
    assert(PyJson.pyFloatRepr(1.7976931348623157e308) === "1.7976931348623157e+308")
    assert(PyJson.pyFloatRepr(9007199254740992.0) === "9007199254740992.0")
    assert(PyJson.pyFloatRepr(-0.0) === "-0.0")
    // nearest p-digit neighbour wins when only it round-trips
    assert(PyJson.pyFloatRepr(
      java.lang.Double.longBitsToDouble(-4336622481193250041L)) ===
      "-4.963901022113897e+18")
    // a genuine both-round-trip tie resolves to the EVEN last digit
    assert(PyJson.pyFloatRepr(
      java.lang.Double.longBitsToDouble(4830194630961515902L)) ===
      "854928755964335.8")
  }
  test("canonical key sort is code-point order (Python sorted), not UTF-16 order") {
    // U+1F600 (surrogate pair, sorts LOW in UTF-16) must come AFTER
    // U+FB01 like CPython sorts it
    val node = PyJson.parse("""{"😀":1,"ﬁ":2}""")
    assert(PyJson.canonical(node) === "{\"ﬁ\":2,\"😀\":1}")
  }
  test("pyEquals: Python == semantics over JSON values") {
    def eq(a: String, b: String) =
      PyJson.pyEquals(PyJson.parse(a), PyJson.parse(b))
    assert(eq("1", "1.0"))
    assert(eq("true", "1") && eq("false", "0.0"))
    assert(!eq("1", "\"1\""))
    assert(eq("""{"a":[1,true]}""", """{"a":[1.0,1]}"""))
    assert(!eq("""{"a":1}""", """{"a":2}"""))
  }
}

class ReachSpec extends AnyFunSuite {
  // The reference's mock payload (tests/django_project/project/mocks/data.py:7-16)
  val mock: String =
    """{"dict": {"test": "nested value", "list": ["nested value 0", "nested value 1", "nested value 2"], "dict": {"test": "test"}},
      |"list": ["value 0", "value 1", "value 2"],
      |"dotted.key": "another value",
      |"unicode": ["überhaupt"]}""".stripMargin

  test("whole-document path $") {
    assert(Reach.reachString("$", """{"a":1}""") === """{"a":1}""")
  }
  test("dict and list traversal with digit indexes") {
    assert(Reach.reachString("$.dict.test", mock) === "nested value")
    assert(Reach.reachString("$.dict.list.1", mock) === "nested value 1")
    assert(Reach.reachString("$.list.2", mock) === "value 2")
    assert(Reach.reachString("$.unicode.0", mock) === "überhaupt")
  }
  test("dotted literal key fallback") {
    assert(Reach.reachString("$.dotted.key", mock) === "another value")
  }
  test("an over-Int digit segment resolves to nothing, never throws (Python int() + IndexError fallback)") {
    assert(Reach.reachString("$.list.99999999999", mock) === null)
    assert(Reach.reachString("$.list.999999999999999999999", mock) === null)
  }
  test("missing path resolves to null") {
    assert(Reach.reachString("$.nope", mock) === null)
    assert(Reach.reachString("$.dict.list.9", mock) === null)
  }
  test("non-string nodes render as JSON text") {
    val j = """{"n":87,"f":1.5,"b":true,"o":{"a":1},"l":[1,2],"z":null,"u":["ü"]}"""
    assert(Reach.reachString("$.n", j) === "87")
    assert(Reach.reachString("$.f", j) === "1.5")
    assert(Reach.reachString("$.b", j) === "true")
    assert(Reach.reachString("$.o", j) === """{"a":1}""")
    assert(Reach.reachString("$.l", j) === "[1,2]")
    assert(Reach.reachString("$.z", j) === null)
    assert(Reach.reachString("$.u", j) === "[\"ü\"]")
  }
  test("invalid path rejected") {
    intercept[IllegalArgumentException](Reach.reachString("nope", "{}"))
    intercept[IllegalArgumentException](Reach.reachString("$.", "{}"))
  }
  test("reachArray explodes arrays, objects only with objectValues") {
    val j = """{"results":[{"id":1},{"id":2}],"map":{"a":{"id":3},"b":{"id":4}}}"""
    assert(Reach.reachArray("$.results", j, false).toSeq === Seq("""{"id":1}""", """{"id":2}"""))
    assert(Reach.reachArray("$.map", j, true).toSeq === Seq("""{"id":3}""", """{"id":4}"""))
    assert(Reach.reachArray("$.results.0", j, false).toSeq === Seq("""{"id":1}"""))
    assert(Reach.reachArray("$.missing", j, false) === null)
  }
}

class HashingSpec extends AnyFunSuite {
  test("hash_from_data matches reference SHA-1 canonicalization") {
    assert(Hashing.hashFromData("""{"b":1,"a":"x","c":{"z":[1,2,"ü"],"y":null},"d":true,"e":1.5}""") ===
      "527aed05b73de2374e7ab5788f2b68999c0823a4")
    assert(Hashing.hashFromData("""{"q":"search","page":2}""") ===
      "02118b7001a13d27b016d5716dabf329305b5eaf")
    assert(Hashing.hashFromData("{}") === "")
    assert(Hashing.hashFromData(null) === "")
  }
  test("signature hash matches reference SHA-256 canonical json") {
    assert(Hashing.signatureHash("api.example.com/v1?q=x", """{"a":[1,2],"t":"überhaupt","f":0.1}""") ===
      "0915b633b8193c3ac1db494313068edf5c24dd94ca893a57aa15cd5b86e896e0")
    assert(Hashing.signatureHash("localhost:8000/entities/paper/", "{}") ===
      "801e9727aea2aceda77834cb9557fac2646aeb3d6d42bc99d889d8e793ea2cd4")
  }
  test("uri_from_url sorts params, collapses duplicates (last wins), strips scheme") {
    assert(Hashing.uriFromUrl("http://localhost:8000/en/test/?b=2&a=1&a=0") ===
      "localhost:8000/en/test/?a=0&b=2")
    assert(Hashing.uriFromUrl("https://api.example.com/v1") === "api.example.com/v1")
  }
  test("uri_from_url: urlobject parity — fragment kept, params decoded then re-encoded") {
    // URLObject.with_query preserves the fragment AFTER the query
    assert(Hashing.uriFromUrl("http://h/p?b=2&a=1#sec") === "h/p?a=1&b=2#sec")
    assert(Hashing.uriFromUrl("http://h/p#sec") === "h/p#sec")
    // urlsplit: a '#' before '?' makes the '?' part of the FRAGMENT
    assert(Hashing.uriFromUrl("http://h/p#f?x") === "h/p#f?x")
    // .query.dict DECODES (%20 and '+' → space), urlencode re-encodes
    // via quote_plus — the two spellings normalize to ONE cache key
    assert(Hashing.uriFromUrl("http://h/p?q=a%20b") === "h/p?q=a+b")
    assert(Hashing.uriFromUrl("http://h/p?q=a+b") === "h/p?q=a+b")
    assert(Hashing.uriFromUrl("http://h/p?a=%C3%A9") === "h/p?a=%C3%A9")
    // a key with no '=' is urlobject's None value; urlencode prints
    // the literal "None" (reference quirk, kept for key parity)
    assert(Hashing.uriFromUrl("http://h/p?flag&x=1") === "h/p?flag=None&x=1")
  }
  test("uri_from_cmd sorts argv after program name") {
    assert(Hashing.uriFromCmd(Seq("tika", "-t", "/path/b", "--aaa")) === "tika --aaa -t /path/b")
  }
}
