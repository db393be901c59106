package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the core algebra (SURVEY §5 test plan): reach
  * totality, canonical-hash determinism/sensitivity, and the shallow-
  * merge laws the upsert path relies on. Pure ScalaCheck (sbt runs
  * Properties suites natively). */
object CoreProperties extends Properties("graft.core") {

  private def compact(json: String): String =
    PyJson.dumps(PyJson.parse(json), itemSep = ",", kvSep = ":", ensureAscii = false)

  val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
  val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000000, 1000000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
    Gen.oneOf("true", "false", "null"),
    Gen.chooseNum(-1000.0, 1000.0).map(d => PyJson.pyFloatRepr(d)))

  def objGen(depth: Int): Gen[String] =
    Gen.mapOf(Gen.zip(keyGen,
      if (depth <= 0) scalarGen else Gen.frequency(4 -> scalarGen, 1 -> objGen(depth - 1))))
      .map(m => m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))

  property("reach total; $ = identity modulo parse") =
    forAll(objGen(2), keyGen) { (json, key) =>
      Reach.reachString("$." + key, json) // must not throw
      PyJson.parse(Reach.reachString("$", json)) == PyJson.parse(json)
    }

  property("reach returns a stamped value") =
    forAll(objGen(1), keyGen, Gen.chooseNum(-99999, 99999)) { (json, key, v) =>
      val stamped = DocOps.mergeShallow(json, s"""{"$key":$v}""")
      Reach.reachString("$." + key, stamped) == v.toString
    }

  property("hashFromData deterministic + key-order-insensitive") =
    forAll(objGen(2)) { json =>
      val sorted = PyJson.dumps(PyJson.parse(json), sortKeys = true, itemSep = ",", kvSep = ":")
      Hashing.hashFromData(json) == Hashing.hashFromData(sorted) &&
        Hashing.hashFromData(json) == Hashing.hashFromData(json)
    }

  property("hashFromData value-sensitive") =
    forAll(objGen(1), keyGen) { (json, key) =>
      val a = DocOps.mergeShallow(json, s"""{"$key":1}""")
      val b = DocOps.mergeShallow(json, s"""{"$key":2}""")
      Hashing.hashFromData(a) != Hashing.hashFromData(b)
    }

  property("mergeShallow: right identity, self-idempotence, associativity") =
    forAll(objGen(2), objGen(2), objGen(2)) { (a, b, c) =>
      DocOps.mergeShallow(a, "{}") == compact(a) &&
        DocOps.mergeShallow(a, a) == compact(a) &&
        DocOps.mergeShallow(DocOps.mergeShallow(a, b), c) ==
          DocOps.mergeShallow(a, DocOps.mergeShallow(b, c))
    }

  property("mergeShallow right-bias: b's keys win") =
    forAll(objGen(1), objGen(1)) { (a, b) =>
      val merged = PyJson.parse(DocOps.mergeShallow(a, b))
      val bNode = PyJson.parse(b)
      var ok = true
      bNode.fieldNames.forEachRemaining { k => ok &&= merged.get(k) == bNode.get(k) }
      ok
    }

  property("uriFromUrl scheme-insensitive + idempotent") = {
    val urlGen = for {
      host <- Gen.identifier.map(_.take(10))
      params <- Gen.listOf(Gen.zip(keyGen, keyGen))
    } yield s"host-$host.com/p?" + params.map { case (k, v) => s"$k=$v" }.mkString("&")
    forAll(urlGen) { bare =>
      val http = Hashing.uriFromUrl("http://" + bare)
      http == Hashing.uriFromUrl("https://" + bare) && Hashing.uriFromUrl(http) == http
    }
  }

  property("Python json float repr round-trips") =
    forAll(Gen.chooseNum(-1e12, 1e12).map(_.asInstanceOf[Double])) { d =>
      PyJson.pyFloatRepr(d).toDouble == d
    }
}
