package graft.sources

import java.nio.file.Files
import graft.SparkTestBase

/** Signature-keyed filesystem storage: layout parity with the
  * reference's FileSystemStorage (per-signature directories named by
  * the DECIMAL signature hash), permission flags, filename guards,
  * and the parquet-cache → signature-directory export bridge. */
class SignatureStoreSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("sigstore").toString

  test("golden: a real reference snapshot's directory name reproduces bit-for-bit") {
    // tests/snapshots/mockhttptikaresource/<hash>/data.json in the
    // reference repo — uri and bin:// data stub copied from that
    // snapshot's own signature block; the decimal directory name must
    // come out identical (str(int(sha256_hex, 16)) in CPython)
    val sig = Signature(
      uri = "localhost:9998/rmeta/text?mode=structure",
      dataJson = "bin://file:///tmp/ff0b3270fb4e3a2d1099f4f0b180485af048" +
        "cf61cc71044266cbfbcd34b5bd0b.bin",
      sigType = Some("mockhttptikaresource"))
    assert(sig.hashDecimal ===
      "35158309756210201823619049599250821925201111741398156257010603093424397855076")
    val store = new SignatureStore(tmpDir())
    val dir = store.storageDirectory(sig)
    assert(dir.getParent.getFileName.toString === "mockhttptikaresource")
    assert(dir.getFileName.toString === sig.hashDecimal)
  }

  test("signature hash semantics: key order invariance, null==empty data, value sensitivity") {
    val u = "example://resource"
    assert(Signature(u, """{"a":1,"b":2}""").hashDecimal ===
      Signature(u, """{"b":2,"a":1}""").hashDecimal)
    assert(Signature(u, null).hashDecimal === Signature(u, "{}").hashDecimal)
    assert(Signature(u, """{"a":1,"b":2}""").hashDecimal !==
      Signature(u, """{"a":1,"b":3}""").hashDecimal)
    assert(Signature(u).hashDecimal !==
      Signature("example://other").hashDecimal)
  }

  test("signature type validation mirrors the reference's filesystem-safety rules") {
    Signature("u", sigType = Some("Valid_type-1.x")) // allowed
    for (bad <- Seq("", ".", "..", "a/b", "a\\b", ".hidden", "-lead", "sp ace"))
      intercept[IllegalArgumentException] {
        Signature("u", sigType = Some(bad))
      }
  }

  test("save/load/write/read round-trip; filename guards; permission flags refuse loudly") {
    val store = new SignatureStore(tmpDir())
    val sig = Signature("example://doc", """{"q":"x"}""", Some("restype"))
    assert(store.load(sig).isEmpty, "unsaved signature loads as None")
    store.save(sig, """{"uri":"example://doc","status":200}""")
    assert(store.load(sig) === Some("""{"uri":"example://doc","status":200}"""))
    store.writeText(sig, "body-0.html", "<p>hi</p>")
    assert(store.readText(sig, "body-0.html") === "<p>hi</p>")
    // the reference's three filename guards, verbatim semantics
    intercept[IllegalArgumentException] { store.write(sig, "/abs.bin", Array[Byte](1)) }
    intercept[IllegalArgumentException] { store.write(sig, "a/b.bin", Array[Byte](1)) }
    intercept[IllegalArgumentException] { store.write(sig, "data.json", Array[Byte](1)) }
    intercept[IllegalArgumentException] { store.read(sig, "data.json") }
    // permission flags
    val locked = new SignatureStore(tmpDir(), allowSave = false,
      allowLoad = false, allowRead = false, allowWrite = false)
    intercept[IllegalArgumentException] { locked.save(sig, "{}") }
    intercept[IllegalArgumentException] { locked.load(sig) }
    intercept[IllegalArgumentException] { locked.read(sig, "f.bin") }
    intercept[IllegalArgumentException] { locked.write(sig, "f.bin", Array[Byte](1)) }
  }

  test("snapshots mode routes storage to the snapshots directory") {
    val data = tmpDir(); val snaps = tmpDir()
    val sig = Signature("example://snap")
    new SignatureStore(data, Some(snaps), snapshots = true).save(sig, "{}")
    assert(Files.exists(java.nio.file.Paths.get(snaps, sig.hashDecimal, "data.json")))
    assert(!Files.exists(java.nio.file.Paths.get(data, sig.hashDecimal, "data.json")))
  }

  test("exportResources: cache rows land in signature directories and read back signature-addressed") {
    // a small resource-cache frame in the engine's parquet schema
    // shape: the bridge writes each row's model dump as data.json
    // under Signature(uri, data_hash, sigType)
    val cache = Seq(
      ("api.test/search?q=a", """{"q":"a"}""", 200, """{"items":[1,2]}"""),
      ("api.test/search?q=b", """{"q":"b"}""", 404, "")).toDF(
      "uri", "data_hash", "status", "response_body")
    val dir = tmpDir()
    val store = new SignatureStore(dir)
    assert(store.exportResources(cache, sigType = Some("httpresource")) === 2L)
    val sigA = Signature("api.test/search?q=a", """{"q":"a"}""",
      Some("httpresource"))
    val loaded = store.load(sigA).get
    // the dump is CPython-parseable JSON carrying the row's columns
    val node = graft.core.PyJson.tryParse(loaded).get
    assert(node.get("uri").asText === "api.test/search?q=a")
    assert(node.get("status").asInt === 200)
    assert(node.get("response_body").get("items").size === 2)
    // a signature with different data hashes into a DIFFERENT directory
    val sigB = Signature("api.test/search?q=b", """{"q":"b"}""",
      Some("httpresource"))
    assert(sigA.hashDecimal !== sigB.hashDecimal)
    assert(store.load(sigB).isDefined)
  }
}
