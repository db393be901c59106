package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Canonical cache-key functions. These must be byte-identical to the
  * reference's Python implementations or cache fixtures never hit
  * (reference: datagrowth/resources/http/generic.py:630-669,
  * datagrowth/resources/shell/generic.py:371-386,
  * datagrowth/signatures.py:68-89).
  */
object Hashing {

  private def hex(digest: Array[Byte]): String =
    digest.map(b => f"$b%02x").mkString

  def sha1Hex(s: String): String =
    hex(MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8")))

  def sha256Hex(s: String): String =
    hex(MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")))

  def sha256Hex(b: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(b))

  def md5Hex(s: String): String =
    hex(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))

  /** `HttpResource.hash_from_data` (generic.py:644-669): top-level dict →
    * list of (key, value) pairs, nested dict values replaced by their own
    * recursive hash, pairs sorted by key, `json.dumps` with DEFAULT
    * separators (", ", ": ") and ensure_ascii=True, then SHA-1 hex.
    * Empty/missing data → "".
    */
  def hashFromData(json: String): String = {
    if (json == null || json.isEmpty) return ""
    val node = PyJson.tryParse(json).orNull
    node match {
      case o: ObjectNode if o.size > 0 => hashFromDict(o)
      case _ => "" // Python falsy: {} / null / unparseable → ""
    }
  }

  private def hashFromDict(o: ObjectNode): String = {
    val mapper = PyJson.mapper
    val payload: Seq[(String, JsonNode)] = o.fields.asScala.map { e =>
      e.getValue match {
        case nested: ObjectNode => (e.getKey, TextNode.valueOf(hashFromDict(nested)): JsonNode)
        case v => (e.getKey, v)
      }
    }.toSeq.sortBy(_._1)
    val arr = mapper.createArrayNode()
    payload.foreach { case (k, v) =>
      val pair = mapper.createArrayNode()
      pair.add(TextNode.valueOf(k)); pair.add(v)
      arr.add(pair)
    }
    sha1Hex(PyJson.dumps(arr)) // default separators, ensure_ascii=True
  }

  /** `Signature._canonicalize_data` + `_compute_hash`
    * (signatures.py:68-89): bytes → {"__type__","sha256","length"} stub;
    * canonical JSON = sort_keys, separators (",",":"), ensure_ascii=False;
    * SHA-256. The reference converts the hex digest to a Python int; we
    * keep the hex string (equivalent key, no 256-bit int type needed).
    */
  def signatureHash(uri: String, dataJson: String): String = {
    val mapper = PyJson.mapper
    val root = mapper.createObjectNode()
    val data: JsonNode =
      if (dataJson == null || dataJson.isEmpty) mapper.createObjectNode()
      else PyJson.tryParse(dataJson).getOrElse(TextNode.valueOf(dataJson))
    root.set[JsonNode]("uri", TextNode.valueOf(uri))
    root.set[JsonNode]("data", data)
    sha256Hex(PyJson.canonical(root))
  }

  /** `HttpResource.uri_from_url` (generic.py:630-642): collapse duplicate
    * query keys (URLObject `.query.dict` keeps the LAST value per key),
    * sort params by key, re-join, strip the scheme. Values are kept as
    * given (inputs are already URL-encoded URLs).
    */
  def uriFromUrl(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    val afterScheme = if (schemeEnd >= 0) url.substring(schemeEnd + 3) else url
    val qIx = afterScheme.indexOf('?')
    if (qIx < 0) return afterScheme
    val base = afterScheme.substring(0, qIx)
    val fragIx = afterScheme.indexOf('#')
    val query =
      if (fragIx > qIx) afterScheme.substring(qIx + 1, fragIx)
      else afterScheme.substring(qIx + 1)
    val params = scala.collection.mutable.LinkedHashMap[String, String]()
    query.split("&").filter(_.nonEmpty).foreach { p =>
      val eq = p.indexOf('=')
      if (eq < 0) params(p) = "" else params(p.substring(0, eq)) = p.substring(eq + 1)
    }
    val enc = params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
    if (enc.isEmpty) base else s"$base?${enc.mkString("&")}"
  }

  /** `ShellResource.uri_from_cmd` (shell/generic.py:371-386): keep argv[0],
    * sort the remaining arguments, join with spaces. */
  def uriFromCmd(cmd: Seq[String]): String =
    if (cmd == null || cmd.isEmpty) ""
    else (cmd.head +: cmd.tail.sorted).mkString(" ")
}
