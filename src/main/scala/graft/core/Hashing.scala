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
    // code-point order = Python sorted(); Java's default String order
    // is UTF-16 code-unit order, which sorts a supplementary-plane key
    // BEFORE U+E000..U+FFFF keys (surrogates are low) — a different
    // pair order means a different SHA-1 for the same dict
    }.toSeq.sortBy(_._1)(codePointOrder)
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

  /** Python `unquote` + the '+'-to-space step of `parse_qs` /
    * urlobject's `qs_decode`: runs of valid %XX escapes decode as one
    * UTF-8 byte sequence (malformed bytes → U+FFFD, CPython's
    * errors='replace'); an invalid escape stays literal. */
  private def qsDecode(s: String): String = {
    val plussed = s.replace('+', ' ')
    if (!plussed.contains('%')) return plussed
    val out = new StringBuilder
    val pending = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (pending.size() > 0) {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      out.append(dec.decode(java.nio.ByteBuffer.wrap(pending.toByteArray)))
      pending.reset()
    }
    var i = 0
    while (i < plussed.length) {
      val c = plussed.charAt(i)
      if (c == '%' && i + 2 < plussed.length &&
          Character.digit(plussed.charAt(i + 1), 16) >= 0 &&
          Character.digit(plussed.charAt(i + 2), 16) >= 0) {
        pending.write(Character.digit(plussed.charAt(i + 1), 16) * 16 +
          Character.digit(plussed.charAt(i + 2), 16))
        i += 3
      } else { flush(); out.append(c); i += 1 }
    }
    flush()
    out.toString
  }

  /** Python `quote_plus` with urlencode's default empty safe-set:
    * `[A-Za-z0-9_.~-]` pass, space becomes '+', everything else
    * percent-encodes its UTF-8 bytes uppercase. */
  private def quotePlus(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xFF).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-' || c == '~')
        sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    sb.toString
  }

  /** Python `sorted` compares strings by CODE POINT; Java compareTo by
    * UTF-16 code unit — they disagree once U+E000..U+FFFF keys mix
    * with supplementary-plane keys (surrogates sort low). */
  private[core] val codePointOrder: Ordering[String] = (a: String, b: String) => {
    var i = 0; var j = 0
    var res = 0
    while (res == 0 && i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) res = Integer.compare(ca, cb)
      else { i += Character.charCount(ca); j += Character.charCount(cb) }
    }
    if (res != 0) res else Integer.compare(a.length - i, b.length - j)
  }

  /** `HttpResource.uri_from_url` (generic.py:630-642), urlobject
    * semantics end to end: the fragment splits off FIRST (urlsplit —
    * a '#' before '?' makes the '?' part of the fragment) and is
    * PRESERVED after the query; query params decode
    * ('+'/percent-escapes, `.query.dict`), collapse duplicate keys
    * (last wins), sort by DECODED key (code-point order, like Python
    * sorted), and re-encode via urlencode/quote_plus — so `a%20b` and
    * `a+b` normalize to ONE cache key, the reference's. A key with no
    * '=' carries urlobject's None value, which urlencode prints as
    * the literal "None" (the reference's own quirk, kept for key
    * parity). */
  def uriFromUrl(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    val afterScheme = if (schemeEnd >= 0) url.substring(schemeEnd + 3) else url
    val hashIx = afterScheme.indexOf('#')
    val fragment = if (hashIx >= 0) afterScheme.substring(hashIx + 1) else ""
    val preFrag = if (hashIx >= 0) afterScheme.substring(0, hashIx) else afterScheme
    val qIx = preFrag.indexOf('?')
    val base = if (qIx >= 0) preFrag.substring(0, qIx) else preFrag
    val query = if (qIx >= 0) preFrag.substring(qIx + 1) else ""
    val params = scala.collection.mutable.LinkedHashMap[String, String]()
    query.split("&").filter(_.nonEmpty).foreach { p =>
      val eq = p.indexOf('=')
      if (eq < 0) params(qsDecode(p)) = null
      else params(qsDecode(p.substring(0, eq))) = qsDecode(p.substring(eq + 1))
    }
    val enc = params.toSeq.sortBy(_._1)(codePointOrder).map { case (k, v) =>
      s"${quotePlus(k)}=${if (v == null) "None" else quotePlus(v)}"
    }
    val qs = if (enc.isEmpty) "" else s"?${enc.mkString("&")}"
    val frag = if (fragment.nonEmpty) s"#$fragment" else ""
    s"$base$qs$frag"
  }

  /** `ShellResource.uri_from_cmd` (shell/generic.py:371-386): keep argv[0],
    * sort the remaining arguments, join with spaces. */
  def uriFromCmd(cmd: Seq[String]): String =
    if (cmd == null || cmd.isEmpty) ""
    else (cmd.head +: cmd.tail.sorted).mkString(" ")
}
