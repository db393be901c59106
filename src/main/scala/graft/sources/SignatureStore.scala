package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

/** A resource signature — the storage KEY of the reference's new-style
  * persistence (signatures.py:16-118): `uri` + canonicalized request
  * data hash to a 256-bit integer, and that integer (rendered in
  * DECIMAL, `str(signature.hash)`) names the resource's directory.
  * The hash is [[graft.core.Hashing.signatureHash]] (golden-pinned
  * against CPython); [[hashDecimal]] converts its hex to the decimal
  * string the reference writes on disk — a repo store and a reference
  * store of the same resource use the SAME directory name
  * (SignatureStoreSpec pins one real reference snapshot).
  *
  * `sigType` mirrors `Signature.type` (the per-resource-class
  * subdirectory) with the reference's filesystem-safety validation
  * (signatures.py:53-66): no path separators, no `.`/`..`/empty, only
  * `[A-Za-z0-9_][A-Za-z0-9._-]*`. */
final case class Signature(uri: String, dataJson: String = null,
                           sigType: Option[String] = None) {
  sigType.foreach { t =>
    require(t.nonEmpty && t != "." && t != "..",
      "Signature type must not be empty or a directory navigation token.")
    require(!t.contains("/") && !t.contains("\\"),
      "Signature type must not contain path separators.")
    require(t.matches("^[A-Za-z0-9_][A-Za-z0-9._-]*$"),
      "Signature type contains unsupported characters. Allowed: letters, " +
        "numbers, underscore, dash and dot.")
  }

  /** The 256-bit signature hash in hex ([[graft.core.Hashing]]). */
  lazy val hashHex: String = graft.core.Hashing.signatureHash(uri, dataJson)

  /** `str(signature.hash)` — the decimal directory name the reference
    * writes (its Pydantic model stores the hash as a Python int). */
  lazy val hashDecimal: String = BigInt(hashHex, 16).toString
}

/** Signature-keyed FILESYSTEM resource storage — the reference's
  * `FileSystemStorage` layout (resources/storage/file_system.py:52-123)
  * over the engine's signature hash: each resource lives in
  * `<dataDir>[/<type>]/<decimal-hash>/`, its model dump as `data.json`
  * and any sidecar payloads as flat named files in the same directory.
  * The capability-equivalent DURABLE cache for Spark jobs remains
  * [[CacheStore]]/[[BucketedCacheStore]] (parquet, distributed reads);
  * this store is the LAYOUT-parity artifact — snapshot corpora
  * recorded by the reference load here unchanged, and resources
  * exported here are readable by reference tooling.
  *
  * Permission flags mirror the reference's storage config
  * (`allow_save`/`allow_load`/`allow_read`/`allow_write`): a disabled
  * operation refuses loudly. `snapshots = true` routes storage to
  * `snapshotsDir` (the reference's snapshot-recording mode). Filename
  * guards are the reference's verbatim: relative, non-nested, and
  * never the reserved `data.json`.
  *
  * Scale note: this is DRIVER-side file I/O by design — the reference
  * is a single-node store and the layout exists for tooling parity;
  * [[exportResources]] streams a cache frame through
  * `toLocalIterator` (one partition in memory at a time), and anything
  * corpus-sized belongs in the parquet stores instead. */
class SignatureStore(dataDir: String,
                     snapshotsDir: Option[String] = None,
                     snapshots: Boolean = false,
                     allowSave: Boolean = true,
                     allowLoad: Boolean = true,
                     allowRead: Boolean = true,
                     allowWrite: Boolean = true) {

  private def baseDir: Path =
    Paths.get(if (snapshots) snapshotsDir.getOrElse(dataDir) else dataDir)

  /** `_get_storage_directory` (file_system.py:52-60):
    * base[/type]/str(hash). */
  def storageDirectory(sig: Signature): Path =
    sig.sigType.fold(baseDir)(baseDir.resolve).resolve(sig.hashDecimal)

  private def checkFilename(filename: String, what: String): Unit = {
    val p = Paths.get(filename)
    require(!p.isAbsolute,
      s"Filename must be a relative path in the $what directory.")
    require(p.getNameCount == 1 && p.getFileName.toString == filename,
      s"Nested paths are not allowed in the $what directory.")
    // '.' and '..' are single-name RELATIVE paths, so the guards above
    // pass them: '..' would target the signature directory's PARENT
    // and '.' the directory itself — the sigType validation already
    // rejects both; match it here
    require(filename != "." && filename != "..",
      s"Filename '$filename' is not a valid $what entry.")
    require(filename != "data.json",
      "Filename 'data.json' is reserved for storage save()/load().")
  }

  /** `save` (file_system.py:62-74): persist the resource's model dump
    * as `data.json` under its signature directory. Returns the
    * signature (the reference's return contract). */
  def save(sig: Signature, resourceJson: String): Signature = {
    require(allowSave,
      "Saving resources is disabled by storage config (allow_save=false).")
    val dir = storageDirectory(sig)
    Files.createDirectories(dir)
    Files.write(dir.resolve("data.json"),
      resourceJson.getBytes(StandardCharsets.UTF_8))
    sig
  }

  /** `load` (file_system.py:76-83): the stored `data.json`, or None
    * when the signature was never saved. */
  def load(sig: Signature): Option[String] = {
    require(allowLoad,
      "Loading resources is disabled by storage config (allow_load=false).")
    val p = storageDirectory(sig).resolve("data.json")
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** `read` (file_system.py:85-102): a named sidecar file of the
    * signature directory (reference returns str when UTF-8-decodable;
    * here bytes always — [[readText]] is the decoded view). */
  def read(sig: Signature, filename: String): Array[Byte] = {
    require(allowRead,
      "Reading files is disabled by storage config (allow_read=false).")
    checkFilename(filename, "signature")
    Files.readAllBytes(storageDirectory(sig).resolve(filename))
  }

  /** [[read]] decoded as UTF-8. */
  def readText(sig: Signature, filename: String): String =
    new String(read(sig, filename), StandardCharsets.UTF_8)

  /** `write` (file_system.py:104-122): persist a named sidecar file
    * next to `data.json`; returns the written path. */
  def write(sig: Signature, filename: String, data: Array[Byte]): Path = {
    require(allowWrite,
      "Writing files is disabled by storage config (allow_write=false).")
    checkFilename(filename, "signature")
    val dir = storageDirectory(sig)
    Files.createDirectories(dir)
    Files.write(dir.resolve(filename), data)
  }

  /** [[write]] of UTF-8 text. */
  def writeText(sig: Signature, filename: String, text: String): Path =
    write(sig, filename, text.getBytes(StandardCharsets.UTF_8))

  /** Export a resource-cache frame ([[Resources]] schema: uri,
    * data_hash, response_body, …) into signature directories — the
    * bridge from the engine's parquet cache to the reference's
    * on-disk layout: per row, the resource JSON saves as `data.json`
    * under `Signature(uri, data_hash, sigType)`. Driver-side by
    * contract (see class doc); rows stream via `toLocalIterator`.
    * Returns the number of resources written. */
  def exportResources(cache: DataFrame, sigType: Option[String] = None,
                      uriCol: String = "uri",
                      dataCol: String = "data_hash"): Long = {
    require(allowSave,
      "Saving resources is disabled by storage config (allow_save=false).")
    val cols = cache.columns
    val it = cache.toLocalIterator()
    var n = 0L
    while (it.hasNext) {
      val row = it.next()
      val uri = row.getAs[String](uriCol)
      val dataJson = Option(row.getAs[Any](dataCol)).map(_.toString).orNull
      val sig = Signature(uri, dataJson, sigType)
      // model dump: the row's full column map as one JSON object —
      // CPython-compatible serialization (PyJson) so reference tooling
      // parses it
      val mapper = graft.core.PyJson.mapper
      val obj = mapper.createObjectNode()
      cols.foreach { c =>
        val v = row.getAs[Any](c)
        if (v == null) obj.putNull(c)
        else v match {
          case s: String => graft.core.PyJson.tryParse(s) match {
            case Some(node) if s.startsWith("{") || s.startsWith("[") =>
              obj.set[com.fasterxml.jackson.databind.JsonNode](c, node)
            case _ => obj.put(c, s)
          }
          case i: Int => obj.put(c, i)
          case l: Long => obj.put(c, l)
          case d: Double => obj.put(c, d)
          case b: Boolean => obj.put(c, b)
          case other => obj.put(c, other.toString)
        }
      }
      save(sig, graft.core.PyJson.dumps(obj))
      n += 1
    }
    n
  }
}
