package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** File-download path handling + mass-request batching (reference:
  * datagrowth/resources/http/files.py:18-204 and http/tasks.py:60-97).
  */
object FileResources {

  /** `HttpFileResource._get_file_info` (files.py:94-119): derive
    * (shardedDir, fileName, extension) from a URL — md5 of the file name
    * shards directories `x/yz/` so listings stay small; extension
    * defaults to .html; names clip at 150 chars (files.py:122-125).
    */
  def fileInfo(url: String, mediaRoot: String = "downloads"): (String, String, String) = {
    val path = url.replaceAll("^[a-z]+://[^/]+", "").takeWhile(_ != '?')
    val head0 = path.split('/').filter(_.nonEmpty).lastOption.getOrElse("")
    val head = if (head0.isEmpty) "index.html" else head0
    val (name, ext0) = head.lastIndexOf('.') match {
      case -1 => (head, "")
      case ix => (head.substring(0, ix), head.substring(ix))
    }
    val extension = if (ext0.isEmpty) ".html" else ext0
    val fileHash = Hashing.md5Hex(name)
    val dir = s"$mediaRoot/${fileHash.charAt(0)}/${fileHash.substring(1, 3)}"
    val clipped = if (name.length > 150) name.substring(0, 150) else name
    (dir, clipped, extension)
  }

  /** Column form for distributed path derivation over a URL column.
    * Null urls map to null paths — one null row must not NPE the task
    * (Spark passes String nulls through to the UDF). */
  def shardedPath(url: Column, mediaRoot: String = "downloads"): Column = {
    val f = udf { (u: String) =>
      if (u == null) null
      else {
        val (dir, name, ext) = fileInfo(u, mediaRoot)
        s"$dir/$name$ext"
      }
    }
    f(url)
  }

  /** `send_mass` concat batching (tasks.py:60-97): group N single-arg
    * requests into one request whose arg is the N ids joined with
    * `symbol` — the distributed form groups by row_number / size and
    * concat_ws's the collected args (SURVEY §2.6). Input: a frame with
    * an `arg` column; output: one row per batch with `args` joined. */
  def concatArgs(requests: DataFrame, size: Int, symbol: String = "|"): DataFrame = {
    // size <= 0 = batching off: the input passes through UNCHANGED
    // (all columns, original order) — reference parity, tasks.py:69-89
    // (`if config.concat_args_size:` falsy sends args_list as-is)
    if (size <= 0) return requests
    // batching is request-count-bounded by contract: collapse the args
    // into ONE sorted array row and slice consecutive batches
    // in-expression — no unpartitioned window, no second shuffle, and
    // batch membership is deterministic (sorted order) by construction
    val nBatches = ceil(array_size(col("__a")).cast("double") / lit(size)).cast("int")
    requests
      .agg(sort_array(collect_list(col("arg"))).as("__a"))
      .filter(array_size(col("__a")) > 0)
      .select(explode(transform(sequence(lit(0), nBatches - 1),
        b => array_join(slice(col("__a"), b * lit(size) + lit(1), lit(size)), symbol))).as("arg"))
  }
}
