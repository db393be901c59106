package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import graft.core.{Hashing, PyJson, TextUtils}

/** Shell command execution as a resource source (reference: datagrowth/
  * resources/shell/generic.py:21-389): a command template with `{}`
  * slots + flag mapping, cached by `(uri, stdin)` where the uri is the
  * argv sorted after the program name (shell/generic.py:371-386), stdout
  * /stderr UTF-8-decoded and NUL-stripped. In Spark the run kernel is
  * `mapPartitions` over a commands frame with bounded concurrency —
  * same shape as the HTTP fetch kernel.
  */
object Shell {

  val schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("stdin", StringType, nullable = false),
    StructField("cmd", ArrayType(StringType), nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("stdout", StringType, nullable = true),
    StructField("stderr", StringType, nullable = true),
    StructField("from_cache", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = true)))

  /** `CMD_TEMPLATE` fill + `FLAGS` kwargs→flags (shell/generic.py:
    * 192-226): `{}` slots take args in order; flags append as
    * `--flag=value` sorted by flag name. */
  def buildCommand(template: Seq[String], args: Seq[String],
                   flags: Map[String, String] = Map.empty): Seq[String] = {
    var remaining = args
    val filled = template.map {
      case "{}" if remaining.nonEmpty =>
        val a = remaining.head; remaining = remaining.tail; a
      case part => part
    }
    filled ++ flags.toSeq.sortBy(_._1).map { case (f, v) => s"$f=$v" }
  }

  /** One local execution (executor-side). stdout/stderr are drained
    * on BACKGROUND threads while the main thread owns the timeout:
    * a blocking `readAllBytes()` before `waitFor` would (a) never
    * reach the timeout on a command that hangs without closing
    * stdout, and (b) deadlock mutually with the child once either
    * pipe fills at ~64KB (child blocked writing stderr, JVM blocked
    * reading stdout — or the stdin write blocking against a child
    * already blocked on output). On timeout the process is killed
    * and whatever the drains collected is returned with status 1. */
  def runOne(cmd: Seq[String], stdin: String, timeoutSeconds: Int = 60): (Int, String, String) = {
    val pb = new ProcessBuilder(cmd.asJava)
    val proc = pb.start()
    def drain(in: java.io.InputStream): java.util.concurrent.FutureTask[Array[Byte]] = {
      val t = new java.util.concurrent.FutureTask(
        new java.util.concurrent.Callable[Array[Byte]] {
          def call(): Array[Byte] =
            try in.readAllBytes() catch { case _: java.io.IOException => Array.empty }
        })
      val th = new Thread(t, "graft-shell-drain")
      th.setDaemon(true)
      th.start()
      t
    }
    val outF = drain(proc.getInputStream)
    val errF = drain(proc.getErrorStream)
    try {
      if (stdin != null && stdin.nonEmpty)
        proc.getOutputStream.write(stdin.getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () /* child closed stdin early */ }
    finally { try proc.getOutputStream.close() catch { case _: java.io.IOException => () } }
    val finished = proc.waitFor(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
    val status = if (finished) proc.exitValue() else { proc.destroyForcibly(); 1 }
    // after exit/kill the pipes hit EOF, so the drains terminate; the
    // short get() bound is a belt against a pathological FS
    def got(f: java.util.concurrent.FutureTask[Array[Byte]]): Array[Byte] =
      try f.get(10, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: Exception => Array.empty }
    (status, TextUtils.cleanOutput(got(outF)), TextUtils.cleanOutput(got(errF)))
  }

  /** The cache-aware run operator — mirrors Resources.fetchWithCache
    * with the shell cache key (uri = sorted argv, data_hash = stdin). */
  def runWithCache(commands: DataFrame, cache: DataFrame,
                   cacheOnly: Boolean = false, maxConcurrency: Int = 8,
                   timeoutSeconds: Int = 60,
                   broadcastCache: Boolean = true): DataFrame = {
    val spark = commands.sparkSession
    val uriUdf = udf { (cmd: scala.collection.Seq[String]) => Hashing.uriFromCmd(cmd.toSeq) }
    val keyed = commands
      .withColumn("uri", uriUdf(col("cmd")))
      .withColumn("stdin", coalesce(col("stdin"), lit("")))
    val liveCache = cache.filter(col("status") === 0)
      .select(col("uri"), col("stdin"), col("status").as("c_status"),
        col("stdout").as("c_stdout"), col("stderr").as("c_stderr"),
        col("created_at").as("c_created"))
      .dropDuplicates("uri", "stdin")
    // broadcastCache=false for caches past broadcast size — the
    // fetchWithCache knob, mirrored (the shell cache is the same
    // grow-forever append log)
    val joined = keyed.join(
      if (broadcastCache) broadcast(liveCache) else liveCache,
      Seq("uri", "stdin"), "left_outer")
    val hits = joined.filter(col("c_status").isNotNull)
      .select(col("uri"), col("stdin"), col("cmd"), col("c_status").as("status"),
        col("c_stdout").as("stdout"), col("c_stderr").as("stderr"),
        lit(true).as("from_cache"), col("c_created").as("created_at"))
    val misses = joined.filter(col("c_status").isNull).select("uri", "stdin", "cmd")
    val ran: DataFrame =
      if (cacheOnly)
        misses.select(col("uri"), col("stdin"), col("cmd"), lit(1).as("status"),
          lit(null).cast(StringType).as("stdout"), lit(null).cast(StringType).as("stderr"),
          lit(false).as("from_cache"), current_timestamp().as("created_at"))
      else {
        val parts = math.max(1, math.min(maxConcurrency, spark.sparkContext.defaultParallelism))
        val rdd = misses.repartition(parts).rdd.mapPartitions { it =>
          it.map { row =>
            val cmd = row.getSeq[String](row.fieldIndex("cmd"))
            val stdin = row.getAs[String]("stdin")
            val (status, out, err) =
              try runOne(cmd, stdin, timeoutSeconds)
              catch { case e: Exception => (1, "", e.getMessage) }
            Row(row.getAs[String]("uri"), stdin, cmd, status, out, err, false,
              new java.sql.Timestamp(System.currentTimeMillis()))
          }
        }
        spark.createDataFrame(rdd, schema)
      }
    hits.unionByName(ran)
  }

  /** Tika-style JSON post-processing (tika.py:44-56): first document of
    * the `-J` output + the input path stamped in. */
  def tikaContent(stdoutJson: String, inputPath: String): String = {
    PyJson.tryParse(stdoutJson) match {
      case Some(arr) if arr.isArray && arr.size > 0 =>
        val doc = arr.get(0).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        doc.put("resourcePath", inputPath)
        PyJson.dumps(doc, itemSep = ",", kvSep = ":", ensureAscii = false)
      case _ => null
    }
  }
}
