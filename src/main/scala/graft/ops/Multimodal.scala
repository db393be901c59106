package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and per-batch feature extraction
  * runs as `mapPartitions` over the media frame (the Scala analogue of
  * `mapInPandas` batch UDFs — same schema/batching/partitioning shape).
  *
  * DECODE IS STUBBED: real image/audio codecs are not available in this
  * environment, so [[StubDecoder]] derives deterministic fake features
  * from the bytes (length, hash-derived dimensions). The Spark-side
  * plumbing — schema, partition sizing, batch iteration, UDF signature —
  * is real and tested; swap [[Decoder]] for a codec-backed one in
  * production.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StringType, nullable = true))) // JSON metadata

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Batch decode interface — one partition's rows stream through. */
  trait Decoder extends Serializable {
    def decode(mediaId: Long, kind: String, bytes: Array[Byte]): Row
  }

  /** STUB: deterministic fake decode (no codec libraries in this
    * container). Dimensions/duration derive from the payload hash; the
    * "feature" is an 8-dim byte histogram — so downstream operators
    * (similarity, dedup) are exercised with stable values. */
  class StubDecoder extends Decoder {
    def decode(mediaId: Long, kind: String, bytes: Array[Byte]): Row = {
      val payload = if (bytes == null) Array.empty[Byte] else bytes
      val sha = graft.core.Hashing.sha256Hex(payload)
      val h = java.lang.Long.parseLong(sha.take(12), 16)
      val (w, ht, dur) = kind match {
        case "image" => ((h % 1920 + 1).toInt, ((h >> 16) % 1080 + 1).toInt, null)
        case "audio" => (null, null, java.lang.Long.valueOf(h % 600000))
        case "video" => ((h % 1920 + 1).toInt, ((h >> 16) % 1080 + 1).toInt,
          java.lang.Long.valueOf(h % 600000))
        case _ => (null, null, null)
      }
      val hist = new Array[Float](8)
      payload.foreach(b => hist((b & 0xFF) / 32) += 1f)
      val norm = math.max(1, payload.length).toFloat
      Row(mediaId, kind, payload.length.toLong, sha,
        w, ht, dur, hist.map(_ / norm).toSeq)
    }
  }

  /** Codec-backed image decode using the JDK's `javax.imageio` — the
    * real-decoder counterpart of [[StubDecoder]] for the formats the
    * JDK ships (PNG, JPEG, GIF, BMP; the reference opens images with
    * Pillow, resources/http/files.py:179-191). Reads ONLY the header
    * for dimensions (no pixel decode): `ImageReader.getWidth/getHeight`
    * on a stream-backed reader, so a 50 MB JPEG costs a few KB of I/O.
    * The byte histogram feature stays payload-based (cheap, codec-free);
    * audio/video delegate to `fallback` (no JDK codecs for those).
    * Undecodable image bytes yield null dimensions rather than failing
    * the batch. */
  class ImageIoDecoder(fallback: Decoder = new StubDecoder) extends Decoder {
    def decode(mediaId: Long, kind: String, bytes: Array[Byte]): Row = {
      if (kind != "image") return fallback.decode(mediaId, kind, bytes)
      val payload = if (bytes == null) Array.empty[Byte] else bytes
      val sha = graft.core.Hashing.sha256Hex(payload)
      val dims: Option[(Int, Int)] = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              Some((reader.getWidth(0), reader.getHeight(0)))
            } finally reader.dispose()
          } else None
        } catch {
          case _: Exception => None
        } finally if (iis != null) iis.close()
      }
      val hist = new Array[Float](8)
      payload.foreach(b => hist((b & 0xFF) / 32) += 1f)
      val norm = math.max(1, payload.length).toFloat
      Row(mediaId, kind, payload.length.toLong, sha,
        dims.map(_._1).map(Integer.valueOf).orNull,
        dims.map(_._2).map(Integer.valueOf).orNull,
        null, hist.map(_ / norm).toSeq)
    }
  }

  /** Feature extraction over the media frame: mapPartitions batch
    * decode. Partition count is capped so each decode batch fits decoder
    * memory (the `maxPartitionBytes` knob of the binary path). */
  def extractFeatures(media: DataFrame, decoder: Decoder = new StubDecoder,
                      partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val src = if (partitions > 0) media.repartition(partitions) else media
    val rdd = src.select("media_id", "kind", "bytes").rdd.mapPartitions { it =>
      it.map { row =>
        decoder.decode(row.getLong(0), row.getString(1), row.getAs[Array[Byte]](2))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Image resize — the standard multimodal preprocessing pass before
    * feature extraction: decode with `javax.imageio` (PNG/JPEG/GIF/BMP
    * — the JDK's codecs; a REAL pixel decode, unlike the header-only
    * dimension read in [[ImageIoDecoder]]), scale to fit
    * (maxWidth, maxHeight) preserving aspect ratio — never upscales —
    * with bilinear interpolation, re-encode PNG. Non-image rows and
    * already-fitting or undecodable images pass through unchanged with
    * `resized = false`. Same mapPartitions batch shape as
    * [[extractFeatures]]: partitions stream row-at-a-time, so executor
    * memory holds one decoded frame per core, not a batch of them.
    * Output: (media_id, kind, bytes, width, height, resized). */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("resized", BooleanType, nullable = false)))

  def resizeImages(media: DataFrame, maxWidth: Int, maxHeight: Int,
                   partitions: Int = 0): DataFrame = {
    require(maxWidth > 0 && maxHeight > 0, "bounds must be positive")
    val spark = media.sparkSession
    val src = if (partitions > 0) media.repartition(partitions) else media
    val rdd = src.select("media_id", "kind", "bytes").rdd.mapPartitions { it =>
      it.map { row =>
        val (id, kind) = (row.getLong(0), row.getString(1))
        val bytes = row.getAs[Array[Byte]](2)
        def passthrough(w: Integer, h: Integer) = Row(id, kind, bytes, w, h, false)
        if (kind != "image" || bytes == null) passthrough(null, null)
        else {
          val decoded =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          decoded match {
            case None => passthrough(null, null) // undecodable: keep the bytes
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              val scale = math.min(1.0,
                math.min(maxWidth.toDouble / w, maxHeight.toDouble / h))
              if (scale >= 1.0) passthrough(w, h)
              else {
                val nw = math.max(1, math.round(w * scale).toInt)
                val nh = math.max(1, math.round(h * scale).toInt)
                // ARGB target: transparent regions of RGBA/palette
                // sources survive the PNG re-encode (an RGB target
                // composites them over black — silent corruption for
                // web-crawled media)
                val out = new java.awt.image.BufferedImage(nw, nh,
                  java.awt.image.BufferedImage.TYPE_INT_ARGB)
                val g = out.createGraphics()
                try {
                  g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, nw, nh, null)
                } finally g.dispose()
                val buf = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", buf)
                Row(id, kind, buf.toByteArray, Integer.valueOf(nw), Integer.valueOf(nh), true)
              }
          }
        }
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  /** Synthesize a media frame from the documents table (test/bench
    * harness: text bytes stand in for binary payloads). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      to_json(struct(col("lang"), col("source"))).as("meta"))

  /** Deterministic frame sampling for video: every `stride`-th frame
    * index up to the (stub-decoded) duration at `fps`. Shows the
    * explode-shaped plumbing a real frame sampler uses. */
  def sampleFrames(features: DataFrame, fps: Int = 1, stride: Int = 10): DataFrame =
    features.filter(col("kind") === "video")
      .withColumn("n_frames",
        greatest((col("duration_ms") / 1000 * fps).cast("int"), lit(1)))
      .withColumn("frame_ix", explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_ix"),
        (col("frame_ix") * 1000L / fps).as("ts_ms"))
}
