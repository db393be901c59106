package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import graft.ops.{AudioHash, ImageHash, MediaCodec, VideoHash}

/** The codec CERTIFICATION KIT: on-disk golden conformance vectors a
  * production [[graft.ops.MediaCodec]] adapter (FFmpeg/JNI H.264+AAC —
  * no codec library ships in this sandbox) validates against WITHOUT
  * running this repo's test suite.
  *
  * A MediaCodec implements four methods — `imagePixels`,
  * `videoFrames`, `audioPcm`, `soundtrackPcm`
  * (`ops/MediaCodec.scala:36-52`) — and is certified here end to end:
  * each vector is a real container payload on disk plus the ENGINE
  * hashes of its decoded content (dHash bits of the gray planes,
  * envelope/window bits of the PCM — `MediaCodec.grayDHash`,
  * `AudioHash.envelopeHashOfPcm` / `windowHashesOfPcm`). Two codecs
  * that decode the same content hash identically, so passing the kit
  * means every perceptual operator, gate, store and streaming sink
  * downstream produces identical results through the adapter.
  *
  * Vectors are LOSSLESS containers only (PNG/BMP/GIF stills, raw-plane
  * and MJPEG-free ISO-BMFF video, RIFF/WAVE PCM): a conformance vector
  * must have ONE correct decode. Lossy formats (JPEG stills, H.264,
  * AAC) are deliberately absent — two conformant decoders may differ
  * by ±1 per sample there, so certification of a lossy path is the
  * adapter's own round-trip test, not a cross-codec golden.
  *
  * Usage (sbt or a bare JVM with the library jar — no Spark session):
  *   runMain graft.tools.CodecConformance export  <dir>
  *   runMain graft.tools.CodecConformance certify <dir> [codecClass]
  * `certify` instantiates `codecClass` by no-arg constructor (default:
  * the built-in [[MediaCodec.Default]]) and exits non-zero on any
  * mismatch. The REJECTION rows are part of the contract: corrupt or
  * alien payloads must decode to None, never throw and never
  * pass-through.
  *
  * The goldens are exported from [[MediaCodec.Default]], whose decode
  * is itself pinned against pure-arithmetic SQL oracles (q28/q29,
  * q130-q145) and the MultimodalSpec alien-codec equivalence suite —
  * the kit transports that certification to adapters outside the
  * repo. */
object CodecConformance {

  /** One conformance row: kind, name, payload file, expectation. */
  final case class Vector(kind: String, name: String, file: String,
                          expect: String)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Expectation string for a payload, computed through `codec` —
    * shared by export (writes it) and certify (recomputes + compares).
    * Formats:
    *   image:      dhash=<long>            | none
    *   video:      frames=<n>;md5=<hex over comma-joined frame dhashes> | none
    *   audio:      rate=<hz>;n=<samples>;env=<long>;win=<hex> | none
    *   soundtrack: rate=<hz>;env=<long>    | none
    */
  def expectation(kind: String, bytes: Array[Byte], codec: MediaCodec): String =
    kind match {
      case "image" =>
        codec.imagePixels(bytes)
          .map(f => s"dhash=${MediaCodec.grayDHash(f)}").getOrElse("none")
      case "video" =>
        codec.videoFrames(bytes).filter(_.nonEmpty).map { frames =>
          val hs = frames.map(MediaCodec.grayDHash)
          s"frames=${hs.length};md5=${md5hex(hs.mkString(","))}"
        }.getOrElse("none")
      case "audio" =>
        codec.audioPcm(bytes).flatMap { case (pcm, rate) =>
          for {
            env <- AudioHash.envelopeHashOfPcm(pcm)
            wins <- AudioHash.windowHashesOfPcm(pcm, rate)
          } yield s"rate=$rate;n=${pcm.length};env=$env;win=${md5hex(wins.mkString(","))}"
        }.getOrElse("none")
      case "soundtrack" =>
        codec.soundtrackPcm(bytes).flatMap { case (pcm, rate) =>
          AudioHash.envelopeHashOfPcm(pcm).map(env => s"rate=$rate;env=$env")
        }.getOrElse("none")
      case other => sys.error(s"unknown vector kind: $other")
    }

  /** The vector set. Payload generators are the repo's deterministic
    * arithmetic fixtures — every byte is a pure function of the id, so
    * re-export reproduces the kit bit-for-bit. */
  def payloads(): Seq[(String, String, Array[Byte])] = {
    def gifBytes(id: Long): Array[Byte] = {
      // the PNG fixture pattern re-encoded lossless through ImageIO
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 9)
        img.getRaster.setSample(x, y, 0, ImageHash.fixtureGray(id, x, y, perturb = false))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", buf)
      buf.toByteArray
    }
    def bmpBytes(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 9)
        img.getRaster.setSample(x, y, 0, ImageHash.fixtureGray(id, x, y, perturb = false))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", buf)
      buf.toByteArray
    }
    val images = (1L to 6L).map(i =>
      ("image", f"png_$i%02d", ImageHash.fixturePng(i))) ++
      Seq(("image", "png_07_perturbed", ImageHash.fixturePng(7L, perturb = true)),
        ("image", "gif_03", gifBytes(3L)),
        ("image", "bmp_04", bmpBytes(4L)))
    val videos = Seq(
      ("video", "mp4_plain_11", VideoHash.fixtureMp4(11L)),
      ("video", "mp4_plain_12_perturbed", VideoHash.fixtureMp4(12L, perturb = true)),
      ("video", "mp4_fragmented_13", VideoHash.fixtureFragmentedMp4(13L, fragments = 4)),
      ("video", "mp4_scenes_14", VideoHash.fixtureSceneMp4(14L)),
      ("video", "mp4_with_audio_15", VideoHash.fixtureMp4WithAudio(15L, audioPid = 21L)))
    val audios = Seq(
      ("audio", "wav_16k_31", AudioHash.fixtureWav(31L)),
      ("audio", "wav_16k_32_perturbed", AudioHash.fixtureWav(32L, perturb = true)),
      ("audio", "wav_trimmed_33", AudioHash.fixtureWavTrimmed(33L, trimFrames = 4)),
      ("audio", "wav_11025hz_34", AudioHash.fixtureWavResampled(34L, 0, 11025)),
      ("audio", "wav_22050hz_35", AudioHash.fixtureWavResampled(35L, 0, 22050)))
    val soundtracks = Seq(
      ("soundtrack", "mp4_audio_track_15", VideoHash.fixtureMp4WithAudio(15L, audioPid = 21L)),
      // a plain video has NO decodable audio track: expect none
      ("soundtrack", "mp4_no_audio_11", VideoHash.fixtureMp4(11L)))
    // rejection rows: corrupt and alien payloads MUST yield none
    val png = ImageHash.fixturePng(5L)
    val wav = AudioHash.fixtureWav(36L)
    val rejects = Seq(
      ("image", "reject_truncated_png", png.take(png.length / 3)),
      ("image", "reject_garbage", Array.tabulate[Byte](64)(i => (i * 37 + 5).toByte)),
      ("video", "reject_wav_as_video", wav),
      ("audio", "reject_png_as_audio", png),
      ("audio", "reject_truncated_wav", wav.take(20)),
      // name must be unique across ALL kinds — payload files are keyed
      // by name alone, and a duplicate silently clobbers the earlier
      // vector's bytes on export (caught in review: an image-rejection
      // vector shipped pointing at this row's payload)
      ("soundtrack", "reject_garbage_soundtrack",
        Array.tabulate[Byte](48)(i => (i * 91 + 3).toByte)))
    images ++ videos ++ audios ++ soundtracks ++ rejects
  }

  def export(dir: String): Seq[Vector] = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val all = payloads()
    require(all.map(_._2).distinct.size == all.size,
      "vector names must be unique — payload files are keyed by name")
    val rows = all.map { case (kind, name, bytes) =>
      val file = s"$name.bin"
      Files.write(root.resolve(file), bytes)
      Vector(kind, name, file, expectation(kind, bytes, MediaCodec.Default))
    }
    val manifest = rows.map(v => s"${v.kind}\t${v.name}\t${v.file}\t${v.expect}")
      .mkString("", "\n", "\n")
    Files.write(root.resolve("manifest.tsv"),
      manifest.getBytes(StandardCharsets.UTF_8))
    rows
  }

  def loadManifest(dir: String): Seq[Vector] =
    new String(Files.readAllBytes(Paths.get(dir).resolve("manifest.tsv")),
      StandardCharsets.UTF_8)
      // tolerate CRLF checkouts: the kit's audience is EXTERNAL
      // adapter authors, and a git autocrlf clone would otherwise
      // fail every vector on an invisible trailing \r in `expect`
      // (.gitattributes pins conformance/* -text as the first line of
      // defense; this is the second)
      .split("\r?\n").toSeq.filter(_.nonEmpty).map { line =>
        line.split("\t") match {
          case Array(kind, name, file, expect) => Vector(kind, name, file, expect)
          case _ => sys.error(s"malformed manifest line: $line")
        }
      }

  /** Certify `codec` against the exported kit. Returns the failures
    * as (vector, got) pairs — empty means certified. */
  def certify(dir: String, codec: MediaCodec): Seq[(Vector, String)] = {
    val root: Path = Paths.get(dir)
    loadManifest(dir).flatMap { v =>
      val bytes = Files.readAllBytes(root.resolve(v.file))
      val got =
        try expectation(v.kind, bytes, codec)
        catch { case e: Exception => s"threw ${e.getClass.getSimpleName}" }
      if (got == v.expect) None else Some((v, got))
    }
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "export" :: dir :: Nil =>
      val rows = export(dir)
      println(s"exported ${rows.length} conformance vectors to $dir")
    case "certify" :: dir :: rest =>
      val codec = rest match {
        case Nil => MediaCodec.Default
        case cls :: Nil => Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[MediaCodec]
        case _ => sys.error("usage: certify <dir> [codecClass]")
      }
      val vectors = loadManifest(dir)
      val failures = certify(dir, codec)
      failures.foreach { case (v, got) =>
        println(s"FAIL ${v.kind}/${v.name}: expected '${v.expect}' got '$got'")
      }
      println(s"${vectors.length - failures.length}/${vectors.length} vectors pass")
      if (failures.nonEmpty) sys.exit(1)
    case _ =>
      System.err.println(
        "usage: CodecConformance export <dir> | certify <dir> [codecClass]")
      sys.exit(2)
  }
}
