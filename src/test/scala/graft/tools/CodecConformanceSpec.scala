package graft.tools

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaCodec

/** The codec certification kit (tools/CodecConformance.scala): the
  * default codec certifies from a clean export, the CHECKED-IN kit is
  * bit-reproducible, tampered goldens are detected, and a codec that
  * cannot decode the containers fails loudly (no Spark session — the
  * kit runs on a bare JVM, as an external adapter would run it). */
class CodecConformanceSpec extends AnyFunSuite {

  test("default codec passes a clean export end-to-end") {
    val dir = Files.createTempDirectory("codec-kit").toString
    val rows = CodecConformance.export(dir)
    assert(rows.length >= 20, "the kit must cover all four methods + rejections")
    assert(rows.map(_.kind).toSet === Set("image", "video", "audio", "soundtrack"))
    assert(rows.count(_.expect == "none") >= 6,
      "rejection + no-audio-track rows are part of the contract")
    assert(CodecConformance.certify(dir, MediaCodec.Default).isEmpty)
  }

  test("checked-in kit is current: re-export reproduces manifest bit-for-bit") {
    // guards drift: if fixtures or hash constructions change, the
    // committed conformance/ dir must be re-exported in the same commit
    val checkedIn = Paths.get("conformance/manifest.tsv")
    assume(Files.exists(checkedIn), "checked-in kit present")
    val dir = Files.createTempDirectory("codec-kit").toString
    CodecConformance.export(dir)
    val fresh = new String(Files.readAllBytes(Paths.get(dir, "manifest.tsv")))
    val committed = new String(Files.readAllBytes(checkedIn))
    assert(fresh === committed,
      "conformance/ is stale — rerun CodecConformance export conformance")
    assert(CodecConformance.certify("conformance", MediaCodec.Default).isEmpty)
  }

  test("a tampered golden is detected") {
    val dir = Files.createTempDirectory("codec-kit").toString
    CodecConformance.export(dir)
    val m = Paths.get(dir, "manifest.tsv")
    val lines = new String(Files.readAllBytes(m)).split("\n")
    val ix = lines.indexWhere(l => l.contains("dhash="))
    val tampered = lines.updated(ix,
      lines(ix).replaceAll("dhash=-?\\d+", "dhash=42")).mkString("", "\n", "\n")
    Files.write(m, tampered.getBytes)
    val failures = CodecConformance.certify(dir, MediaCodec.Default)
    assert(failures.length === 1)
    assert(failures.head._1.expect === "dhash=42")
  }

  test("a codec that cannot decode the kit's containers fails every non-reject row") {
    val dir = Files.createTempDirectory("codec-kit").toString
    val rows = CodecConformance.export(dir)
    val blind = new MediaCodec {
      def imagePixels(b: Array[Byte]) = None
      def videoFrames(b: Array[Byte]) = None
      def audioPcm(b: Array[Byte]) = None
      def soundtrackPcm(b: Array[Byte]) = None
    }
    val failures = CodecConformance.certify(dir, blind)
    val expectedFailures = rows.count(_.expect != "none")
    assert(failures.length === expectedFailures,
      "every decodable vector must fail; rejection rows still pass (None is correct there)")
  }
}
