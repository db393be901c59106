package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the perceptual-hash kernels — pure JVM, no Spark
  * session: the dHash pipeline's exactness laws over RANDOM images (the
  * specs pin the arithmetic fixtures; these pin the invariants the
  * oracle's whole design leans on for arbitrary pixel data). */
object PerceptualProperties extends Properties("graft.ops.perceptual") {

  private val pixelGen = Gen.choose(0, 255)
  private def grayImage(w: Int, h: Int, px: Seq[Int]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    img
  }
  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }
  private def planeHash(px: Seq[Int]): Long = {
    var h = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (px(y * 9 + x + 1) > px(y * 9 + x)) h |= 1L << (y * 8 + x)
    h
  }

  private val imageGen = Gen.listOfN(72, pixelGen)

  // PNG encode → ImageIO decode → raster read is LOSSLESS for 8-bit
  // gray, and at 9×8 the box downscale is identity — so dHash64 of the
  // encoded image equals the direct bit computation on the raw pixels,
  // for ANY image, not just the oracle fixtures
  property("dHash64(png) == direct plane bits for random 9x8 gray images") =
    forAll(imageGen) { px =>
      ImageHash.dHash64(png(grayImage(9, 8, px))).contains(planeHash(px))
    }

  // pixel-doubling invariance: the box filter averages each k×k
  // constant block back to its value, so any integer upscale of a 9×8
  // image hashes identically — the re-encoded-thumbnail law
  property("dHash64 is invariant under integer pixel doubling") =
    forAll(imageGen, Gen.choose(2, 4)) { (px, k) =>
      val big = grayImage(9 * k, 8 * k,
        for (y <- 0 until 8 * k; x <- 0 until 9 * k)
          yield px((y / k) * 9 + (x / k)))
      ImageHash.dHash64(png(big)) == ImageHash.dHash64(png(grayImage(9, 8, px)))
    }

  // a constant image has no brighter-than neighbor anywhere
  property("constant images hash to zero") =
    forAll(pixelGen) { v =>
      ImageHash.dHash64(png(grayImage(9, 8, Seq.fill(72)(v)))).contains(0L)
    }

  // ---- audio envelope ------------------------------------------------

  private val ampGen = Gen.choose(0, 8000)

  // the envelope of frame-constant PCM IS the per-frame amplitude, so
  // the fingerprint equals the direct comparison bits for ANY 65
  // amplitudes — the law the q132 oracle is built on
  property("envelopeHash64(wav) == direct amplitude bits for random frame-constant PCM") =
    forAll(Gen.listOfN(65, ampGen)) { amps =>
      val pcm = new Array[Byte](65 * 160 * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      amps.foreach(a => (0 until 160).foreach(_ => bb.putShort(a.toShort)))
      var expect = 0L
      for (k <- 0 until 64) if (amps(k + 1) > amps(k)) expect |= 1L << k
      AudioHash.envelopeHash64(Multimodal.wavBytes(pcm)).contains(expect)
    }

  // amplitude sign-invariance: the envelope is mean |sample|
  property("envelope is sign-invariant (|x| law)") =
    forAll(Gen.listOfN(65, ampGen)) { amps =>
      def wav(sign: Int): Array[Byte] = {
        val pcm = new Array[Byte](65 * 160 * 2)
        val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        amps.foreach(a => (0 until 160).foreach(_ => bb.putShort((sign * a).toShort)))
        Multimodal.wavBytes(pcm)
      }
      AudioHash.envelopeHash64(wav(1)) == AudioHash.envelopeHash64(wav(-1))
    }

  // ---- video frame walk ------------------------------------------------

  // the mdat walk + plane hashing reproduces per-frame plane bits for
  // random frame stacks — the q134 container law
  property("frameDHashes(mp4) == per-plane bits for random frame stacks") =
    forAll(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n * 72, pixelGen))) { px =>
      val payload = px.map(_.toByte).toArray
      val got = VideoHash.frameDHashes(
        Multimodal.mp4Bytes(payload, 1000L, 16, 16))
      val expect = (0 until px.length / 72).map { f =>
        planeHash(px.slice(f * 72, (f + 1) * 72))
      }
      got.contains(expect)
    }
}
