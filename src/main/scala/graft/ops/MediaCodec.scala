package graft.ops

/** The INJECTABLE media-decode contract — the [[graft.sources]]
  * `Fetcher` move applied to media: every perceptual operator
  * (image/audio/video dedup, scene segmentation, soundtrack pairing)
  * consumes decoded PIXELS and PCM through this interface, never a
  * container format directly, so a production decoder (FFmpeg/JNI
  * bindings for H.264+AAC — the bulk of a real crawl, no codec
  * library ships in this sandbox) drops in WITHOUT touching any
  * operator: implement four methods, pass the instance, done. The
  * hashing stays the engine's (dHash bit construction, envelope
  * windows) — a codec supplies raster and samples, nothing else.
  *
  * Contract rules every implementation must keep:
  *  - undecodable/corrupt/truncated payloads yield None (or skip the
  *    unreadable FRAME inside a video) — never throw: one bad row
  *    must cost its own identity, not the job;
  *  - frames arrive in PRESENTATION order (scene walks depend on it);
  *  - audio is mono 16-bit PCM with its true sample rate (the
  *    windowed fingerprints frame 10 ms of wall clock at that rate);
  *  - implementations are Serializable and thread-safe per instance
  *    (they run inside task-side UDF closures).
  *
  * [[MediaCodec.Default]] is the sandbox's [[ContainerCodec]]: real
  * ISO-BMFF box walk + Motion-JPEG/raw-plane video frames
  * ([[VideoHash.mdatPayloads]]), real RIFF/WAVE PCM
  * ([[AudioHash.pcmSamplesWithRate]]), real PNG/JPEG/GIF/BMP stills
  * ([[ImageHash.decodeBounded]]). The equivalence spec (MultimodalSpec)
  * runs the whole perceptual family through a fake NON-RIFF/non-BMFF
  * codec and pins identical pair sets — the proof that operator
  * semantics do not depend on the default containers.
  */
trait MediaCodec extends Serializable {

  /** Decode one still image to a grayscale plane. None when the
    * payload does not decode. */
  def imagePixels(bytes: Array[Byte]): Option[MediaCodec.GrayFrame]

  /** Decode a video payload to its frames' grayscale planes, in
    * presentation order. None when the CONTAINER does not parse;
    * individually unreadable frames are skipped (a corrupt frame
    * costs its hash, not the video's identity). */
  def videoFrames(bytes: Array[Byte]): Option[Seq[MediaCodec.GrayFrame]]

  /** Decode an audio payload to (mono 16-bit PCM, sample rate in Hz).
    * None when it does not decode. */
  def audioPcm(bytes: Array[Byte]): Option[(Array[Short], Int)]

  /** Decode the embedded audio track of a VIDEO payload to
    * (mono 16-bit PCM, sample rate). None when the container has no
    * decodable audio track. */
  def soundtrackPcm(bytes: Array[Byte]): Option[(Array[Short], Int)]
}

object MediaCodec {

  /** One decoded frame/still: a row-major grayscale plane with values
    * 0–255. Width × height are the DECODED dimensions — operators
    * box-downscale to their own grid ([[grayDHash]]), so codecs never
    * need to resize. */
  final case class GrayFrame(pixels: Array[Int], width: Int, height: Int) {
    require(width > 0 && height > 0 && pixels.length >= width * height,
      s"gray plane needs $width x $height pixels, got ${pixels.length}")
  }

  /** The engine's 64-bit perceptual hash of a decoded gray plane —
    * ONE definition shared by stills, video frames and keyframes
    * ([[ImageHash.dHash64]]'s bit construction): box-downscale to
    * 9×8 ([[ImageHash.boxDownscale]] — identity when already 9×8),
    * bit y·8+x set iff pixel (x+1, y) is strictly brighter. Keeping
    * this OUT of the codec is the point of the contract: two codecs
    * decoding the same content hash identically. */
  def grayDHash(frame: GrayFrame): Long = {
    val g =
      if (frame.width == 9 && frame.height == 8) frame.pixels
      else ImageHash.boxDownscale(frame.pixels, frame.width, frame.height, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** The sandbox's default codec (see [[ContainerCodec]]). */
  val Default: MediaCodec = new ContainerCodec
}

/** The default [[MediaCodec]]: the real decoders this sandbox can
  * ship. Stills: ImageIO (PNG/JPEG/GIF/BMP) behind the
  * decompression-bomb guard ([[ImageHash.decodeBounded]]). Video: the
  * ISO-BMFF box walk ([[VideoHash.mdatPayloads]] — 32/64-bit/to-EOF
  * sizes, fragmented moof/mdat containers), frames as Motion-JPEG
  * (real encoded frames, per-frame resync on corruption) or raw 9×8
  * gray planes (the deterministic fixture stand-in). Audio: the
  * RIFF/WAVE chunk walk ([[AudioHash.pcmSamplesWithRate]]).
  * Soundtracks: the first RIFF/WAVE mdat of the box walk (the
  * mdat-per-track contract). Inter-frame codecs (H.264/AAC) are
  * exactly what a production implementation replaces here. */
class ContainerCodec extends MediaCodec {
  def imagePixels(bytes: Array[Byte]): Option[MediaCodec.GrayFrame] =
    ContainerCodec.imagePixels(bytes)
  def videoFrames(bytes: Array[Byte]): Option[Seq[MediaCodec.GrayFrame]] =
    ContainerCodec.videoFrames(bytes)
  def audioPcm(bytes: Array[Byte]): Option[(Array[Short], Int)] =
    AudioHash.pcmSamplesWithRate(bytes)
  def soundtrackPcm(bytes: Array[Byte]): Option[(Array[Short], Int)] =
    ContainerCodec.soundtrackPcm(bytes)
}

object ContainerCodec {
  import MediaCodec.GrayFrame

  def imagePixels(bytes: Array[Byte]): Option[GrayFrame] =
    try {
      ImageHash.decodeBounded(bytes, ImageHash.MaxPixels).map { img =>
        GrayFrame(ImageHash.grayPlane(img), img.getWidth, img.getHeight)
      }
    } catch { case _: Exception => None }

  def videoFrames(bytes: Array[Byte]): Option[Seq[GrayFrame]] =
    try {
      VideoHash.mdatPayload(bytes).map { payload =>
        if (VideoHash.isJpegStream(payload)) jpegFrames(payload)
        else (0 until payload.length / VideoHash.FrameBytes).map { f =>
          val plane = new Array[Int](VideoHash.FrameBytes)
          var i = 0
          while (i < VideoHash.FrameBytes) {
            plane(i) = payload(f * VideoHash.FrameBytes + i) & 0xFF
            i += 1
          }
          GrayFrame(plane, 9, 8)
        }
      }
    } catch { case _: Exception => None }

  /** Motion-JPEG stream → decoded frames, with an in-walk RESYNC: a
    * corrupt or padded frame costs ITS raster, not every later
    * frame's (`start` strictly advances, so the walk terminates). */
  private[ops] def jpegFrames(payload: Array[Byte]): Seq[GrayFrame] = {
    val out = scala.collection.mutable.ArrayBuffer[GrayFrame]()
    var start = 0
    while (start + 1 < payload.length) {
      val end = VideoHash.jpegFrameEnd(payload, start)
      if (end < 0) {
        // resync from start+1, not start+2: a SINGLE pad byte before
        // the next frame puts its SOI at start+1, and skipping two
        // would silently lose that whole well-formed frame (the
        // "padding must not discard the rest of the stream" contract);
        // +1 still guarantees progress, and an SOI cannot begin at
        // `start` itself or jpegFrameEnd would not have failed there
        var j = start + 1
        while (j + 1 < payload.length &&
               !(payload(j) == 0xFF.toByte && payload(j + 1) == 0xD8.toByte)) j += 1
        if (j + 1 >= payload.length) return out.toSeq
        start = j
      } else {
        imagePixels(java.util.Arrays.copyOfRange(payload, start, end))
          .foreach(out += _)
        start = end
      }
    }
    out.toSeq
  }

  def soundtrackPcm(bytes: Array[Byte]): Option[(Array[Short], Int)] =
    try VideoHash.mdatPayloads(bytes).find(AudioHash.isRiffWave)
      .flatMap(AudioHash.pcmSamplesWithRate)
    catch { case _: Exception => None }
}
