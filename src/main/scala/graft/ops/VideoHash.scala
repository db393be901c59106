package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual video near-duplication — the third member of the
  * perceptual-dedup family ([[ImageHash]], [[AudioHash]]): a video's
  * identity is its SET of frame dHashes, and two videos are near-dups
  * when those sets overlap (a re-encoded, re-muxed or lightly-trimmed
  * copy keeps most of its frames' visual content, so their per-frame
  * dHashes — already robust to re-encode/resize — collide exactly).
  * This is the frame-set Jaccard design every video-dedup pipeline
  * uses, expressed over the engine's existing pieces: per-frame dHash
  * ([[ImageHash]] bit construction over a gray plane), shared-hash
  * blocking (the q22 shared-shingle shape with a frame hash in place
  * of a shingle), exact set Jaccard in one groupBy.
  *
  * Frame access: the container walk is REAL (the ISO-BMFF box walk of
  * [[Multimodal.parseMp4]], extended to locate the `mdat` payload),
  * and TWO frame layouts decode: Motion-JPEG (back-to-back JPEG
  * frames in mdat — real encoded frames, ImageIO-decoded through the
  * SAME [[ImageHash.dHash64]] path still images take) and raw 9×8
  * grayscale planes packed back-to-back (the deterministic stand-in
  * the arithmetic fixtures emit). Inter-frame codecs (H.264…) are
  * where a production decoder plugs in at [[frameDHashes]] — no codec
  * libraries ship here; the Spark-side plumbing — explode shape,
  * blocking, Jaccard — is the real, tested artifact, the
  * [[Multimodal.StubDecoder]] doctrine.
  *
  * Scale shape: one UDF projection + explode per corpus (frames ×
  * docs rows, each 16 bytes), ONE shuffle on the frame-hash key for
  * blocking (hot-hash cap against degenerate intros/logos — the q22
  * cap rationale verbatim), pair aggregation bounded by shared-frame
  * count. Nothing quadratic in the corpus.
  */
object VideoHash {

  val FrameBytes = 72 // 9×8 gray plane
  val FixtureFrameCount = 16

  /** dHash of one raw 9×8 grayscale plane (unsigned bytes) — the
    * [[ImageHash.dHash64]] bit construction without the image decode:
    * bit k = y·8+x set iff pixel (x+1, y) is strictly brighter. */
  def planeDHash(plane: Array[Byte]): Long = {
    require(plane.length >= FrameBytes, s"plane needs $FrameBytes bytes")
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((plane(y * 9 + x + 1) & 0xFF) > (plane(y * 9 + x) & 0xFF))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** ALL `mdat` payloads of an ISO-BMFF container in file order — a
    * real box walk (size-prefixed type cells, the
    * [[Multimodal.parseMp4]] layout) that handles the spec's three
    * size encodings: 32-bit size, size == 1 → 64-bit largesize
    * (multi-GB mdats), size == 0 → box extends to end of file (a
    * common mdat shape in practice). FRAGMENTED containers (DASH/CMAF
    * moof/mdat pairs — most delivered web video) surface one payload
    * per fragment; a first-mdat-only read would silently drop every
    * later fragment's frames. The walk is BEST-EFFORT on corruption:
    * a malformed box STOPS the walk but keeps every payload already
    * collected — a truncated download or trailing garbage after a
    * complete mdat (both common in crawls) must not zero the video's
    * identity (the old first-mdat read hashed such files fine; an
    * all-or-nothing walk would be a silent recall regression).
    * Empty when the container is corrupt before any mdat or holds
    * none. */
  def mdatPayloads(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 16) return Nil
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val n = bytes.length.toLong
    var pos = 0L
    while (pos + 8 <= n) {
      // bounds math in LONG: a crafted/corrupt size near Int.MaxValue
      // would wrap pos + size negative in Int, slip past this check and
      // throw inside the UDF — the walk must STOP at corrupt boxes
      // (keeping prior payloads), never crash the job on one bad row
      val size32 = bb.getInt(pos.toInt).toLong & 0xFFFFFFFFL
      var header = 8L
      val size =
        if (size32 == 0L) n - pos // last box: extends to EOF
        else if (size32 == 1L) {  // 64-bit largesize follows the type
          if (pos + 16 > n) return out.toSeq
          header = 16L
          bb.getLong(pos.toInt + 8)
        } else size32
      if (size < header || pos + size > n) return out.toSeq
      if (new String(bytes, pos.toInt + 4, 4, "US-ASCII") == "mdat")
        out += java.util.Arrays.copyOfRange(
          bytes, (pos + header).toInt, (pos + size).toInt)
      pos += size
    }
    out.toSeq
  }

  /** The VIDEO payload of an ISO-BMFF container: the concatenation of
    * every non-audio mdat payload (fragment boundaries sit at sample
    * boundaries, so concatenation restores the contiguous frame
    * stream; RIFF/WAVE mdats are the container contract's audio track
    * — [[AudioHash.soundtrack]] reads those). None when no video mdat
    * exists. */
  def mdatPayload(bytes: Array[Byte]): Option[Array[Byte]] = {
    val parts = mdatPayloads(bytes).filterNot(AudioHash.isRiffWave)
    if (parts.isEmpty) None
    else if (parts.lengthCompare(1) == 0) Some(parts.head)
    else {
      val out = new Array[Byte](parts.iterator.map(_.length).sum)
      var off = 0
      parts.foreach { p =>
        System.arraycopy(p, 0, out, off, p.length); off += p.length
      }
      Some(out)
    }
  }

  /** Per-frame dHashes of a video payload: the video mdat stream
    * located by the box walk ([[mdatPayload]] — fragmented containers
    * concatenate to the same stream, so a 3-fragment copy hashes
    * identically to its single-mdat twin), split into raw 9×8 planes
    * (or walked as Motion-JPEG), each hashed. None when the container
    * does not parse; videos whose stream is not a whole number of
    * frames hash the complete frames only. */
  def frameDHashes(bytes: Array[Byte],
                   codec: MediaCodec = MediaCodec.Default): Option[Seq[Long]] =
    // decode through the INJECTABLE codec ([[MediaCodec]] — the
    // ISO-BMFF/MJPEG/raw-plane [[ContainerCodec]] by default; a
    // production H.264 decoder plugs in here without touching any
    // operator downstream), hash through the engine's one gray-plane
    // construction. Catch-all belt: whatever a malformed container
    // manages to throw, the row yields None (the undecodable-rows
    // contract), never a failed job.
    try codec.videoFrames(bytes).map(_.map(MediaCodec.grayDHash))
    catch { case _: Exception => None }

  /** An mdat payload that is a Motion-JPEG frame stream: the SOI
    * marker opens it AND the first frame survives the real segment
    * walk ([[jpegFrameEnd]]) — the 2-byte sniff alone would misroute a
    * raw-plane payload whose first two pixels happen to be 255,216,
    * silently losing every frame hash; pixel data almost surely fails
    * the walk (the bytes after SOI must parse as marker segments).
    * The residual edge runs the other way and is the cheaper loss: an
    * MJPEG stream whose FIRST frame is corrupt routes raw and hashes
    * noise — wasted rows in a 2^64 hash space, not missed recall on a
    * well-formed stream (the in-walk resync still covers corruption in
    * any LATER frame). */
  def isJpegStream(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 0xFF.toByte &&
      payload(1) == 0xD8.toByte && jpegFrameEnd(payload, 0) >= 0

  /** Per-frame dHashes of a Motion-JPEG mdat payload: frames are
    * back-to-back JPEGs (the real MJPEG-in-BMFF layout), split by a
    * MARKER-AWARE walk — length-prefixed segments (DQT/DHT/APPn/COM…)
    * are SKIPPED by their declared length, because a raw byte scan for
    * FF D9 splits mid-segment whenever a table or comment happens to
    * contain those two bytes (only ENTROPY data escapes 0xFF as FF 00;
    * segment payloads do not). Each frame decodes through the SAME
    * [[ImageHash.dHash64]] path still images take — one hash space, so
    * a real encoded frame and a still of it collide. Frames that fail
    * to decode are skipped; a malformed frame loses only ITSELF — the
    * walk resyncs at the next SOI (bit rot or inter-frame padding must
    * not silently discard the rest of the stream's hashes). */
  def jpegFrameDHashes(payload: Array[Byte]): Seq[Long] =
    // the RESYNC walk lives in [[ContainerCodec.jpegFrames]] (one
    // corrupt or padded frame costs ITS hash, not every later
    // frame's); hashing stays the engine's shared construction
    ContainerCodec.jpegFrames(payload).map(MediaCodec.grayDHash)

  /** End (exclusive) of the JPEG frame starting at `start` (which must
    * be SOI), or -1 on malformed input: a real JPEG segment walk —
    * standalone markers advance 2, length-prefixed segments skip their
    * declared length, SOS enters entropy scanning (FF 00 stuffing and
    * FF D0-D7 restarts skipped; another real marker — progressive SOS,
    * DNL — re-enters the segment walk) until EOI. */
  private[ops] def jpegFrameEnd(b: Array[Byte], start: Int): Int = {
    val n = b.length
    var i = start
    if (i + 1 >= n || b(i) != 0xFF.toByte || b(i + 1) != 0xD8.toByte) return -1
    i += 2
    var inEntropy = false
    while (i < n) {
      if (!inEntropy) {
        if (b(i) != 0xFF.toByte) return -1
        while (i + 1 < n && b(i + 1) == 0xFF.toByte) i += 1 // fill bytes
        if (i + 1 >= n) return -1
        val m = b(i + 1) & 0xFF
        if (m == 0xD9) return i + 2 // EOI
        else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
        else {
          if (i + 3 >= n) return -1
          val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
          if (len < 2 || i + 2 + len > n) return -1
          inEntropy = m == 0xDA // SOS: entropy-coded data follows
          i += 2 + len
        }
      } else {
        if (b(i) != 0xFF.toByte) i += 1
        else if (i + 1 >= n) return -1
        else {
          val m = b(i + 1) & 0xFF
          if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) i += 2 // stuffed FF / restart
          else if (m == 0xFF) i += 1 // fill
          else if (m == 0xD9) return i + 2 // EOI
          else inEntropy = false // real marker (progressive SOS, DNL) — segment walk
        }
      }
    }
    -1
  }

  /** [[frameDHashes]] as a column UDF. */
  val frameDHashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    frameDHashesUdfWith(MediaCodec.Default)

  /** [[frameDHashesUdf]] over an injected codec (the
    * production-decoder plug point). */
  def frameDHashesUdfWith(codec: MediaCodec)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => frameDHashes(bytes, codec))

  /** Exploded per-frame hash frame: (media_id, fhash) DISTINCT — set
    * semantics (a repeated frame counts once, exactly as a repeated
    * shingle does in q22's set Jaccard). Undecodable rows drop out. */
  def frameHashFrame(media: DataFrame, idCol: String = "media_id",
                     bytesCol: String = "bytes",
                     codec: MediaCodec = MediaCodec.Default): DataFrame =
    // no isNotNull filter: explode (non-outer) already drops null
    // arrays, and a deterministic-UDF predicate would be pushed below
    // the projection — running the whole container decode TWICE per
    // row (the q131 project-collapse lesson, filter edition)
    // per-row array_distinct, not a corpus-wide distinct() (r15, the
    // invertedIndex doctrine): duplicate frame hashes can only arise
    // WITHIN one file's frame array (media_id is one-row-per-file by
    // the callers' construction), so the dedup exchange disappears.
    media.select(col(idCol).cast("long").as("media_id"),
        explode(array_distinct(frameDHashesUdfWith(codec)(col(bytesCol)))).as("fhash"))

  /** One scene segment of [[sceneWalk]]: contiguous frames whose
    * consecutive dHash distance stays ≤ the cut threshold. `key_hash`
    * is the FIRST frame's hash — the keyframe a content-aware sampler
    * keeps per scene. */
  case class SceneSeg(scene: Int, start_frame: Int, n_frames: Int,
                      key_hash: Long)

  /** Scene segmentation of an ORDERED frame-hash sequence: a cut
    * opens a new scene wherever consecutive frames' dHash Hamming
    * distance exceeds `threshold` (within a scene the camera barely
    * moves — re-encode-robust hashes drift a bit or two; a cut swaps
    * the whole composition — typically tens of bits). This is the
    * standard dHash scene detector, and it is what makes frame
    * SAMPLING content-aware: one keyframe per scene instead of one
    * frame per N covers every composition without over-sampling
    * static shots. */
  def sceneWalk(hashes: Seq[Long], threshold: Int): Seq[SceneSeg] = {
    if (hashes.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer[SceneSeg]()
    var start = 0
    var i = 1
    while (i <= hashes.length) {
      if (i == hashes.length ||
        java.lang.Long.bitCount(hashes(i - 1) ^ hashes(i)) > threshold) {
        out += SceneSeg(out.length, start, i - start, hashes(start))
        start = i
      }
      i += 1
    }
    out.toSeq
  }

  /** [[sceneWalk]] fused into the container decode — the
    * [[graft.ops.AudioHash.soundtrackWindowHashesUdf]] doctrine: the
    * scene walk is per-video-LOCAL, so fusing it into the (already
    * unavoidable) decode UDF makes the whole operator shuffle-FREE —
    * a lag/running-sum window over exploded frames would shuffle
    * every frame row by media_id for a computation the decoding task
    * already holds in its hand. */
  def sceneSegmentsUdf(threshold: Int,
                       codec: MediaCodec = MediaCodec.Default)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) =>
      frameDHashes(bytes, codec).map(sceneWalk(_, threshold)))

  /** Scene segments of a video corpus: (media_id, scene, start_frame,
    * n_frames, key_hash) — one row per detected scene, frame order
    * preserved inside the decode (never through a DISTINCT set).
    * Undecodable rows drop out (non-outer explode of the null array).
    * Scale shape: ONE UDF projection + explode, no shuffle at all —
    * every scene row is produced by the task that decoded its video. */
  def sceneSegments(media: DataFrame, idCol: String = "media_id",
                    bytesCol: String = "bytes",
                    threshold: Int = 4,
                    codec: MediaCodec = MediaCodec.Default): DataFrame =
    media.select(col(idCol).cast("long").as("media_id"),
        explode(sceneSegmentsUdf(threshold, codec)(col(bytesCol))).as("s"))
      .select(col("media_id"), col("s.scene").as("scene"),
        col("s.start_frame").as("start_frame"),
        col("s.n_frames").as("n_frames"),
        col("s.key_hash").as("key_hash"))

  /** The scene-KEYFRAME set of each video: (media_id, fhash) DISTINCT
    * — a video identity ~4.5× smaller than the full frame set (one
    * hash per scene instead of one per frame, mean 3.5 scenes per
    * 16-frame fixture), with the same robustness inside each scene
    * (the keyframe is a dHash — re-encode drift lands within the
    * Hamming ball; static-shot frames past the first contribute
    * nothing to identity anyway). Published through the SAME
    * (fhash)-bucketed stores and screened by the SAME
    * [[graft.ops.Dedup.frameSetDedupAgainstIndex]] gate as full frame
    * sets — at 100 TB, a 4.5× smaller index is the difference in the
    * probe-join's co-located side. Contract: set Jaccard over
    * keyframes moves per EDITED SCENE ((n−1)/(n+1) for one replaced
    * scene of n), so gate thresholds sit lower than frame-set ones
    * (q145 uses 0.3 against the 2-scene worst case of 1/3). */
  def keyframeSet(media: DataFrame, idCol: String = "media_id",
                  bytesCol: String = "bytes", threshold: Int = 4,
                  codec: MediaCodec = MediaCodec.Default): DataFrame =
    sceneSegments(media, idCol, bytesCol, threshold, codec)
      .select(col("media_id"), col("key_hash").as("fhash")).distinct()

  /** Near-duplicate videos from a distinct (media_id, fhash) frame:
    * shared-hash blocking → per-pair intersection counts → exact set
    * Jaccard ≥ `threshold`. `maxHashFreq` (0 = off) drops frame hashes
    * shared by more than that many videos — the q22 hot-shingle cap:
    * a logo/intro frame shared by f videos contributes f² pair rows,
    * and a hash that common identifies nothing. Output:
    * (id_a, id_b, n_shared, jaccard), id_a < id_b. */
  def nearDupVideos(frameHashes: DataFrame, threshold: Double = 0.8,
                    maxHashFreq: Int = 1000): DataFrame =
    Dedup.setJaccardPairs(frameHashes, "media_id", "fhash", threshold, maxHashFreq)

  /** One-call form over a media frame. */
  def nearDuplicates(media: DataFrame, idCol: String = "media_id",
                     bytesCol: String = "bytes", threshold: Double = 0.8,
                     maxHashFreq: Int = 1000,
                     codec: MediaCodec = MediaCodec.Default): DataFrame =
    nearDupVideos(frameHashFrame(media, idCol, bytesCol, codec),
      threshold, maxHashFreq)

  // ---- Deterministic fixtures (test/oracle harness) -----------------
  // Frame f of video id is the ImageHash pixel fixture at
  // pid = id*131 + f, so every frame hash — and therefore every
  // Jaccard — is integer arithmetic a SQL oracle replays. The perturbed
  // variant replaces one id-chosen frame with pid = id*131 + 777777
  // (131 ∤ 777777−f for f < 131, so a collision with another video's
  // frame needs id' = id + 5937 — outside any test corpus), modeling a
  // copy with one re-edited scene: Jaccard 15/17 ≈ 0.882.

  /** Frame pattern id for (video, frame). */
  def framePid(id: Long, f: Int, perturb: Boolean): Long =
    if (perturb && f == (id % FixtureFrameCount).toInt) id * 131L + 777777L
    else id * 131L + f

  /** The fixture's raw frame stream: 16 back-to-back 9×8 gray planes. */
  private def fixturePayload(id: Long, perturb: Boolean): Array[Byte] = {
    val payload = new Array[Byte](FixtureFrameCount * FrameBytes)
    var f = 0
    while (f < FixtureFrameCount) {
      val pid = framePid(id, f, perturb)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          payload(f * FrameBytes + y * 9 + x) =
            ImageHash.fixtureGray(pid, x, y, perturb = false).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    payload
  }

  /** Encode the fixture as a real ISO-BMFF container: 16 raw 9×8 gray
    * planes in mdat, 40 ms per frame. */
  def fixtureMp4(id: Long, perturb: Boolean = false): Array[Byte] =
    Multimodal.mp4Bytes(fixturePayload(id, perturb), FixtureFrameCount * 40L,
      (id % 1280 + 16).toInt, (id % 720 + 16).toInt)

  /** The fixture as a real FRAGMENTED container — the SAME frames
    * split across `fragments` moof/mdat pairs at frame boundaries
    * ([[Multimodal.fmp4Bytes]]), so its hash set must equal its
    * single-mdat twin's exactly (the multi-mdat walk's contract). */
  def fixtureFragmentedMp4(id: Long, fragments: Int,
                           perturb: Boolean = false): Array[Byte] = {
    require(fragments >= 1 && fragments <= FixtureFrameCount,
      s"fragments must be in [1, $FixtureFrameCount], got $fragments")
    val payload = fixturePayload(id, perturb)
    val per = FixtureFrameCount / fragments
    val parts = (0 until fragments).map { i =>
      val from = i * per * FrameBytes
      val until = if (i == fragments - 1) payload.length
                  else (i + 1) * per * FrameBytes
      java.util.Arrays.copyOfRange(payload, from, until)
    }
    Multimodal.fmp4Bytes(parts, FixtureFrameCount * 40L,
      (id % 1280 + 16).toInt, (id % 720 + 16).toInt)
  }

  /** Scene count planted by [[fixtureSceneMp4]]: 2..5, id-derived. */
  def fixtureSceneCount(id: Long): Int = 2 + (id % 4).toInt

  /** A fixture WITH SCENE STRUCTURE for the q142 segmentation oracle:
    * 16 frames split evenly into [[fixtureSceneCount]] contiguous
    * scenes (frame f belongs to scene f·nScenes/16). Every frame of
    * scene s renders the SAME pattern pid = id·131 + s·29 + 7, except
    * odd frames carry the single-pixel jitter
    * ([[ImageHash.fixtureGray]] perturb — ≤ 2 dHash bits), modeling a
    * static shot under re-encode drift; scene boundaries swap the
    * whole pattern (typically tens of bits). All arithmetic in
    * (id, f) — the SQL oracle replays pixels → bits → hashes →
    * consecutive Hamming → cuts → segments. */
  def fixtureSceneMp4(id: Long, replaceScene: Boolean = false): Array[Byte] = {
    val nScenes = fixtureSceneCount(id)
    val payload = new Array[Byte](FixtureFrameCount * FrameBytes)
    var f = 0
    while (f < FixtureFrameCount) {
      val s = f * nScenes / FixtureFrameCount
      // the one-scene-replaced copy swaps scene id % nScenes for a
      // fresh pattern (+13: 131a + 29b = 13 has no small solution, so
      // the variant pid space cannot collide with any corpus scene)
      val pid = id * 131L + s * 29L + 7L +
        (if (replaceScene && s == (id % nScenes).toInt) 13L else 0L)
      val jitter = f % 2 == 1
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          payload(f * FrameBytes + y * 9 + x) =
            ImageHash.fixtureGray(pid, x, y, perturb = jitter).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    Multimodal.mp4Bytes(payload, FixtureFrameCount * 40L,
      (id % 1280 + 16).toInt, (id % 720 + 16).toInt)
  }

  /** The fixture WITH an embedded audio track: video frames in the
    * first mdat, the soundtrack ([[AudioHash.fixtureWavTrimmed]] at
    * `audioPid`, untrimmed) as a RIFF/WAVE mdat — the mdat-per-track
    * container contract. Frame hashes must equal [[fixtureMp4]]'s
    * (the audio mdat is invisible to the video walk);
    * [[AudioHash.soundtrack]] recovers the WAV byte-identically. */
  def fixtureMp4WithAudio(id: Long, audioPid: Long,
                          perturb: Boolean = false): Array[Byte] =
    Multimodal.fmp4Bytes(
      Seq(fixturePayload(id, perturb), AudioHash.fixtureWavTrimmed(audioPid, 0)),
      FixtureFrameCount * 40L, (id % 1280 + 16).toInt, (id % 720 + 16).toInt)

  /** The fixture as a column UDF (id, perturb) → MP4 bytes. */
  val fixtureMp4Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, perturb: Boolean) => fixtureMp4(id, perturb))

  /** The fragmented fixture as a column UDF (id, fragments, perturb). */
  val fixtureFragmentedMp4Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, fragments: Int, perturb: Boolean) =>
      fixtureFragmentedMp4(id, fragments, perturb))

  /** The audio-track fixture as a column UDF (id, audioPid, perturb). */
  val fixtureMp4WithAudioUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, audioPid: Long, perturb: Boolean) =>
      fixtureMp4WithAudio(id, audioPid, perturb))

  /** The scene-structured fixture as a column UDF (id) → MP4 bytes. */
  val fixtureSceneMp4Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => fixtureSceneMp4(id))

  /** The one-scene-replaced variant as a column UDF (id) → MP4. */
  val fixtureSceneVariantUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => fixtureSceneMp4(id, replaceScene = true))
}
