package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio near-duplication: a 64-bit energy-envelope
  * fingerprint over REAL PCM decode — the audio member of the
  * perceptual-dedup family ([[ImageHash]] is the image member; both
  * feed the shared [[Dedup.hammingNearDupPairs]] Hamming-ball
  * machinery). A re-encoded, re-normalized or lightly-trimmed copy of
  * a recording keeps its loudness CONTOUR even when every byte
  * changes, so the fingerprint is the direction of envelope change:
  * split the waveform into 65 equal frames, take the integer mean
  * absolute amplitude of each, and set bit k iff frame k+1 is louder
  * than frame k — the exact dHash construction with "brighter" read as
  * "louder". (A production fingerprint adds a spectral axis —
  * chromaprint-style; the envelope variant is the deterministic,
  * codec-free core that exercises the same decode→frame→bits→block
  * pipeline and is exactly replayable by a SQL oracle, the q130
  * convention.)
  *
  * Scale shape: identical to image hashing — one UDF projection per
  * corpus for the fingerprint (decode parallelism = frame
  * partitioning), one (block, key) shuffle for candidates, in-bucket
  * verification. Nothing quadratic in the corpus.
  */
object AudioHash {

  /** 16-bit mono PCM samples AND the declared sample rate from a WAV
    * container (the RIFF walk of [[Multimodal.parseWavDurationMs]],
    * but extracting the fmt rate and the data chunk); None when the
    * bytes are not a mono 16-bit PCM WAV — undecodable rows pass
    * through as null fingerprints, the family convention. The rate is
    * what makes TIME-fixed framing possible downstream
    * ([[windowHashes]]' resample-invariant 10 ms grid). */
  def pcmSamplesWithRate(bytes: Array[Byte]): Option[(Array[Short], Int)] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = 0
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && (rate == 0 || data.isEmpty)) {
      val id = ascii(pos)
      val size = bb.getInt(pos + 4)
      // bounds math in LONG: a positive chunk size near Int.MaxValue
      // would wrap pos + 8 + size negative in Int, pass this check and
      // walk pos negative — the RIFF walk must yield a null
      // fingerprint on corrupt containers, never crash the job
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(pos + 8)
        val channels = bb.getShort(pos + 10)
        val bits = bb.getShort(pos + 22)
        if (audioFormat != 1 || channels != 1 || bits != 16) return None
        rate = bb.getInt(pos + 12)
        if (rate <= 0) return None
      } else if (id == "data") data = Some((pos + 8, size))
      pos += 8 + size + (size & 1)
    }
    (if (rate > 0) data else None).map { case (off, len) =>
      val n = len / 2
      val out = new Array[Short](n)
      // bulk view copy, not a per-sample getShort loop: the absolute
      // getShort pays bounds + byte-order dispatch per sample, and the
      // decode runs once per corpus row (r16, the q141 decode kernel —
      // JDK buffer views bulk-copy with one range check)
      java.nio.ByteBuffer.wrap(bytes, off, len)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().get(out, 0, n)
      (out, rate)
    }
  }

  /** [[pcmSamplesWithRate]] without the rate. */
  def pcmSamples(bytes: Array[Byte]): Option[Array[Short]] =
    pcmSamplesWithRate(bytes).map(_._1)

  /** Integer mean absolute amplitude per frame: frame f covers samples
    * [f·n/frames, (f+1)·n/frames) (boxes forced non-empty — the
    * [[ImageHash.boxDownscale]] partition), floor division. Exact when
    * n is a multiple of `frames` and each frame is constant — what the
    * oracle fixtures arrange. */
  def envelope(samples: Array[Short], frames: Int): Array[Long] = {
    val n = samples.length
    val out = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      // Long math: f*n overflows Int beyond ~33.5M samples (a ~35 min
      // 16 kHz recording) and a negative s0 would crash the whole job
      // on one long file instead of fingerprinting it
      val s0 = (f.toLong * n / frames).toInt
      val s1 = math.max(s0 + 1, ((f + 1).toLong * n / frames).toInt)
      var acc = 0L
      var i = s0
      // abs in INT (a Short's abs always fits), widen once on the add:
      // the per-sample Long abs was the hot instruction of the decode
      // stage (r16)
      while (i < s1 && i < n) { acc += math.abs(samples(i).toInt); i += 1 }
      out(f) = if (s1 > s0 && s0 < n) acc / (math.min(s1, n) - s0) else 0L
      f += 1
    }
    out
  }

  /** 64-bit envelope fingerprint of a WAV payload; None when the bytes
    * do not decode. Bit k = frame k+1 strictly louder than frame k,
    * packed LSB-first — byte-identical construction to
    * [[ImageHash.dHash64]] with 65 frames in place of 9 columns. */
  def envelopeHash64(bytes: Array[Byte],
                     codec: MediaCodec = MediaCodec.Default): Option[Long] =
    // decode through the INJECTABLE codec ([[MediaCodec]] — RIFF/WAVE
    // by default), hash through the engine's one envelope
    // construction. Catch-all belt to the walk's Long-math
    // suspenders: any residual malformed-container surprise yields
    // None, never a failed job.
    try codec.audioPcm(bytes).map(_._1).flatMap(envelopeHashOfPcm)
    catch { case _: Exception => None }

  /** The PCM-level core of [[envelopeHash64]] — codec-independent, so
    * two codecs decoding the same samples hash identically. */
  def envelopeHashOfPcm(samples: Array[Short]): Option[Long] =
    if (samples.length < 65) None
    else Some {
      val e = envelope(samples, 65)
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (e(k + 1) > e(k)) hash |= 1L << k
        k += 1
      }
      hash
    }

  /** [[envelopeHash64]] as a column function — a UDF for the same
    * reason as [[ImageHash.dHashUdf]]: decode is irreducibly JVM work
    * and a projection keeps the scan codegen-fused. */
  val envelopeHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    envelopeHashUdfWith(MediaCodec.Default)

  /** [[envelopeHashUdf]] over an injected codec. */
  def envelopeHashUdfWith(codec: MediaCodec)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => envelopeHash64(bytes, codec))

  /** Fingerprints over a media frame: (media_id, ahash), null for
    * undecodable payloads. */
  def fingerprintFrame(media: DataFrame, idCol: String = "media_id",
                       bytesCol: String = "bytes", partitions: Int = 0,
                       codec: MediaCodec = MediaCodec.Default): DataFrame = {
    val src = if (partitions > 0) media.repartition(partitions) else media
    src.select(col(idCol).cast("long").as("media_id"),
      envelopeHashUdfWith(codec)(col(bytesCol)).as("ahash"))
  }

  /** Near-duplicate recordings from a (media_id, ahash) frame — the
    * shared 16-bit-block machinery, exact for Hamming ≤ 3. */
  def nearDupPairs(hashes: DataFrame, maxDistance: Int = 3,
                   maxBucketSize: Int = 0): DataFrame =
    Dedup.hammingNearDupPairs(hashes.filter(col("ahash").isNotNull),
      "media_id", "ahash", maxDistance, maxBucketSize)

  /** One-call form: fingerprint, then pair — checkpointing the skinny
    * hash frame for the same project-collapse reason as
    * [[ImageHash.nearDuplicates]] (the block keys would clone the
    * decode UDF ~5×). */
  def nearDuplicates(media: DataFrame, idCol: String = "media_id",
                     bytesCol: String = "bytes", maxDistance: Int = 3,
                     maxBucketSize: Int = 0,
                     codec: MediaCodec = MediaCodec.Default): DataFrame =
    nearDupPairs(
      graft.core.Materialize.frame(
        fingerprintFrame(media, idCol, bytesCol, codec = codec)),
      maxDistance, maxBucketSize)

  // ---- Time-shift-robust WINDOWED fingerprints ---------------------
  // The whole-file envelope hash spans the entire recording, so a
  // 5%-trimmed copy shifts every frame boundary and is missed. The
  // windowed variant fingerprints FIXED-DURATION frames — 10 ms at
  // the container's declared rate (rate/100 samples, so the grid is
  // the same wall-clock grid at EVERY rate) — and emits one 64-bit
  // hash per hop-1 window of 65 consecutive frames: a recording's
  // identity becomes its SET of window hashes, a copy trimmed by any
  // whole number of frames keeps every interior window hash intact
  // (the video frame-set design with a window in place of a frame),
  // and a RESAMPLED copy frames the same 10 ms intervals, so its
  // means — and hashes — survive (q143; trims finer than one frame —
  // 10 ms — remain out of contract). Near-dup = exact set Jaccard via
  // the shared kernel ([[Dedup.setJaccardPairs]]). Scale: a 1-minute
  // file emits ~5.9k window hashes (one per 10 ms hop) — the
  // winnowing-fingerprint order of magnitude, bounded by the hot-hash
  // cap downstream.

  /** Integer mean absolute amplitude over fixed-length frames
    * (`frameSamples` each, COMPLETE frames only — the tail remainder
    * is dropped, so a trim by k whole frames shifts the frame grid by
    * exactly k). */
  def frameEnvelope(samples: Array[Short], frameSamples: Int): Array[Long] = {
    val nf = samples.length / frameSamples
    val out = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var i = f * frameSamples
      val end = i + frameSamples
      while (i < end) { acc += math.abs(samples(i).toInt); i += 1 }
      out(f) = acc / frameSamples
      f += 1
    }
    out
  }

  /** [[frameEnvelope]] on the exact 10 ms grid of a given rate: frame
    * j covers samples [⌊j·rate/100⌋, ⌊(j+1)·rate/100⌋) — CUMULATIVE
    * boundaries, not a truncated fixed size, because a truncated
    * rate/100 drifts off the wall clock for rates not divisible by
    * 100 (11025 Hz: 110 vs the true 110.25 samples — a full frame of
    * drift every ~4.4 s, which would zero the hash overlap of longer
    * recordings and silently break the resample contract). For
    * rate % 100 == 0 this is bit-identical to
    * `frameEnvelope(samples, rate/100)`. COMPLETE frames only, like
    * the fixed-grid form. */
  def frameEnvelopeAtRate(samples: Array[Short], rate: Int): Array[Long] = {
    // complete frames: the largest m with ⌊m·rate/100⌋ ≤ n, i.e.
    // ⌊(100(n+1)−1)/rate⌋ — NOT ⌊100n/rate⌋, which undercounts when
    // the last boundary lands on n by flooring (rate 150, n = 4:
    // frames end at 1, 3, 4 — three complete frames, not two)
    val nf = ((100L * (samples.length + 1L) - 1L) / rate).toInt
    val out = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      val s0 = (f.toLong * rate / 100L).toInt
      val s1 = ((f + 1).toLong * rate / 100L).toInt
      var acc = 0L
      var i = s0
      while (i < s1) { acc += math.abs(samples(i).toInt); i += 1 }
      out(f) = if (s1 > s0) acc / (s1 - s0) else 0L
      f += 1
    }
    out
  }

  /** Windowed fingerprints of a WAV payload: one 64-bit hash per hop-1
    * position — bit k of the window at frame p compares frames p+k+1
    * vs p+k (the [[envelopeHash64]] construction, windowed).
    *
    * Framing is TIME-fixed by default (`frameSamples` = 0): a frame
    * is 10 ms at the container's DECLARED rate, on CUMULATIVE
    * boundaries ⌊j·rate/100⌋ ([[frameEnvelopeAtRate]] — exact at
    * every rate, including 11025/22050 Hz, where a truncated rate/100
    * grid drifts a full frame every few seconds), so a resampled copy
    * frames the same wall-clock intervals and its per-frame means —
    * and therefore its window hashes — survive (ideal resampling maps
    * constant 10 ms segments to constant 10 ms segments; real
    * resampler ringing perturbs boundary samples, ~1 part in rate/100
    * of a frame mean, which only matters when two neighboring frames
    * are near-equal — within the set-Jaccard threshold's tolerance).
    * Rates below 100 Hz reject (no full 10 ms frame). Pass
    * `frameSamples` > 0 to pin a fixed sample grid (the pre-round-12
    * behavior: 160 samples = 10 ms at 16 kHz ONLY).
    *
    * MIGRATION: window-hash INDEXES published under the old fixed-160
    * default from non-16 kHz recordings hash differently now — a
    * re-submitted copy would sail through such a gate as novel.
    * Re-publish those stores (16 kHz-only corpora — every fixture and
    * store shipped here — are bit-identical, no action needed).
    * None when the bytes do not decode or are shorter than one
    * window. */
  def windowHashes(bytes: Array[Byte], frameSamples: Int = 0,
                   windowFrames: Int = 65,
                   codec: MediaCodec = MediaCodec.Default): Option[Seq[Long]] = {
    validateWindowParams(frameSamples, windowFrames)
    try codec.audioPcm(bytes).flatMap { case (samples, rate) =>
      windowHashesOfPcm(samples, rate, frameSamples, windowFrames)
    } catch { case _: Exception => None } // corrupt containers → None (requires sit OUTSIDE the try)
  }

  private def validateWindowParams(frameSamples: Int, windowFrames: Int): Unit = {
    // 64 bits hold at most 64 comparisons; a larger window would wrap
    // the shift mod 64 and silently alias bits — refuse loudly
    require(windowFrames >= 2 && windowFrames <= 65,
      s"windowFrames must be in [2, 65], got $windowFrames")
    require(frameSamples >= 0,
      s"frameSamples must be >= 0 (0 = 10 ms at the declared rate), got $frameSamples")
  }

  /** The PCM-level core of [[windowHashes]] — codec-independent, so
    * two codecs decoding the same samples fingerprint identically
    * (the [[envelopeHashOfPcm]] doctrine, windowed). */
  def windowHashesOfPcm(samples: Array[Short], rate: Int,
                        frameSamples: Int = 0,
                        windowFrames: Int = 65): Option[Seq[Long]] = {
    validateWindowParams(frameSamples, windowFrames)
    if (frameSamples <= 0 && rate < 100) None
    else {
      val env =
        if (frameSamples > 0) frameEnvelope(samples, frameSamples)
        else frameEnvelopeAtRate(samples, rate)
      val w = windowFrames
      val nw = env.length - w + 1
      if (nw <= 0) None
      else {
        // ROLLING hash (r16): hop-1 windows share w−2 of their w−1 bit
        // comparisons, so window p+1 = (window p >>> 1) | newest bit at
        // position w−2 — O(1) per window instead of O(w), and the
        // output is a primitive Array wrapped unboxed (the old
        // per-window Vector boxed every Long). Bit-identical to the
        // direct form: bit k of window p is env(p+k+1) > env(p+k).
        val out = new Array[Long](nw)
        var hash = 0L
        var k = 0
        while (k < w - 1) {
          if (env(k + 1) > env(k)) hash |= 1L << k
          k += 1
        }
        out(0) = hash
        var p = 1
        while (p < nw) {
          hash >>>= 1
          if (env(p + w - 1) > env(p + w - 2)) hash |= 1L << (w - 2)
          out(p) = hash
          p += 1
        }
        Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }
  }

  /** The CONSTRUCTION TAG a published window-hash store should carry
    * ([[graft.sources.FrameSetIndexStore]]'s `contentTag`): framing
    * and window width pin the fingerprint identity, so a gate run
    * against an index built under a different framing — the exact
    * fail-open the round-12 MIGRATION note could only document —
    * refuses loudly instead of silently missing dups. `t10ms` is the
    * time-fixed default; `s<N>` the fixed-sample legacy framing
    * (pre-round-12 stores are `audio-window:s160:w65`). */
  def windowFramingTag(frameSamples: Int = 0, windowFrames: Int = 65): String = {
    val framing = if (frameSamples <= 0) "t10ms" else s"s$frameSamples"
    s"audio-window:$framing:w$windowFrames"
  }

  /** [[windowHashes]] as a column UDF (default framing). */
  val windowHashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    windowHashesUdfWith(MediaCodec.Default)

  /** [[windowHashesUdf]] over an injected codec (default framing). */
  def windowHashesUdfWith(codec: MediaCodec)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => windowHashes(bytes, codec = codec))

  /** Exploded per-window hash frame: (media_id, whash) DISTINCT — set
    * semantics, the [[VideoHash.frameHashFrame]] shape. Undecodable
    * or shorter-than-one-window recordings drop out. */
  def windowHashFrame(media: DataFrame, idCol: String = "media_id",
                      bytesCol: String = "bytes",
                      codec: MediaCodec = MediaCodec.Default): DataFrame =
    // no isNotNull filter: explode (non-outer) already drops null
    // arrays, and a deterministic-UDF predicate would be pushed below
    // the projection — running decode + windowing TWICE per row
    // ([[VideoHash.frameHashFrame]]'s rationale)
    // per-row array_distinct, not a corpus-wide distinct() (r15, the
    // invertedIndex doctrine): duplicate window hashes can only arise
    // WITHIN one file's hash array (media_id is one-row-per-file by
    // the callers' construction), so set semantics are a per-row
    // operation and the dedup exchange — AQE-coalesced to one task at
    // bench scale — disappears from the plan.
    media.select(col(idCol).cast("long").as("media_id"),
        explode(array_distinct(windowHashesUdfWith(codec)(col(bytesCol)))).as("whash"))

  /** Near-duplicate recordings from a distinct (media_id, whash)
    * frame — the shared set-Jaccard kernel. Output (id_a, id_b,
    * n_shared, jaccard), id_a < id_b. */
  def windowedNearDupPairs(windowHashes: DataFrame, threshold: Double = 0.85,
                           maxHashFreq: Int = 1000): DataFrame =
    Dedup.setJaccardPairs(windowHashes, "media_id", "whash",
      threshold, maxHashFreq)

  /** One-call trim-robust form over a media frame. Complements (does
    * not replace) the whole-file [[nearDuplicates]] gate: the 64-bit
    * whole-file hash stays the cheap published-index screen; this is
    * the recall path for trimmed/clipped copies. */
  def nearDuplicatesWindowed(media: DataFrame, idCol: String = "media_id",
                             bytesCol: String = "bytes",
                             threshold: Double = 0.85,
                             maxHashFreq: Int = 1000,
                             codec: MediaCodec = MediaCodec.Default): DataFrame =
    windowedNearDupPairs(windowHashFrame(media, idCol, bytesCol, codec),
      threshold, maxHashFreq)

  /** RIFF/WAVE sniff — the audio-track marker of the mdat-per-track
    * container contract ([[VideoHash.mdatPayload]]): a video
    * container's audio track travels as a complete RIFF/WAVE payload
    * in its own mdat, so the box walk can route tracks by sniffing
    * each mdat's leading bytes (no sample tables needed). */
  def isRiffWave(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  /** The embedded audio TRACK of a video container: the first
    * RIFF/WAVE mdat payload of the box walk
    * ([[VideoHash.mdatPayloads]]) — a complete WAV, so every audio
    * operator downstream ([[pcmSamples]], [[windowHashes]]) consumes
    * it unchanged. None when the container has no audio track (or
    * does not parse) — the undecodable-rows contract. */
  def soundtrack(bytes: Array[Byte]): Option[Array[Byte]] =
    try VideoHash.mdatPayloads(bytes).find(isRiffWave)
    catch { case _: Exception => None }

  /** Windowed fingerprints of a video's SOUNDTRACK (default framing)
    * as a column UDF — null when no audio track decodes. */
  val soundtrackWindowHashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    soundtrackWindowHashesUdfWith(MediaCodec.Default)

  /** [[soundtrackWindowHashesUdf]] over an injected codec: the track
    * extraction is the codec's ([[MediaCodec.soundtrackPcm]]), the
    * fingerprint arithmetic the engine's — so the extracted track and
    * a standalone recording of the same audio hash identically BY
    * CONSTRUCTION, whatever containers either travelled in. */
  def soundtrackWindowHashesUdfWith(codec: MediaCodec)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) =>
      try codec.soundtrackPcm(bytes).flatMap { case (samples, rate) =>
        windowHashesOfPcm(samples, rate)
      } catch { case _: Exception => None })

  /** Exploded per-window soundtrack hash frame of a VIDEO corpus:
    * (media_id, whash) DISTINCT — the [[windowHashFrame]] shape with
    * the track extraction fused into the decode UDF (one container
    * read per row; non-outer explode drops trackless videos). */
  def soundtrackWindowHashFrame(videos: DataFrame, idCol: String = "media_id",
                                bytesCol: String = "bytes",
                                codec: MediaCodec = MediaCodec.Default): DataFrame =
    // per-row array_distinct — see [[windowHashFrame]]'s note (r15)
    videos.select(col(idCol).cast("long").as("media_id"),
        explode(array_distinct(soundtrackWindowHashesUdfWith(codec)(col(bytesCol)))).as("whash"))

  /** CROSS-modality audio near-dup: which standalone recordings are
    * (trim-robustly) the soundtrack of which videos — the
    * [[graft.ops.MediaDedup.imageVideoPairs]] story for SOUND, run
    * before admitting recordings into a corpus that already ingested
    * video (or vice versa). Both sides fingerprint through the SAME
    * windowed-hash arithmetic ([[windowHashes]] — the extracted track
    * IS a WAV), so the pairing is the shared cross-side set-Jaccard
    * kernel ([[Dedup.setJaccardAcross]]), robust to whole-frame trims
    * by the hop-1 window construction.
    *
    * Output: (video_id, audio_id, n_shared, jaccard), jaccard ≥
    * `threshold`. Scale shape: one decode projection per side, ONE
    * shuffle on the window-hash key with the hot-hash cap, pair
    * aggregation bounded by real collisions — nothing quadratic. */
  def soundtrackNearDupPairs(videos: DataFrame, recordings: DataFrame,
                             idCol: String = "media_id",
                             bytesCol: String = "bytes",
                             threshold: Double = 0.85,
                             maxHashFreq: Int = 1000,
                             codec: MediaCodec = MediaCodec.Default): DataFrame =
    Dedup.setJaccardAcross(
        soundtrackWindowHashFrame(videos, idCol, bytesCol, codec),
        windowHashFrame(recordings, idCol, bytesCol, codec),
        "media_id", "whash", threshold, maxHashFreq)
      .select(col("left_id").as("video_id"), col("right_id").as("audio_id"),
        col("n_shared"), col("jaccard"))

  // ---- Deterministic PCM fixtures (test/oracle harness) ------------
  // 65 frames of 160 constant-amplitude samples each: the frame mean
  // IS the amplitude, so the fingerprint is pure integer arithmetic in
  // (doc_id, frame) and DuckDB replays WAV encode -> RIFF walk -> PCM
  // read -> envelope -> bit packing without touching a byte of audio.

  val FixtureFrames = 65
  val FixtureSamplesPerFrame = 160 // 10 ms at 16 kHz

  /** Fixture amplitude of frame f for a document id — coprime-moduli
    * CUBIC mixing folded mod a small prime so consecutive-frame
    * comparisons wrap many times across 65 frames (a quadratic mod a
    * large range produced near-monotone envelopes whose bits were
    * mostly 1s — hundreds of accidental ≤3-bit collisions; measured
    * zero cross pairs with this form at 5k recordings). The ×31 scale
    * makes values amplitude-like without touching any comparison.
    * `perturb` re-levels one id-chosen frame by half the modulus — a
    * copy whose fingerprint differs in at most 2 bits. */
  def fixtureAmp(id: Long, f: Int, perturb: Boolean): Int = {
    val a = (id % 97 + 1).toInt
    val b = (id % 89 + 2).toInt
    val c = (id / 97 % 101).toInt
    val base = (a * f * f + b * f * f * f + c * f) % 251
    val v = if (perturb && f == (id % FixtureFrames).toInt) (base + 125) % 251 else base
    v * 31
  }

  /** Encode the fixture as a real 16 kHz mono 16-bit PCM WAV. */
  def fixtureWav(id: Long, perturb: Boolean = false): Array[Byte] = {
    // constant-amplitude frames synthesize as Arrays.fill spans + ONE
    // bulk short→byte copy (r16): the per-sample relative putShort paid
    // bounds + order dispatch ~20k times per row on the fixture side of
    // every audio query
    val n = FixtureFrames * FixtureSamplesPerFrame
    val s = new Array[Short](n)
    var f = 0
    while (f < FixtureFrames) {
      java.util.Arrays.fill(s, f * FixtureSamplesPerFrame,
        (f + 1) * FixtureSamplesPerFrame, fixtureAmp(id, f, perturb).toShort)
      f += 1
    }
    Multimodal.wavBytes(pcmBytes(s))
  }

  /** Little-endian byte rendering of a PCM short array — one bulk view
    * copy, shared by the fixture synthesizers. */
  private def pcmBytes(s: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](s.length * 2)
    java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(s)
    pcm
  }

  /** The fixture as a column UDF (id, perturb) → WAV bytes. */
  val fixtureWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, perturb: Boolean) => fixtureWav(id, perturb))

  /** WINDOWED-fingerprint fixture: a 128-frame recording (frame j at
    * amplitude [[fixtureAmp]](id, j + trimFrames)) — `trimFrames`
    * > 0 models a copy whose first k frames were cut, shifting the
    * whole frame grid. Validated at 5 k recordings: zero within-file
    * duplicate windows, zero accidental cross pairs, planted Jaccard
    * = (64−k)/64 ≥ 0.875 for k ≤ 8. */
  val WindowFixtureFrames = 128

  def fixtureWavTrimmed(id: Long, trimFrames: Int): Array[Byte] =
    fixtureWavResampled(id, trimFrames, 16000) // 16000/100 == FixtureSamplesPerFrame

  /** The trimmed fixture as a column UDF (id, trimFrames) → WAV. */
  val fixtureWavTrimmedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, trimFrames: Int) => fixtureWavTrimmed(id, trimFrames))

  /** The windowed fixture rendered at an arbitrary sample rate: the
    * SAME per-frame amplitude sequence on the exact 10 ms grid —
    * frame j spans samples [⌊j·rate/100⌋, ⌊(j+1)·rate/100⌋), the
    * [[frameEnvelopeAtRate]] boundaries, so non-multiple-of-100 rates
    * (11025, 22050) render exactly too. This is the IDEAL resample of
    * the 16 kHz fixture (a constant 10 ms segment resamples to a
    * constant 10 ms segment bit-exactly, so the time-fixed window
    * hashes are IDENTICAL; real resampler boundary ringing is the
    * documented contract edge). [[fixtureWavTrimmed]] is this at
    * 16 kHz. */
  def fixtureWavResampled(id: Long, trimFrames: Int, rate: Int): Array[Byte] = {
    require(rate >= 100, s"rate must be at least 100 Hz (one 10 ms frame), got $rate")
    val nf = WindowFixtureFrames - trimFrames
    val totalSamples = (nf.toLong * rate / 100L).toInt
    val s = new Array[Short](totalSamples)
    var j = 0
    while (j < nf) {
      // Arrays.fill spans + one bulk copy — see [[fixtureWav]] (r16)
      java.util.Arrays.fill(s, (j.toLong * rate / 100L).toInt,
        ((j + 1).toLong * rate / 100L).toInt,
        fixtureAmp(id, j + trimFrames, perturb = false).toShort)
      j += 1
    }
    Multimodal.wavBytes(pcmBytes(s), sampleRate = rate)
  }

  /** The resampled fixture as a column UDF (id, trimFrames, rate). */
  val fixtureWavResampledUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long, trimFrames: Int, rate: Int) =>
      fixtureWavResampled(id, trimFrames, rate))
}
