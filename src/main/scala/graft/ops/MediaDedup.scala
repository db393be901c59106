package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The perceptual-dedup FACADE: one call over a mixed media frame
  * (media_id, kind, bytes — the [[Multimodal.mediaSchema]] shape)
  * dispatching each modality to its operator — image dHash
  * ([[ImageHash]]), audio energy envelope ([[AudioHash]]), video
  * frame-set Jaccard ([[VideoHash]]) — and unioning the pair frames
  * under one schema. Pairs are intrinsically WITHIN-kind (a waveform
  * has no Hamming distance to a pixel grid) — EXCEPT image↔video,
  * where both sides hash into the same 64-bit dHash space: the facade
  * ALSO emits kind = "image-video" rows (stills appearing as video
  * frames) from the same single scan, the [[imageVideoPairs]] screen
  * fed by the already-decoded hash frame. Rows that decode under no
  * modality simply surface no pairs, per the family convention.
  *
  * Output: (kind, id_a, id_b, score_type, score) — id_a < id_b for
  * within-kind rows; for kind = "image-video", id_a is the image and
  * id_b the video (independent id spaces). score_type = "hamming"
  * (image/audio/image-video; smaller is closer, exact ≤ `maxDistance`
  * by the 4×16-bit pigeonhole) or "jaccard" (video; larger is closer,
  * ≥ `videoThreshold`).
  *
  * Scale shape: ONE decode projection over the media frame — the
  * three modality hashes are `when`-gated on `kind` inside a single
  * select (CaseWhen evaluates lazily, so each row runs exactly its
  * kind's decode UDF), and the skinny (id, kind, 3 hash columns)
  * result is checkpointed once. The media BYTES are therefore read
  * and decoded exactly once per row no matter how many modalities are
  * present — at 100 TB of mixed media, the two extra corpus scans the
  * per-modality facade cost are the difference (MultimodalSpec pins
  * evaluate-once with an accumulator source). Downstream, each
  * modality's blocking runs over its kind's hash rows only.
  *
  * NOTE the facade is EAGER: the eager `localCheckpoint(true)` that
  * pins the single decode runs the full corpus decode AT CALL TIME,
  * even if the returned pairs are never materialized — callers
  * composing a lazy plan should reach for the per-modality operators
  * instead. */
object MediaDedup {

  def nearDuplicates(media: DataFrame, idCol: String = "media_id",
                     kindCol: String = "kind", bytesCol: String = "bytes",
                     maxDistance: Int = 3, videoThreshold: Double = 0.8,
                     maxBucketSize: Int = 0, maxHashFreq: Int = 1000,
                     codec: MediaCodec = MediaCodec.Default): DataFrame = {
    // one scan, one decode per row: the when-branches are lazy, so a
    // row evaluates only its own kind's UDF; the checkpoint stops
    // project-collapse from cloning the decode into the block keys
    // (the q131 lesson) AND pins the single evaluation of `media`.
    // ONE codec serves all three modalities (the injectable-decode
    // contract — swap in a production H.264/AAC codec here and every
    // downstream stage is untouched).
    val hashed = media.select(
        col(idCol).cast("long").as("media_id"), col(kindCol).as("kind"),
        when(col(kindCol) === "image",
          ImageHash.dHashUdfWith(codec)(col(bytesCol))).as("dhash"),
        when(col(kindCol) === "audio",
          AudioHash.envelopeHashUdfWith(codec)(col(bytesCol))).as("ahash"),
        when(col(kindCol) === "video",
          VideoHash.frameDHashesUdfWith(codec)(col(bytesCol))).as("fh"))
      .localCheckpoint(true)
    val images = ImageHash.nearDupPairs(
        hashed.filter(col("kind") === "image").select(col("media_id"), col("dhash")),
        maxDistance, maxBucketSize)
      .select(lit("image").as("kind"), col("id_a"), col("id_b"),
        lit("hamming").as("score_type"), col("hamming").cast("double").as("score"))
    val audio = AudioHash.nearDupPairs(
        hashed.filter(col("kind") === "audio").select(col("media_id"), col("ahash")),
        maxDistance, maxBucketSize)
      .select(lit("audio").as("kind"), col("id_a"), col("id_b"),
        lit("hamming").as("score_type"), col("hamming").cast("double").as("score"))
    // one frame explosion feeds BOTH the within-video Jaccard and the
    // cross-modality screen (hashed is checkpoint-pinned, so the fan
    // -out re-reads blocks, never re-decodes)
    val videoFrames = hashed
      .filter(col("kind") === "video" && col("fh").isNotNull)
      .select(col("media_id"), explode(col("fh")).as("fhash")).distinct()
    val video = VideoHash.nearDupVideos(videoFrames, videoThreshold, maxHashFreq)
      .select(lit("video").as("kind"), col("id_a"), col("id_b"),
        lit("jaccard").as("score_type"), col("jaccard").as("score"))
    // CROSS-modality rows from the SAME single scan: stills and frames
    // hash into one 64-bit dHash space, so the facade also surfaces
    // which images appear as video frames — id_a = image, id_b = video
    // (independent id spaces; the id_a < id_b ordering is within-kind)
    val imageVideo = imageVideoPairsFromHashes(
        hashed.filter(col("kind") === "image" && col("dhash").isNotNull)
          .select(col("media_id"), col("dhash")),
        videoFrames, maxDistance, maxBucketSize)
      .select(lit("image-video").as("kind"), col("image_id").as("id_a"),
        col("video_id").as("id_b"), lit("hamming").as("score_type"),
        col("min_hamming").cast("double").as("score"))
    images.unionByName(audio).unionByName(video).unionByName(imageVideo)
  }

  /** CROSS-modality near-dup: which still images appear (lightly
    * edited or verbatim) as frames of which videos — the screen a
    * training pipeline runs before admitting stills into a corpus
    * that already ingested video (and vice versa). Both sides hash
    * into the SAME 64-bit dHash space ([[ImageHash.dHash64]] for
    * stills, [[VideoHash.frameDHashes]] per frame — Motion-JPEG
    * frames literally route through `dHash64`), so the pairing is the
    * shared 16-bit-block Hamming machinery ([[Dedup.hashBlockRows]]),
    * exact for `maxDistance` ≤ 3 by pigeonhole and verified in-join
    * on the riding 8-byte hashes.
    *
    * Output: (image_id, video_id, min_hamming, n_frames_hit) —
    * `n_frames_hit` counts the video's DISTINCT frame hashes within
    * distance (a still matching a stable scene hits many frames).
    * `maxBucketSize` (0 = off) drops (blk, key) buckets holding more
    * than that many FRAME rows — the hot-frame cap for logo/intro
    * frames shared across a corpus's videos.
    *
    * Scale shape: one decode projection per side (image hashes
    * checkpointed skinny — the block keys would clone the decode UDF;
    * the frame side explodes a generator output, which is
    * collapse-safe), ONE shuffle on (blk, key), pair aggregation
    * bounded by real collisions. Nothing quadratic in either corpus. */
  def imageVideoPairs(images: DataFrame, videos: DataFrame,
                      idCol: String = "media_id", bytesCol: String = "bytes",
                      maxDistance: Int = 3, maxBucketSize: Int = 0,
                      codec: MediaCodec = MediaCodec.Default): DataFrame =
    imageVideoPairsFromHashes(
      ImageHash.dhashFrame(images, idCol, bytesCol, codec = codec)
        .filter(col("dhash").isNotNull).localCheckpoint(true),
      VideoHash.frameHashFrame(videos, idCol, bytesCol, codec),
      maxDistance, maxBucketSize)

  /** The [[imageVideoPairs]] pairing stage over ALREADY-HASHED sides:
    * `imgHashes` = (media_id, dhash) stills, `frameRows` = distinct
    * (media_id, fhash) video frames — the facade feeds both from its
    * single decode projection. Callers handing in a LIVE decode plan
    * must pin the image side first (the 4 block keys clone whatever
    * expression produces `dhash` — the q131 project-collapse lesson;
    * the frame side explodes a generator output, which is
    * collapse-safe). */
  def imageVideoPairsFromHashes(imgHashes: DataFrame, frameRows: DataFrame,
                                maxDistance: Int = 3,
                                maxBucketSize: Int = 0): DataFrame = {
    val imgBlocks = Dedup.hashBlockRows(imgHashes, "media_id", "dhash")
      .select(col("id").as("image_id"), col("sim").as("img_sim"),
        col("blk"), col("key"))
    val frameBlocks = Dedup.hashBlockRows(frameRows, "media_id", "fhash")
      .select(col("id").as("video_id"), col("sim").as("frame_sim"),
        col("blk"), col("key"))
    val capped =
      if (maxBucketSize <= 0) frameBlocks
      else {
        val cool = frameBlocks.groupBy(col("blk"), col("key"))
          .agg(count(lit(1)).as("__f"))
          .filter(col("__f") <= maxBucketSize).select(col("blk"), col("key"))
        frameBlocks.join(cool, Seq("blk", "key"), "left_semi")
      }
    val ham = bit_count(col("img_sim").bitwiseXOR(col("frame_sim")))
    imgBlocks.join(capped, Seq("blk", "key"))
      .filter(ham <= maxDistance)
      // several shared blocks → one (image, frame) row; hamming is
      // pair-determined, min() just deduplicates it
      .groupBy(col("image_id"), col("video_id"), col("frame_sim"))
      .agg(min(ham).as("h"))
      .groupBy(col("image_id"), col("video_id"))
      .agg(min(col("h")).cast("int").as("min_hamming"),
        count(lit(1)).as("n_frames_hit"))
      .select(col("image_id"), col("video_id"), col("min_hamming"),
        col("n_frames_hit"))
  }
}
