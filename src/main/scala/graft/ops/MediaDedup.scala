package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The perceptual-dedup FACADE: one call over a mixed media frame
  * (media_id, kind, bytes — the [[Multimodal.mediaSchema]] shape)
  * dispatching each modality to its operator — image dHash
  * ([[ImageHash]]), audio energy envelope ([[AudioHash]]), video
  * frame-set Jaccard ([[VideoHash]]) — and unioning the pair frames
  * under one schema. Pairs are intrinsically WITHIN-kind (a waveform
  * has no Hamming distance to a pixel grid); rows that decode under no
  * modality simply surface no pairs, per the family convention.
  *
  * Output: (kind, id_a, id_b, score_type, score) with id_a < id_b —
  * score_type = "hamming" (image/audio; smaller is closer, exact ≤
  * `maxDistance` by the 4×16-bit pigeonhole) or "jaccard" (video;
  * larger is closer, ≥ `videoThreshold`). Each branch is one decode
  * projection + one blocking shuffle over ITS kind's rows; the three
  * branches each re-evaluate the input plan (one filtered scan per
  * modality) — reading a media table that is three scans of parquet;
  * if `media` is an expensive upstream computation, persist or
  * checkpoint it before calling (the facade deliberately does not
  * force a corpus-sized bytes materialization on the caller). */
object MediaDedup {

  def nearDuplicates(media: DataFrame, idCol: String = "media_id",
                     kindCol: String = "kind", bytesCol: String = "bytes",
                     maxDistance: Int = 3, videoThreshold: Double = 0.8,
                     maxBucketSize: Int = 0, maxHashFreq: Int = 1000): DataFrame = {
    def branch(kind: String) = media.filter(col(kindCol) === kind)
    val images = ImageHash.nearDuplicates(branch("image"), idCol, bytesCol,
        maxDistance, maxBucketSize)
      .select(lit("image").as("kind"), col("id_a"), col("id_b"),
        lit("hamming").as("score_type"), col("hamming").cast("double").as("score"))
    val audio = AudioHash.nearDuplicates(branch("audio"), idCol, bytesCol,
        maxDistance, maxBucketSize)
      .select(lit("audio").as("kind"), col("id_a"), col("id_b"),
        lit("hamming").as("score_type"), col("hamming").cast("double").as("score"))
    val video = VideoHash.nearDuplicates(branch("video"), idCol, bytesCol,
        videoThreshold, maxHashFreq)
      .select(lit("video").as("kind"), col("id_a"), col("id_b"),
        lit("jaccard").as("score_type"), col("jaccard").as("score"))
    images.unionByName(audio).unionByName(video)
  }
}
