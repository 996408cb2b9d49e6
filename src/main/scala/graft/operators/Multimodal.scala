package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decoded media row: deterministic pseudo-features derived from the
  * payload's md5 (see [[Multimodal.decodeAndFeaturize]]). */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    feature: Array[Float])

/** Multimodal-column plumbing for training-data pipelines (builder north
  * star): media payloads travel as opaque BINARY columns with typed
  * metadata; decode/feature-extract runs as per-partition imperative code —
  * the one place `mapPartitions` is the right tool (native codec calls
  * cannot be expressed as Catalyst expressions).
  *
  * The DECODE STEP IS A STUB: this environment has no image/audio codecs,
  * so `decodeAndFeaturize` derives deterministic pseudo-features from the
  * payload's md5. Everything around it — binary schema, partition-parallel
  * batched execution, typed output Encoder, downstream compatibility with
  * the similarity/dedup operators — is real and tested. A production
  * deployment replaces only the body of [[featurize]] with a codec call
  * (e.g. libjpeg/ffmpeg via JNI), keeping the identical Spark plan.
  */
object Multimodal {

  val FeatureDim = 8

  /** Deterministic stand-in for a codec + feature extractor: feature j is
    * derived from 6 hex digits of md5(payload) at offset 2j, scaled to
    * [0, 1). Reproducible in any engine with md5 (the oracle replicates
    * it in SQL). */
  def featurize(bytes: Array[Byte]): Array[Float] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    Array.tabulate(FeatureDim) { j =>
      val v = java.lang.Long.parseLong(hex.substring(2 * j, 2 * j + 6), 16)
      (v % 1000L).toFloat / 1000.0f
    }
  }

  /** Decode + featurize a media table (media_id LONG, kind STRING,
    * payload BINARY). Runs partition-parallel with no shuffle; only the
    * two needed columns are scanned. */
  def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        MediaFeatures(id, kind, payload.length.toLong, featurize(payload))
      })
  }

  /** Frame-sampling plumbing for video-like payloads: emit one row per
    * sampled frame index (every `stride` bytes as a stand-in for frame
    * boundaries). Demonstrates the explode-shaped decode path (1 input row
    * -> N frame rows) without a real container parser. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0),
        greatest(floor((length(col("payload")) - lit(1))
          / lit(stride.toDouble)).cast("int"), lit(0))))
        .as("frame_idx"))
}
