package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "hello world".getBytes("UTF-8")),
    (2L, "audio", Array.fill[Byte](200)(7)),
    (3L, "video", Array.fill[Byte](130)(1))
  ).toDF("media_id", "kind", "payload")

  test("decodeAndFeaturize is deterministic, bounded, and keeps ids") {
    val got = Multimodal.decodeAndFeaturize(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L).n_bytes == 11L && got(2L).n_bytes == 200L)
    got.values.foreach { m =>
      assert(m.feature.length == Multimodal.FeatureDim)
      assert(m.feature.forall(f => f >= 0.0f && f < 1.0f))
    }
    // determinism: same payload -> same features
    val again = Multimodal.decodeAndFeaturize(media).collect()
      .map(m => m.media_id -> m.feature.toSeq).toMap
    assert(again(1L) == got(1L).feature.toSeq)
  }

  test("featurize matches the md5-derived oracle formula") {
    val bytes = "hello world".getBytes("UTF-8")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val f0 = (java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1000L)
      .toFloat / 1000.0f
    assert(Multimodal.featurize(bytes)(0) == f0)
  }

  test("sampleFrames emits one row per stride chunk") {
    val got = Multimodal.sampleFrames(media, stride = 64)
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L)  // 11 bytes -> 1 frame
    assert(got(2L) == 4L)  // 200 bytes -> ceil(200/64) = 4
    assert(got(3L) == 3L)  // 130 bytes -> 3
  }
}
