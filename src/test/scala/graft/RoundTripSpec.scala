package graft

import graft.operators.{Reconstruction, VersionStore}
import java.sql.Timestamp

/** Ingest→reconstruct roundtrip under randomized configurations and the
  * reference's default 384 dimensions (storage_engine.py:50) — every
  * version must reconstruct within the reference L2 tolerance regardless of
  * promotion-policy settings. */
class RoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2025-04-${i + 1}%02d 00:00:00")

  /** Random walk whose edits are all ABOVE the sparsity threshold, so the
    * sparse encoding is lossless and the reference 0.01 L2 gate applies.
    * (Sub-threshold edits are dropped BY DESIGN — delta_computer.py:63-66 —
    * and accumulate bounded, not zero, error; that regime is covered by the
    * coarse-threshold test below.) */
  private def randomHistory(dim: Int, nVersions: Int, seed: Long)
      : Seq[(String, Int, Timestamp, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    var cur = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    (1 to nVersions).map { k =>
      if (k > 1) cur = cur.map { x =>
        if (rnd.nextDouble() < 0.15) {
          val mag = 0.03f + rnd.nextFloat() * 0.3f
          x + (if (rnd.nextBoolean()) mag else -mag)
        } else x
      }
      ("c", k, ts(k - 1), cur.clone())
    }
  }

  private def assertRoundTrip(dim: Int, cfg: VersionStore.Config,
                              seed: Long): Unit = {
    val truth = randomHistory(dim, 10, seed)
    val versions = VersionStore.ingestWithSeq(
      truth.toDF("content_id", "seq", "ts", "embedding"), cfg)
    val targets = (1 to 10).map(("c", _)).toDF("content_id", "seq")
    val recon = Reconstruction.reconstruct(versions, targets)
      .select("seq", "embedding").as[(Int, Array[Float])].collect().toMap
    assert(recon.size == 10)
    for ((_, k, _, want) <- truth) {
      val got = recon(k)
      val l2 = math.sqrt(got.zip(want).map { case (a, b) =>
        (a - b).toDouble * (a - b) }.sum)
      assert(l2 < 0.01, s"dim=$dim cfg=$cfg seed=$seed seq=$k l2=$l2")
    }
  }

  test("metadata survives the store write→read roundtrip " +
    "(storage_engine.py:150-151, 222-223)") {
    import org.apache.spark.sql.functions._
    val df = randomHistory(16, 4, seed = 9L)
      .toDF("content_id", "seq", "ts", "embedding")
      .withColumn("metadata", map(lit("source"), lit("crawl"),
        lit("rev"), col("seq").cast("string")))
    val dir = java.nio.file.Files.createTempDirectory("meta-rt").toFile
    VersionStore.write(VersionStore.ingestWithSeq(df), dir.getAbsolutePath)
    val back = spark.read.parquet(dir.getAbsolutePath)
      .select(col("seq"), col("metadata").getItem("source").as("src"),
        col("metadata").getItem("rev").cast("int").as("rev"))
      .as[(Int, String, Int)].collect().sorted.toSeq
    assert(back == (1 to 4).map(k => (k, "crawl", k)))
  }

  test("roundtrip at the reference default dim 384") {
    assertRoundTrip(384, VersionStore.Config(), seed = 1)
  }

  test("roundtrip under randomized promotion configs") {
    val rnd = new scala.util.Random(99)
    for (t <- 1 to 5) {
      val cfg = VersionStore.Config(
        sparsityThreshold = Seq(0.001, 0.01, 0.02)(rnd.nextInt(3)),
        baseInterval = 2 + rnd.nextInt(10),
        promotionRatio = 0.3 + rnd.nextDouble() * 0.6)
      assertRoundTrip(50, cfg, seed = 100 + t)
    }
  }

  test("roundtrip survives a coarse sparsity threshold within its own bound") {
    // threshold 0.05: dropped dims each differ < 0.05; with <= interval-1
    // chained deltas the worst-case drift is bounded, not exact — assert
    // the looser bound instead of the 0.01 gate.
    val truth = randomHistory(50, 10, seed = 7)
    val versions = VersionStore.ingestWithSeq(
      truth.toDF("content_id", "seq", "ts", "embedding"),
      VersionStore.Config(sparsityThreshold = 0.05, baseInterval = 5))
    val targets = (1 to 10).map(("c", _)).toDF("content_id", "seq")
    val recon = Reconstruction.reconstruct(versions, targets)
      .select("seq", "embedding").as[(Int, Array[Float])].collect().toMap
    for ((_, k, _, want) <- truth) {
      val linf = recon(k).zip(want).map { case (a, b) =>
        math.abs(a - b) }.max
      assert(linf < 0.05 * 5, s"seq=$k linf=$linf")
    }
  }
}
