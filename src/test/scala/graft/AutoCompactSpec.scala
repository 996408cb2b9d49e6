package graft

import graft.api.{FingerprintStore, MinHashDedupStore,
  SemanticDedupStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The `autoCompactEpochs` knob: once the latest-wins resolution window
  * spans the threshold, append() folds it automatically — and the fold
  * must be READ-IDENTICAL to a never-compacting twin at every step
  * (compaction is maintenance, not semantics). SCALE.md's measured
  * curve (bench_r13_epochs.json) sizes the threshold; this spec pins
  * that whatever the threshold, turning it on cannot change results. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private val H = 0x00FF00FF00L

  private def batch(k: Int): DataFrame = Seq(
    (100L * k, H ^ (1L << (k % 3))), (100L * k + 1, 0x1000000000L * k))
    .toDF("_id", "simhash")

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id").cast("long")).as[Long].collect().toSet

  test("fingerprint store with autoCompactEpochs=2: appends trigger " +
    "compaction automatically, the head snapshots keep advancing, and " +
    "every read equals the never-compacting twin's") {
    val rootA = Files.createTempDirectory("graft-ac1").toString + "/s"
    val rootB = Files.createTempDirectory("graft-ac2").toString + "/s"
    val init = Seq((1L, H), (2L, H)).toDF("_id", "simhash")
    val auto = FingerprintStore.init(spark, rootA, init,
      autoCompactEpochs = 2)
    val plain = FingerprintStore.init(spark, rootB, init)
    var allIds = Seq(1L, 2L).toDF("doc_id")
    for (k <- 1 to 5) {
      auto.append(batch(k))
      plain.append(batch(k))
      allIds = allIds.unionByName(batch(k).select(col("_id").as("doc_id")))
      assert(ids(auto.kept(allIds)) == ids(plain.kept(allIds)),
        s"after append $k")
      assert(auto.components.collect().map(_.toString).toSet ==
        plain.components.collect().map(_.toString).toSet)
      // the window never exceeds the threshold
      assert(auto.epoch - auto.latestSnapshot < 2)
    }
    assert(plain.latestSnapshot == 0L) // the twin never compacted
    assert(auto.latestSnapshot > 0L)
  }

  test("minhash store with autoCompactEpochs=1: every append is " +
    "followed by a fold; reads equal the never-compacting twin") {
    val rootA = Files.createTempDirectory("graft-ac3").toString + "/s"
    val rootB = Files.createTempDirectory("graft-ac4").toString + "/s"
    val init = Seq(1L -> "a b c d e f g h", 2L -> "p q r s t u v w")
      .toDF("doc_id", "text")
    val auto = MinHashDedupStore.init(spark, rootA, init, 0.5,
      autoCompactEpochs = 1)
    val plain = MinHashDedupStore.init(spark, rootB, init, 0.5)
    val b1 = Seq(10L -> "a b c d e f g h", 11L -> "unrelated words here x")
      .toDF("doc_id", "text")
    val b2 = Seq(20L -> "p q r s t u v w").toDF("doc_id", "text")
    for (b <- Seq(b1, b2)) { auto.append(b); plain.append(b) }
    val allIds = (init unionByName b1 unionByName b2).select("doc_id")
    assert(ids(auto.kept(allIds)) == ids(plain.kept(allIds)))
    assert(auto.components.collect().map(_.toString).toSet ==
      plain.components.collect().map(_.toString).toSet)
    assert(auto.epoch - auto.latestSnapshot < 1 ||
      auto.latestSnapshot == auto.epoch)
  }

  test("the DEFAULT autoCompactEpochs (the measured 16) fires without " +
    "being asked: 16 appends on a default-knob store advance the " +
    "snapshot, reads stay identical to a manual (knob=0) twin") {
    val rootA = Files.createTempDirectory("graft-ac5").toString + "/s"
    val rootB = Files.createTempDirectory("graft-ac6").toString + "/s"
    val init = Seq((1L, H), (2L, H)).toDF("_id", "simhash")
    val auto = FingerprintStore.init(spark, rootA, init) // default knob
    assert(auto.autoCompactEpochs == 16)
    val manual = FingerprintStore.init(spark, rootB, init,
      autoCompactEpochs = 0)
    var allIds = Seq(1L, 2L).toDF("doc_id")
    for (k <- 1 to 16) {
      auto.append(batch(k))
      manual.append(batch(k))
      allIds = allIds.unionByName(batch(k).select(col("_id").as("doc_id")))
    }
    assert(auto.latestSnapshot > 0L, "default knob never fired")
    assert(manual.latestSnapshot == 0L)
    assert(ids(auto.kept(allIds)) == ids(manual.kept(allIds)))
    assert(auto.components.collect().map(_.toString).toSet ==
      manual.components.collect().map(_.toString).toSet)
  }

  test("semantic store with autoCompactEpochs=1: appends fold " +
    "trainer-free, reads equal the manual twin, and staleness stays " +
    "TRAIN-relative (the fold must not reset the drift clock)") {
    val rootA = Files.createTempDirectory("graft-ac7").toString + "/s"
    val rootB = Files.createTempDirectory("graft-ac8").toString + "/s"
    val init = Seq(
      (1L, Seq(1f, 0.01f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0.7f, 0.7f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val auto = SemanticDedupStore.init(spark, rootA, init, nCells = 2,
      iters = 2, tau = 0.95, maxStaleFrac = 10.0, autoCompactEpochs = 1)
    val manual = SemanticDedupStore.init(spark, rootB, init, nCells = 2,
      iters = 2, tau = 0.95, maxStaleFrac = 10.0, autoCompactEpochs = 0)
    val b1 = Seq((10L, Seq(1f, 0.015f, 0f, 0f))).toDF("vec_id", "embedding")
    val b2 = Seq((11L, Seq(0f, 0f, 0.99f, 0.05f))).toDF("vec_id", "embedding")
    for (b <- Seq(b1, b2)) { auto.append(b); manual.append(b) }
    assert(auto.latestSnapshot > manual.latestSnapshot)
    assert(auto.latestTrain == 0L) // the fold trained nothing
    assert(auto.staleFrac == manual.staleFrac) // drift clock untouched
    val allIds = (init unionByName b1 unionByName b2).select("vec_id")
    def kept(s: SemanticDedupStore): Set[Long] = s.kept(allIds, "vec_id")
      .select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(kept(auto) == kept(manual))
  }
}
