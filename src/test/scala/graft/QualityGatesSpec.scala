package graft

import graft.operators.{Reconstruction, Statistics, VersionStore}
import graft.simulation.EvolutionSimulator
import org.apache.spark.sql.functions._

/** Simulation-scale quality gates, porting the reference's week1 harness
  * (/root/reference/tests/test_week1.py:232-248): reconstruction accuracy
  * avg > 0.98 and min > 0.95 over a multi-article evolution, plus the
  * storage-efficiency estimate (:205-216, gate > 5×). */
class QualityGatesSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 100
  private lazy val truth =
    EvolutionSimulator.history(nArticles = 10, versionsPer = 10, dim, seed = 42)
  private lazy val versions = VersionStore.ingestWithSeq(
    EvolutionSimulator.historyDf(spark, 10, 10, dim, seed = 42))

  test("simulation reconstruction accuracy: avg cosine > 0.98, min > 0.95") {
    val targets = truth.map(t => (t._1, t._2)).toDF("content_id", "seq")
    val recon = Reconstruction.reconstruct(versions, targets)
      .select("content_id", "seq", "embedding")
      .as[(String, Int, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val truthMap = truth.map(t => (t._1, t._2) -> t._4).toMap
    assert(recon.size == truth.size)
    val cosines = recon.map { case (k, got) =>
      val want = truthMap(k)
      got.zip(want).map { case (a, b) => a.toDouble * b }.sum /
        (math.sqrt(got.map(x => x.toDouble * x).sum) *
          math.sqrt(want.map(x => x.toDouble * x).sum))
    }.toSeq
    val avg = cosines.sum / cosines.size
    assert(avg > 0.98, s"avg cosine $avg")
    assert(cosines.min > 0.95, s"min cosine ${cosines.min}")
  }

  test("storage efficiency exceeds the reference's 5x gate " +
    "(reference metric: len(sparse_delta) entries, test_week1.py:205-216)") {
    val eff = Statistics.storageEfficiency(versions, dim, cellsPerEntry = 1)
      .select("efficiency").as[Double].collect()(0)
    assert(eff > 5.0, s"efficiency $eff")
    // honest 2-cells-per-entry storage cost still beats dense by > 4x
    val eff2 = Statistics.storageEfficiency(versions, dim)
      .select("efficiency").as[Double].collect()(0)
    assert(eff2 > 4.0, s"efficiency(2-cell) $eff2")
  }

  test("promotion policy bounds every chain at interval length") {
    val worst = Reconstruction.costs(versions)
      .agg(max("reconstruction_cost")).as[Int].collect()(0)
    assert(worst < 10) // interval 10 -> max possible chain 9
  }
}
