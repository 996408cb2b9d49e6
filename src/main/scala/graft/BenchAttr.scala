package graft

import graft.operators.Dedup
import graft.queries.DedupQueries

/** Attribution micro-bench for the q23b MinHash+LSH path (dev tool, not a
  * declared query): decomposes nearDupPairs cost on the SAME corpus into
  * the gate-probe share vs the banded-join share by timing the three gate
  * configurations — `None` (probe then branch; what q23b declares),
  * `Some(false)` (direct banding, no probe), `Some(true)` (collapse path,
  * probe skipped). Per-config medians over SPARK_GRAFT_BENCH_REPEATS runs,
  * one JSON line, same conventions as [[Bench]]. */
object BenchAttr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = DedupQueries.augDocs(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm scan + JIT
    def once(gate: Option[Boolean]): Double = {
      val t0 = System.nanoTime()
      Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5,
          collapseExactDups = gate)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    import Bench.median
    val configs = Seq("probe" -> None, "direct" -> Some(false),
      "collapse" -> Some(true))
    // pass-major order, same load-spreading rationale as Bench
    val samples = (1 to repeats).map(_ =>
      configs.map { case (n, g) => n -> once(g) }.toMap)
    val med = configs.map { case (n, _) =>
      s""""$n":${median(samples.map(_(n)))}""" }.mkString(",")
    println(s"""{"metric":"q23b_attr","unit":"sec",$med,"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
