package graft

import graft.operators.Dedup
import graft.queries.DedupQueries

/** Attribution micro-bench for the probe-gated dedup paths (dev tool, not
  * a declared query): decomposes operator cost on the SAME corpus into the
  * gate-probe share vs the join share by timing the three gate
  * configurations — `None` (probe then branch; what the declared query
  * runs), `Some(false)` (direct path, no probe), `Some(true)` (collapse
  * path, probe skipped). Covers q23b (nearDupPairs over the augmented
  * docs) and q70 (semanticDupPairs over the augmented embeddings at the
  * declared knobs). Per-config medians AND best-of-N floors over
  * SPARK_GRAFT_BENCH_REPEATS runs, one JSON line, same conventions as
  * [[Bench]]. */
object BenchAttr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = DedupQueries.augDocs(spark, sfDir)
    val emb = DedupQueries.augEmb(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm scan + JIT
    emb.write.format("noop").mode("overwrite").save()
    def onceDocs(gate: Option[Boolean]): Double = {
      val t0 = System.nanoTime()
      Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5,
          collapseExactDups = gate)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def onceSem(gate: Option[Boolean]): Double = {
      val t0 = System.nanoTime()
      Dedup.semanticDupPairs(emb, nCells = 8, iters = 3, tau = 0.95,
          collapseIdentical = gate)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    import Bench.median
    val gates = Seq("probe" -> None, "direct" -> Some(false),
      "collapse" -> Some(true))
    val configs: Seq[(String, () => Double)] =
      for ((q, once) <- Seq(
             "q23b" -> (onceDocs _), "q70" -> (onceSem _));
           (g, gate) <- gates)
        yield s"${q}_$g" -> (() => once(gate))
    // pass-major order, same load-spreading rationale as Bench
    val samples = (1 to repeats).map(_ =>
      configs.map { case (n, f) => n -> f() }.toMap)
    val stats = configs.map { case (n, _) =>
      val xs = samples.map(_(n)); (n, median(xs), xs.min) }
    val med = stats.map { case (n, m, _) => s""""$n":$m""" }.mkString(",")
    val floors = stats.map { case (n, _, f) => s""""$n":$f""" }.mkString(",")
    println(s"""{"metric":"dedup_attr","unit":"sec","medians":{$med},"floors":{$floors},"repeats":$repeats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
