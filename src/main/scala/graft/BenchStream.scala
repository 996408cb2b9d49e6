package graft

import graft.api.TemporalVectorDB
import graft.operators.VersionStore
import graft.sources.Tables
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** Streaming staleness-contract datapoint (dev tool, not a declared
  * query): seeds a path-backed facade with every `embeddings` row as a
  * content, builds the maintained IVF-PQ index, then drives update
  * micro-batches through the exactly-once [[StreamingIngest.processBatch]]
  * path with the staleness gate (`retrainPqIndexIfStale`) checked after
  * every commit — the deployment loop the streaming contract describes.
  * Reports per-batch apply cost (ingest + index re-encode), gate-check
  * cost, and the full retrain cost when the gate fires, as one JSON line. */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_STALE_T", "0.1").toDouble
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "4").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream")
      .toFile; dir.delete()
    val db = new TemporalVectorDB(spark, dir.getAbsolutePath,
      VersionStore.Config(baseInterval = 5))
    def asBatch(ver: Int) = Tables.embeddings(spark, sfDir)
      // update slice: batch b touches the vec_id % 20 == (b-1) % 20 cohort
      // (wrapped, so batch counts beyond 20 keep producing real updates)
      .where(if (ver == 0) lit(true)
        else pmod(col("vec_id"), lit(20)) === ((ver - 1) % 20))
      .select(format_string("c%07d", col("vec_id")).as("content_id"),
        expr(s"timestamp'2025-01-01' + make_interval(0,0,0,$ver,0,0,0)")
          .as("ts"),
        transform(col("embedding"),
          x => (x + lit(0.01f) * ver).cast("float")).as("embedding"))

    val t0 = System.nanoTime()
    StreamingIngest.processBatch(db, asBatch(0), 0L) // seed corpus
    val seedSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    db.cachePqIndex() // initial train + encode
    val trainSec = (System.nanoTime() - t1) / 1e9

    var applySecs = List.empty[Double]
    var gateSecs = List.empty[Double]
    var retrains = List.empty[(Int, Double)]
    for (b <- 1 to nBatches) {
      val ta = System.nanoTime()
      StreamingIngest.processBatch(db, asBatch(b), b.toLong)
      applySecs ::= (System.nanoTime() - ta) / 1e9
      val tg = System.nanoTime()
      val fired = db.retrainPqIndexIfStale(threshold)
      val g = (System.nanoTime() - tg) / 1e9
      if (fired) retrains ::= (b, g) else gateSecs ::= g
    }
    import Bench.{median => med}
    val rts = retrains.reverse.map { case (b, s) => s"""[$b,$s]""" }
      .mkString("[", ",", "]")
    // null (not 0.0) when every batch fired a retrain: a median over zero
    // no-op samples is indistinguishable from a genuinely free gate check;
    // the sample count makes the distinction readable either way
    val gateNoop =
      if (gateSecs.isEmpty) "null" else med(gateSecs).toString
    println(s"""{"metric":"stream_staleness","unit":"sec","seed":$seedSec,"initial_train":$trainSec,"apply_median":${med(applySecs)},"gate_noop_median":$gateNoop,"gate_noop_samples":${gateSecs.length},"retrains":$rts,"threshold":$threshold,"batches":$nBatches,"sf":"$sfDir"}""")
    spark.stop()
  }
}
