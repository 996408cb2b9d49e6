package graft

import graft.operators.{Ckpt, Graph, SuffixArray}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Reliable-vs-local checkpoint cost probe (dev tool): prices the I/O
  * tax of `spark.graft.checkpoint.reliable=true` on the two deepest
  * iterative pyramids — 10-round PageRank (10 node-sized truncations +
  * the two pinned prep frames) and the suffix doubling build (one
  * corpus-sized truncation per level + walk pins) — so SCALE.md's
  * "flip it when loss-rate x depth x round-cost exceeds the tax"
  * advice carries a measured number instead of a guess. Local disk
  * stands in for HDFS/S3 (real DFS adds network replication on top;
  * this is the LOWER bound of the tax). One JSON line. */
object BenchCkpt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_probe").toString
    spark.sparkContext.setCheckpointDir(ckDir)

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def inMode[T](reliable: Boolean)(body: => T): Double = {
      if (reliable) spark.conf.set(Ckpt.ReliableKey, "true")
      else spark.conf.unset(Ckpt.ReliableKey)
      try time(body) finally spark.conf.unset(Ckpt.ReliableKey)
    }

    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val edges = Graph.tradeEdges(orders, li).transform(Ckpt.eager(_))
    edges.count()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").transform(Ckpt.eager(_))
    docs.count()

    // warmup (JIT + codegen) in local mode, then measure both modes
    inMode(reliable = false)(Graph.pageRank(edges, 10).count())
    val prLocal = inMode(reliable = false)(
      Graph.pageRank(edges, 10).count())
    val prReliable = inMode(reliable = true)(
      Graph.pageRank(edges, 10).count())
    val sfxLocal = inMode(reliable = false)(
      SuffixArray.substringDedupStats(docs, 16).count())
    val sfxReliable = inMode(reliable = true)(
      SuffixArray.substringDedupStats(docs, 16).count())

    println(
      s"""{"metric":"ckpt_tax","sf":"$sfDir",""" +
      s""""pagerank_local_sec":$prLocal,""" +
      s""""pagerank_reliable_sec":$prReliable,""" +
      s""""suffix_local_sec":$sfxLocal,""" +
      s""""suffix_reliable_sec":$sfxReliable}""")
    spark.stop()
  }
}
