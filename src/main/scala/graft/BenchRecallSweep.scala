package graft

import graft.operators.{SimilaritySearch => SS}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev-only knob sweep for the PQ-family ANN paths: recall@k across
  * (m, ks, nProbe, refine) combinations on the fixture corpus — the
  * instrument behind the DEFAULT knob choices that BenchRecall then pins
  * as the recorded artifact. One JSON line per combo. */
object BenchRecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "10").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    def rec(fn: (org.apache.spark.sql.DataFrame,
                 org.apache.spark.sql.DataFrame, Int) =>
                org.apache.spark.sql.DataFrame): Double =
      SS.annRecallSummary(queries, corpus, k, fn)
        .select("avg_recall").head().getDouble(0)
    val combos = Seq(
      ("pq_m8_ks64", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKPq(q, c, kk, m = 8, ks = 64)),
      ("pq_m8_ks256", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKPq(q, c, kk, m = 8, ks = 256)),
      ("pq_m16_ks64", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKPq(q, c, kk, m = 16, ks = 64)),
      ("pq_m16_ks256", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKPq(q, c, kk, m = 16, ks = 256)),
      ("pqref100_m8_ks256", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKPqRefine(q, c, kk, refine = 100, m = 8, ks = 256)),
      ("ivfpq_m8_ks256_p4", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKIvfPq(q, c, kk, m = 8, ks = 256)),
      ("ivfpq_m8_ks256_p8", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKIvfPq(q, c, kk, nProbe = 8, m = 8, ks = 256)),
      ("ivfpq_m16_ks256_p8", (q: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, kk: Int) =>
        SS.topKIvfPq(q, c, kk, nProbe = 8, m = 16, ks = 256)))
    combos.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val r = rec(fn)
      // Locale.ROOT: comma-decimal locales would render invalid JSON
      val rs = String.format(java.util.Locale.ROOT, "%.4f", Double.box(r))
      val ts = String.format(java.util.Locale.ROOT, "%.1f",
        Double.box((System.nanoTime() - t0) / 1e9))
      println(s"""{"combo":"$name","recall":$rs,"sec":$ts}""")
    }
    spark.stop()
  }
}
