package graft

import graft.operators.{Dedup, SimilaritySearch => SS}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Recorded recall@k for every approximate ANN path plus the MinHash
  * banding recall (dev tool, not a declared query): the tuning
  * instruments (`annRecallSummary`, `bandingRecall`) exist so the knobs
  * can be tuned per corpus — this main pins the NUMBERS they produce at
  * the default knobs on the driver-scale fixtures, one JSON line, so the
  * recall/latency trade each approximate path makes is a recorded fact
  * rather than a claim. */
object BenchRecall {
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
    val paths: Seq[(String, (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "lsh" -> ((q, c, kk) => SS.topKLsh(q, c, kk)),
        "lsh_multi" -> ((q, c, kk) => SS.topKLshMulti(q, c, kk)),
        "ivf" -> ((q, c, kk) => SS.topKIvf(q, c, kk)),
        "pq" -> ((q, c, kk) => SS.topKPq(q, c, kk)),
        "pq_refine" -> ((q, c, kk) => SS.topKPqRefine(q, c, kk, refine = 20)),
        "ivfpq" -> ((q, c, kk) => SS.topKIvfPq(q, c, kk)),
        "sq8" -> ((q, c, kk) => SS.topKSq(q, c, kk)),
        "bq" -> ((q, c, kk) => SS.topKBq(q, c, kk, refine = 0)),
        "bq_refine" -> ((q, c, kk) => SS.topKBq(q, c, kk)))
    // tuned variants: the same paths with their recall knobs opened up
    // (more tables/probes, finer codebooks, larger refine set) — recorded
    // beside the defaults so the knob-to-recall lever is a measured fact
    val tuned: Seq[(String, (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "lsh_multi_t8b4" -> ((q, c, kk) =>
          SS.topKLshMulti(q, c, kk, nBits = 4, nTables = 8)),
        "ivf_p8" -> ((q, c, kk) => SS.topKIvf(q, c, kk, nProbe = 8)),
        "pq_refine_r100" -> ((q, c, kk) =>
          SS.topKPqRefine(q, c, kk, refine = 100)),
        "ivfpq_p8" -> ((q, c, kk) =>
          SS.topKIvfPq(q, c, kk, nProbe = 8)),
        "ivfpq_p8_r100" -> ((q, c, kk) =>
          SS.topKIvfPq(q, c, kk, nProbe = 8, refine = 100)),
        "bq_refine_r200" -> ((q, c, kk) =>
          SS.topKBq(q, c, kk, refine = 200)))
    // Locale.ROOT: f"" renders under the JVM default locale — a
    // comma-decimal locale would emit invalid JSON
    def d4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val recalls = (paths ++ tuned).map { case (name, fn) =>
      val r = SS.annRecallSummary(queries, corpus, k, fn)
        .select(col("avg_recall"), col("min_recall")).head()
      s""""$name":{"avg":${d4(r.getDouble(0))},"min":${d4(r.getDouble(1))}}"""
    }
    // MinHash banding recall on the augmented doc corpus at the q23b knobs
    val banding = Dedup.bandingRecall(
      graft.queries.DedupQueries.augDocs(spark, sfDir), "doc_id", "text",
      tau = 0.5, sampleN = 400)
    val b = banding.head()
    val bJson = s""""minhash_banding":{"recall":${d4(b.getAs[Double]("recall"))},"n_true_pairs":${b.getAs[Long]("n_true_pairs")}}"""
    println(s"""{"metric":"recall","k":$k,${recalls.mkString(",")},$bJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
