package graft.tools

import graft.operators.SuffixArray
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Scratch profiler for the suffix-array pipeline (not part of the API). */
object ProfileSuffix {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.api.GraftSession.builder(s"local[$cpus]", cpus)
      .getOrCreate()
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - s) / 1e9}%.2fs"); r
    }
    val full = args.length > 1 && args(1) == "full"
    val docs0 = DedupQueries.augDocs(spark, sf)
    val docs = if (full) docs0
    else docs0.where(pmod(col("doc_id"), lit(5)) === 0)
    t("augDocs count")(docs.count())
    if (args.length > 1 && args(1) == "removal") {
      // q101 scale probe: full-corpus exact-substring removal (W=16)
      val r = t("removal collect")(
        SuffixArray.substringDeduped(docs, window = 16)
          .agg(count(lit(1)), sum("n_tokens_before"), sum("n_tokens_after"))
          .collect().head)
      println(s"[prof] removal rows=${r.getLong(0)} " +
        s"before=${r.getLong(1)} after=${r.getLong(2)}")
      val r2 = t("removal collect 2")(
        SuffixArray.substringDeduped(docs, window = 16)
          .agg(count(lit(1)), sum("n_tokens_after")).collect().head)
      println(s"[prof] removal2 rows=${r2.getLong(0)}")
      spark.stop(); return
    }
    val res = t("build stats plan")(
      SuffixArray.substringDedupStats(docs, minLen = 16, levels = 7))
    t("stats collect")(res.orderBy("doc_id").collect().length)
    // second run: warm
    val res2 = t("build stats plan 2")(
      SuffixArray.substringDedupStats(docs, minLen = 16, levels = 7))
    t("stats collect 2")(res2.orderBy("doc_id").collect().length)
    spark.stop()
  }
}
