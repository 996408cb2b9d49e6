package graft.tools

import graft.operators.SuffixArray
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Scratch profiler for the suffix-array pipeline (not part of the API). */
object ProfileSuffix {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.api.GraftSession.builder("local[8]", 8).getOrCreate()
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - s) / 1e9}%.2fs"); r
    }
    val docs = DedupQueries.augDocs(spark, sf)
      .where(pmod(col("doc_id"), lit(5)) === 0)
    t("augDocs count")(docs.count())
    val res = t("build lrs plan")(
      SuffixArray.longestRepeatedSpans(docs, levels = 7))
    t("lrs collect")(res.orderBy("doc_id").collect().length)
    // second run: warm
    val res2 = t("build lrs plan 2")(
      SuffixArray.longestRepeatedSpans(docs, levels = 7))
    t("lrs collect 2")(res2.orderBy("doc_id").collect().length)
    spark.stop()
  }
}
