package graft.tools

import graft.SparkEntry

/** Dump formatted plans for the round-9 queries (audit aid). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.api.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q97_zorder_key", "q98_interval_join", "q99_sessionize")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
