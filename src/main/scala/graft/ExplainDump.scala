package graft

/** Dev tool (not a declared query): dump `.explain("formatted")` for the
  * named declared queries into a directory — the plan evidence the
  * optimization rounds commit under plans/rNN/. Usage:
  * {{{
  *   runMain graft.ExplainDump <sfDir> <outDir> <suffix> q01_filter ...
  * }}}
  * writes `<outDir>/<name>_<suffix>.txt` per query. Queries whose
  * surface is an imperative store protocol (q121/q122...) dump the plan
  * of the RETURNED frame — the committed bench/timing records carry the
  * protocol-level evidence for those.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <outDir> <suffix> <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), txt)
      System.err.println(s"[explain] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
