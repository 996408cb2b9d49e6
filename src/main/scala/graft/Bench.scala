package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Shared by the bench mains (Bench/BenchAttr/BenchStream); 0 on empty. */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // this box swings ±40% under external load; single-shot totals are
    // noise, so the bench self-repeats and reports PER-QUERY MEDIANS
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JIT/codegen + parquet footers + the one-time synthetic
    // versions materialization, so the first timed query isn't charged for
    // session/store initialization.
    Seq("q01_filter", "q13_version_ingest", "q19_text_stats").foreach { q =>
      try SparkEntry.queries.get(q).foreach(_(spark, sfDir).count())
      catch { case _: Throwable => () }
    }
    // noop sink, not count(): count() lets the optimizer prune away every
    // computed column of map-only queries, so the measured work would be a
    // bare scan; noop materializes the full output rows.
    def runOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e"); None
      }
    }
    // optional comma-separated restriction (local scale probes); the
    // driver's per-round run never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // pass-major order (all queries per pass, then repeat) so a query's
    // repetitions are spread across the run and share load conditions
    val samples: Seq[Map[String, Option[Double]]] =
      (1 to repeats).map(_ => names.map(n => n -> runOnce(n)).toMap)
    // best-of-N floors beside the medians: two rounds running, the
    // official window ran ~25% hot under external box load, and the
    // floor is what separates "operator regressed" from "box was busy"
    // without a separate controlled re-run
    val stats = names.flatMap { n =>
      val ok = samples.flatMap(_(n))
      if (ok.isEmpty) None else Some(n -> (median(ok), ok.min))
    }
    // 0.1 ms print precision: full doubles added ~1.5 KB of noise digits
    // to a line that log-capture windows already truncate (r12-r14 all
    // recorded "parsed": null)
    def r4(v: Double): Double = math.round(v * 10000.0) / 10000.0
    val medians = stats.map { case (n, (m, _)) => n -> r4(m) }
    val floors = stats.map { case (n, (_, f)) => n -> r4(f) }
    // a query is "failed" only if EVERY repetition failed; failures are a
    // separate array (never sign-encoded into the timings map)
    val failed = names.filter(n => samples.forall(_(n).isEmpty))
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = floors.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // window-normalization sentinels: two queries untouched for many
    // rounds — a reader divides any run's floors by the sentinel ratio
    // to separate box swing (~1.4x between windows) from code change
    val sentinel = medians.filter { case (k, _) =>
      k == "q03_tpch_q1" || k == "q08_topk" }
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // deliberate exact baselines whose scale twin is the real path: the
    // 2x regression gate should tune the twin, not the baseline shape
    // (q25 is the N-squared all-pairs cosine witness for q26's LSH; q69
    // emits the quadratic pair OUTPUT that q69b's components collapse)
    val baselineOf = Map(
      "q25_neardup_embedding" -> "q26_neardup_lsh",
      "q69_image_dedup" -> "q69b_image_corpus_dedup",
      "q74_audio_dedup" -> "q74b_audio_corpus_dedup",
      "q75_video_dedup" -> "q75b_video_corpus_dedup")
    val bo = baselineOf.filter { case (k, _) => names.contains(k) }
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = r4(medians.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"floors":$fs,"sentinel":$sentinel,"baseline_of":$bo,"failed":$fl,"repeats":$repeats,"sf":"$sfDir"}"""
    // the stdout line can exceed log-capture truncation limits (~2000
    // chars with 151 queries), which rounds 6 and 12-14 showed leaves
    // consumers with an unparseable tail — persist the full record
    // beside the repo FIRST, then print the line as the VERY LAST stdout
    // output (after spark.stop(), so no shutdown logging follows it and
    // a tail window holds as much of the line as it can)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last_run.json"), line + "\n")
    catch { case _: Throwable => () } // read-only cwd: stdout still has it
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
