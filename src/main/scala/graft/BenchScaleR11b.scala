package graft

import graft.operators.{Dedup, SubstringIndex}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Round-11 scale probes, part 2 (dev tool, not a declared query) — the
  * session's NEW paths:
  *
  *  1. FUZZY JOIN scaling — the q113/q114 chain (distinct-key collapse →
  *     symmetric single-deletion variants → md5-bucketed equi-join →
  *     levenshtein verify → connected components) on the scaled
  *     documents fixture. The claim under test: candidate volume tracks
  *     the near-dup structure (Σ variant-bucket²), not corpus size — the
  *     probe reports pair/cluster counts beside wall-clock so a
  *     super-linear blowup would be visible in BOTH.
  *  2. INDEXED-DEDUP READ PATH — q115's `dedupeWithIndex` from a
  *     persisted index vs the q101 from-scratch suffix-rank build on the
  *     same corpus: the read-time economics of holding the maintained
  *     index (the aggregation pass is prepaid at ingest).
  *
  * One JSON line, the Bench* pattern. SPARK_GRAFT_SF_DIR picks the
  * fixture; SPARK_GRAFT_R11_REPEATS repeats timings and reports floors.
  */
object BenchScaleR11b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R11_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def floor(body: => Unit): Double =
      (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min

    // --- 1. fuzzy join ---
    val fz = DedupQueries.fuzzKeys(spark, sfDir)
      .transform(graft.operators.Ckpt.eager(_))
    val nKeys = fz.count()
    val pairsSec = floor {
      Dedup.fuzzyKeyPairs(fz, "key", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = graft.operators.Ckpt.eager(
      Dedup.fuzzyKeyPairs(fz, "key", "doc_id"))
    val nPairs = pairs.count()
    val clustersSec = floor {
      Dedup.connectedComponents(pairs
          .select(col("rep_a").as("id1"), col("rep_b").as("id2")))
        .write.format("noop").mode("overwrite").save()
    }
    // the distance-2 tier: ~len²/2 variants per key, the volume knob
    val pairsD2Sec = floor {
      Dedup.fuzzyKeyPairs(fz, "key", "doc_id", maxEdit = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // --- 2. indexed-dedup read path vs from-scratch ---
    val W = 16
    val corpus = DedupQueries.augDocs(spark, sfDir)
      .where(pmod(col("doc_id"), lit(5)) === 0)
      .transform(graft.operators.Ckpt.eager(_))
    val nDocs = corpus.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_r11b").toString
    SubstringIndex.buildIndex(corpus, W).write.parquet(s"$tmp/index")
    val index = spark.read.parquet(s"$tmp/index")
    val indexedSec = floor {
      SubstringIndex.dedupeWithIndex(corpus, index, W)
        .write.format("noop").mode("overwrite").save()
    }
    val scratchSec = floor {
      graft.operators.SuffixArray.substringDeduped(corpus, W)
        .write.format("noop").mode("overwrite").save()
    }

    println(
      s"""{"metric":"scale_r11b","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_fuzzy_keys":$nKeys,"n_fuzzy_pairs":$nPairs,""" +
      s""""fuzzy_pairs_sec":$pairsSec,"fuzzy_pairs_d2_sec":$pairsD2Sec,""" +
      s""""fuzzy_clusters_sec":$clustersSec,""" +
      s""""n_substring_docs":$nDocs,""" +
      s""""dedup_indexed_sec":$indexedSec,"dedup_scratch_sec":$scratchSec}""")
    spark.stop()
  }
}
