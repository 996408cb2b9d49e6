package graft

import graft.operators.{SubstringIndex, SuffixArray}
import graft.queries.DedupQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-11 scale probes (dev tool, not a declared query):
  *
  *  1. APPEND vs REBUILD for substring dedup — the deployment economics
  *     that motivate [[graft.operators.SubstringIndex]]: a growing corpus
  *     deduped after every append. The probe persists the index + the
  *     previous dedup result to parquet (exactly the artifacts a
  *     deployment keeps beside the store), appends a ~2% batch, and
  *     times the maintained-index append against the from-scratch
  *     suffix-rank rebuild of the union. Both paths produce
  *     hash-identical results (q111's oracle gate); this measures the
  *     cost gap.
  *  2. RELIABLE-CHECKPOINT floors for the suffix family — q101/q109
  *     re-run with `spark.graft.checkpoint.reliable=true` (checkpoint
  *     dir on local fs), pricing the fault-tolerance I/O tax on the
  *     engine's deepest pyramids at the probe scale (VERDICT r10 #7).
  *
  * One JSON line, the Bench* pattern. SPARK_GRAFT_SF_DIR picks the
  * fixture (sf0.1 default; point at a make_scale.py 10x/100x dir for
  * the scale rows); SPARK_GRAFT_R11_REPEATS repeats every timing and
  * reports floors (box noise swings single shots 2-4x). */
object BenchScaleR11 {
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

    val W = 16

    // --- 1. append vs rebuild ---
    // base = the q101 shard; batch = a ~2% append (the deployment shape:
    // small batch against a large maintained base — q111's declared
    // batch is deliberately oversized to exercise every code path, this
    // probe prices the economics): a fresh slice plus tail-stripped
    // copies of base docs, ids strictly above the base ids
    val base = DedupQueries.augDocs(spark, sfDir)
      .where(pmod(col("doc_id"), lit(5)) === 0)
      .transform(graft.operators.Ckpt.eager(_))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // +1e9 offsets: strictly above every id any make_scale fixture mints
    // (replica shifts are 10M per copy, so the 100x fixture tops out
    // near 990M)
    val batch = docs.where(pmod(col("doc_id"), lit(97)) === 1)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .unionByName(docs
        .where(pmod(col("doc_id"), lit(5)) === 0 &&
          pmod(col("doc_id"), lit(97)) === 5)
        .select((col("doc_id") + 1100000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      .transform(graft.operators.Ckpt.eager(_))
    val nBase = base.count()
    val nBatch = batch.count()

    // the persisted artifacts a deployment holds from the PREVIOUS round
    val tmp = java.nio.file.Files.createTempDirectory("graft_r11").toString
    SubstringIndex.buildIndex(base, W).write.parquet(s"$tmp/index")
    SuffixArray.substringDeduped(base, W).write.parquet(s"$tmp/dedup")
    val index = spark.read.parquet(s"$tmp/index")
    val prior = spark.read.parquet(s"$tmp/dedup")

    val appendSec = floor {
      SubstringIndex.appendDeduped(base, prior, index, batch, W)
        .write.format("noop").mode("overwrite").save()
    }
    val rebuildSec = floor {
      SuffixArray.substringDeduped(base.unionByName(batch), W)
        .write.format("noop").mode("overwrite").save()
    }
    // the index-extension cost a deployment also pays per append
    val extendSec = floor {
      SubstringIndex.extendIndex(index, batch, W)
        .write.format("noop").mode("overwrite").save()
    }

    // --- 2. reliable-checkpoint tax on the suffix family ---
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_r11_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    def timedQuery(name: String): Double = floor {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val q101Local = timedQuery("q101_substring_removal")
    val q109Local = timedQuery("q109_eval_decontaminated")
    spark.conf.set(graft.operators.Ckpt.ReliableKey, "true")
    val q101Rel = timedQuery("q101_substring_removal")
    val q109Rel = timedQuery("q109_eval_decontaminated")
    spark.conf.set(graft.operators.Ckpt.ReliableKey, "false")

    println(
      s"""{"metric":"scale_r11","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_base":$nBase,"n_batch":$nBatch,""" +
      s""""append_sec":$appendSec,"rebuild_sec":$rebuildSec,""" +
      s""""extend_index_sec":$extendSec,""" +
      s""""q101_local_sec":$q101Local,"q101_reliable_sec":$q101Rel,""" +
      s""""q109_local_sec":$q109Local,"q109_reliable_sec":$q109Rel}""")
    spark.stop()
  }
}
