package graft

import graft.api.SubstringDedupStore
import graft.operators.SuffixArray
import graft.queries.DedupQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-11 store-economics probe (dev tool, not a declared query): the
  * END-TO-END cost of [[SubstringDedupStore]] — artifact I/O included,
  * unlike the compute-only rows in bench_r11_scale.json:
  *
  *  - `init_sec`: build index + from-scratch dedup + write all three
  *    epoch-0 artifacts + commit;
  *  - `append_sec`: incremental dedup + index extension + epoch-1
  *    artifact writes + commit (what a deployment pays per append);
  *  - `reopen_read_sec`: open from disk + materialize the deduped
  *    corpus (the dataloader-side cost);
  *  - `rebuild_sec`: the from-scratch compute of the union for
  *    reference (no writes — the floor the append path competes with
  *    BEFORE its durability advantage).
  *
  * One JSON line, the Bench* pattern; SPARK_GRAFT_SF_DIR picks the
  * fixture. Repeats report floors via SPARK_GRAFT_R11_REPEATS (each
  * repeat uses a fresh store root). */
object BenchStoreR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R11_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val W = 16

    val base = DedupQueries.augDocs(spark, sfDir)
      .where(pmod(col("doc_id"), lit(5)) === 0)
      .transform(graft.operators.Ckpt.eager(_))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
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

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    var initS, appendS, reopenS = Double.MaxValue
    (1 to repeats).foreach { r =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_store_r$r").toString + "/store"
      initS = math.min(initS, timed {
        SubstringDedupStore.init(spark, root, base, W)
      })
      val s = SubstringDedupStore.open(spark, root, W)
      appendS = math.min(appendS, timed { s.append(batch) })
      reopenS = math.min(reopenS, timed {
        SubstringDedupStore.open(spark, root, W).deduped
          .write.format("noop").mode("overwrite").save()
      })
    }
    val rebuildS = (1 to repeats).map { _ =>
      timed {
        SuffixArray.substringDeduped(base.unionByName(batch), W)
          .write.format("noop").mode("overwrite").save()
      }
    }.min

    println(
      s"""{"metric":"store_r11","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_base":$nBase,"n_batch":$nBatch,""" +
      s""""init_sec":$initS,"append_sec":$appendS,""" +
      s""""reopen_read_sec":$reopenS,"rebuild_sec":$rebuildS}""")
    spark.stop()
  }
}
