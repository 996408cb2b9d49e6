package graft

import graft.api.SubstringDedupStore
import graft.operators.SuffixArray
import graft.queries.DedupQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-12 store-economics probe (dev tool, not a declared query): the
  * DELTA-epoch [[SubstringDedupStore]]'s write-volume claim, measured —
  * per-append bytes/rows written to the epoch's index+deduped
  * directories versus the FULL artifact size the round-11 design
  * rewrote every epoch (the resolved snapshot the same state compacts
  * to), plus the wall-clock rows BenchStoreR11 tracked:
  *
  *  - `init_sec` / `append_sec` / `reopen_read_sec` / `rebuild_sec`:
  *    as in bench_r11_store.json (same fixtures, comparable numbers);
  *  - `append_write_rows` / `append_write_bytes`: the epoch-1 delta
  *    directories' contents (index + deduped);
  *  - `full_rows` / `full_bytes`: the compacted snapshot of the SAME
  *    state — what a full rewrite would have written;
  *  - `compact_sec`: the optional maintenance rewrite, priced.
  *
  * One JSON line, the Bench* pattern; SPARK_GRAFT_SF_DIR picks the
  * fixture; repeats via SPARK_GRAFT_R12_REPEATS (fresh root each). */
object BenchStoreR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R12_REPEATS", "3").toInt
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
    def dirBytes(root: String, rels: Seq[String]): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      rels.map { r =>
        val p = new org.apache.hadoop.fs.Path(s"$root/$r")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }.sum
    }

    var initS, appendS, reopenS, compactS = Double.MaxValue
    var deltaRows, deltaBytes, fullRows, fullBytes = 0L
    (1 to repeats).foreach { r =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_store12_r$r").toString + "/store"
      initS = math.min(initS, timed {
        SubstringDedupStore.init(spark, root, base, W)
      })
      val s = SubstringDedupStore.open(spark, root, W)
      appendS = math.min(appendS, timed { s.append(batch) })
      deltaBytes = dirBytes(root,
        Seq("index/epoch=1", "deduped/epoch=1"))
      deltaRows = spark.read.parquet(s"$root/index/epoch=1").count() +
        spark.read.parquet(s"$root/deduped/epoch=1").count()
      reopenS = math.min(reopenS, timed {
        SubstringDedupStore.open(spark, root, W).deduped
          .write.format("noop").mode("overwrite").save()
      })
      compactS = math.min(compactS, timed { s.compact() })
      // the compacted snapshot IS the full artifact a per-epoch full
      // rewrite (the round-11 design) would have written on the append
      fullBytes = dirBytes(root, Seq("index/epoch=2", "deduped/epoch=2"))
      fullRows = spark.read.parquet(s"$root/index/epoch=2").count() +
        spark.read.parquet(s"$root/deduped/epoch=2").count()
    }
    val rebuildS = (1 to repeats).map { _ =>
      timed {
        SuffixArray.substringDeduped(base.unionByName(batch), W)
          .write.format("noop").mode("overwrite").save()
      }
    }.min

    println(
      s"""{"metric":"store_r12","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_base":$nBase,"n_batch":$nBatch,""" +
      s""""init_sec":$initS,"append_sec":$appendS,""" +
      s""""reopen_read_sec":$reopenS,"compact_sec":$compactS,""" +
      s""""rebuild_sec":$rebuildS,""" +
      s""""append_write_rows":$deltaRows,"append_write_bytes":$deltaBytes,""" +
      s""""full_rows":$fullRows,"full_bytes":$fullBytes}""")
    spark.stop()
  }
}
