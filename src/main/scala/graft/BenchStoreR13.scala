package graft

import graft.api.MinHashDedupStore
import graft.operators.{Ckpt, Dedup}
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 store-economics probe for the NEW [[MinHashDedupStore]]
  * (dev tool, not a declared query) — the BenchStoreR12b pricing
  * discipline applied to the fifth store: init wall (the amortized
  * one-time signature+closure build), the APPEND wall (batch shingling
  * + batch×batch and batch×stored banding + closure extension + delta
  * epoch writes + commit), the epoch's write volume in rows/bytes, a
  * cold reopen + full kept-read off the persisted artifacts, and the
  * from-scratch recompute a deployment without the store re-runs per
  * batch (nearDupPairs over the union + closure + kept). The BenchIncrR12
  * split discipline: batch = pmod(doc_id, 97) == 5 (~1% of the corpus —
  * the deployment shape, a small crawl batch against a big stored base)
  * so the split scales with make_scale.py-replicated fixtures.
  *
  * One JSON line; SPARK_GRAFT_SF_DIR picks the (possibly replicated)
  * fixture; repeats via SPARK_GRAFT_R13_REPEATS (floors, fresh store
  * root each repeat). */
object BenchStoreR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R13_REPEATS", "3").toInt
    // store | scratch | both — the 100x decade needs the two halves in
    // separate JVM invocations to fit a ten-minute budget
    val bpart = sys.env.getOrElse("SPARK_GRAFT_R13_PART", "both")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sparkContext.hadoopConfiguration

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def dirStats(root: String, rels: Seq[String]): (Long, Long) = {
      var bytes = 0L; var rows = 0L
      rels.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(s"$root/$r")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) {
          bytes += fs.getContentSummary(p).getLength
          rows += spark.read.parquet(s"$root/$r").count()
        }
      }
      (rows, bytes)
    }
    def tmp(): String = java.nio.file.Files
      .createTempDirectory("graft_store13_mh").toString + "/store"

    val aug = DedupQueries.augDocs(spark, sfDir)
    val isBatch = pmod(col("doc_id"), lit(97)) === 5
    val base = Ckpt.eager(aug.where(!isBatch))
    val batch = Ckpt.eager(aug.where(isBatch))
    val allIds = aug.select("doc_id")
    val nBase = base.count(); val nBatch = batch.count()

    var mhInit, mhAppend, mhRead = Double.MaxValue
    var mhRows, mhBytes = 0L
    var root = ""
    if (bpart != "scratch") (1 to repeats).foreach { i =>
      root = tmp()
      mhInit = math.min(mhInit,
        timed { MinHashDedupStore.init(spark, root, base, 0.5) })
      System.err.println(s"[r13] rep $i init done: $mhInit s")
      val s = MinHashDedupStore.open(spark, root, 0.5)
      mhAppend = math.min(mhAppend, timed { s.append(batch) })
      System.err.println(s"[r13] rep $i append done: $mhAppend s")
      val (r, b) = dirStats(root, Seq("sig/epoch=1", "comp/epoch=1"))
      mhRows = r; mhBytes = b
      mhRead = math.min(mhRead, timed {
        noop(MinHashDedupStore.open(spark, root, 0.5).kept(allIds))
      })
    }
    val (initRows, initBytes) =
      if (bpart == "scratch") (0L, 0L)
      else dirStats(root, Seq("sig/epoch=0", "comp/epoch=0"))
    val mhScratch =
      if (bpart == "store") -1.0
      else (1 to repeats).map(_ => timed {
        noop(Dedup.dedupedCorpusCC(allIds, "doc_id",
          Dedup.nearDupPairs(aug, "doc_id", "text", 0.5)
            .select("id1", "id2")))
      }).min

    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    println(s"""{"metric":"minhash_store_economics","unit":"sec",""" +
      s""""sf_dir":"$sfDir","n_base":$nBase,"n_batch":$nBatch,""" +
      s""""init_wall":${r3(mhInit)},"append_wall":${r3(mhAppend)},""" +
      s""""epoch1_rows":$mhRows,"epoch1_bytes":$mhBytes,""" +
      s""""epoch0_rows":$initRows,"epoch0_bytes":$initBytes,""" +
      s""""kept_read_wall":${r3(mhRead)},""" +
      s""""scratch_wall":${r3(mhScratch)}}""")
    spark.stop()
  }
}
