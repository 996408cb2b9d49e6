package graft

import graft.api.{FingerprintStore, FuzzyKeyStore, SemanticDedupStore}
import graft.operators.{Ckpt, Dedup}
import graft.queries.DedupQueries
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 session-2 store-economics probe (dev tool, not a declared
  * query): END-TO-END pricing of the three durable stores that complete
  * the family beside [[graft.api.SubstringDedupStore]] (priced in
  * bench_r12_store.json) — [[FingerprintStore]], [[FuzzyKeyStore]],
  * [[SemanticDedupStore]]. For each: init wall (the amortized one-time
  * artifact build, reported but outside the claim), the APPEND wall
  * (compute + epoch writes + commit), the epoch's write volume in
  * rows/bytes, a cold reopen + full kept-read, and the from-scratch
  * recompute a deployment without the store re-runs per batch (the
  * BenchIncrR12 scratch chains, noop-written). Same fixture splits as
  * BenchIncrR12 so the compute-only and store-level rows line up.
  *
  * One JSON line; SPARK_GRAFT_SF_DIR picks the (possibly make_scale.py
  * replicated) fixture; repeats via SPARK_GRAFT_R12_REPEATS (floors,
  * fresh store root each repeat). */
object BenchStoreR12b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R12_REPEATS", "3").toInt
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
      var bytes = 0L
      var rows = 0L
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
    def tmp(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_store12b_$tag").toString + "/store"

    // ---- FINGERPRINT store (media dHash; the BenchIncrR12 split) ----
    val media = DedupQueries.mediaFrame(spark, sfDir)
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
    val isBatchM = pmod(col("media_id"), lit(97)) === 5 &&
      col("media_id") < 10000000L
    val baseHashes = Ckpt.eager(graft.operators.Multimodal.dHashes(
      media.where(!isBatchM)).select(col("_id"), col("simhash")))
    val batchHashes = Ckpt.eager(graft.operators.Multimodal.dHashes(
      media.where(isBatchM)).select(col("_id"), col("simhash")))
    var fpInit, fpAppend, fpRead = Double.MaxValue
    var fpRows, fpBytes = 0L
    (1 to repeats).foreach { _ =>
      val root = tmp("fp")
      fpInit = math.min(fpInit,
        timed { FingerprintStore.init(spark, root, baseHashes) })
      val s = FingerprintStore.open(spark, root)
      fpAppend = math.min(fpAppend, timed { s.append(batchHashes) })
      val (r, b) = dirStats(root, Seq("prints/epoch=1", "comp/epoch=1"))
      fpRows = r; fpBytes = b
      fpRead = math.min(fpRead, timed {
        noop(FingerprintStore.open(spark, root).kept(ids))
      })
    }
    val fpScratch = (1 to repeats).map(_ => timed {
      noop(Dedup.hashDeduped(ids, "doc_id",
        graft.operators.Multimodal.dHashes(media), maxHamming = 3))
    }).min

    // ---- FUZZY-KEY store (the BenchIncrR12 top-block split) ----
    val fk = DedupQueries.fuzzKeys(spark, sfDir)
    val maxBlock = fk.agg(max(col("doc_id"))).head().getLong(0) /
      10000000L * 10000000L
    val isFuzz = col("doc_id") >= maxBlock + 30000L &&
      col("doc_id") < maxBlock + 50000L
    val fBase = Ckpt.eager(fk.where(!isFuzz))
    val fBatch = Ckpt.eager(fk.where(isFuzz))
    var fzInit, fzAppend, fzRead = Double.MaxValue
    var fzRows, fzBytes = 0L
    (1 to repeats).foreach { _ =>
      val root = tmp("fz")
      fzInit = math.min(fzInit,
        timed { FuzzyKeyStore.init(spark, root, fBase) })
      val s = FuzzyKeyStore.open(spark, root)
      fzAppend = math.min(fzAppend, timed { s.append(fBatch) })
      val (r, b) = dirStats(root,
        Seq("keys/epoch=1", "index/epoch=1", "comp/epoch=1"))
      fzRows = r; fzBytes = b
      fzRead = math.min(fzRead, timed {
        noop(FuzzyKeyStore.open(spark, root).keptKeys)
      })
    }
    val fzScratch = (1 to repeats).map(_ => timed {
      val u = fBase.unionByName(fBatch)
      val keys = u.where(length(col("key")) > 0)
        .groupBy("key")
        .agg(min(col("doc_id").cast("long")).as("rep"),
          count(lit(1)).as("cnt"))
      noop(Dedup.dedupedCorpusCC(keys, "rep",
        Dedup.fuzzyKeyPairs(u, "key", "doc_id")
          .select(col("rep_a").as("id1"), col("rep_b").as("id2"))))
    }).min

    // ---- SEMANTIC store (the BenchIncrR12 replica-0 split) ----
    val emb = DedupQueries.augEmb(spark, sfDir)
    val isBatchS = col("vec_id") >= 10000L && col("vec_id") < 10000000L
    val sBase = Ckpt.eager(emb.where(!isBatchS))
    val sBatch = Ckpt.eager(emb.where(isBatchS))
    val k = Dedup.autoCells(sBase.count(), 256L)
    var smInit, smAppend, smRead = Double.MaxValue
    var smRows, smBytes = 0L
    (1 to repeats).foreach { _ =>
      val root = tmp("sm")
      smInit = math.min(smInit, timed {
        SemanticDedupStore.init(spark, root, sBase, k, 3, 0.95,
          maxStaleFrac = 1.0)
      })
      val s = SemanticDedupStore.open(spark, root, 0.95,
        maxStaleFrac = 1.0)
      smAppend = math.min(smAppend, timed { s.append(sBatch) })
      val (r, b) = dirStats(root,
        Seq("vecs/epoch=1", "asg/epoch=1", "comp/epoch=1"))
      smRows = r; smBytes = b
      smRead = math.min(smRead, timed {
        noop(SemanticDedupStore.open(spark, root, 0.95, 1.0).kept(emb))
      })
    }
    val smScratch = (1 to repeats).map(_ => timed {
      noop(Dedup.semanticDeduped(emb, k, 3, 0.95))
    }).min

    println(
      s"""{"metric":"store_r12b","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_base_fp":${baseHashes.count()},"n_batch_fp":${batchHashes.count()},""" +
      s""""fp_init_sec":$fpInit,"fp_append_sec":$fpAppend,""" +
      s""""fp_read_sec":$fpRead,"fp_scratch_sec":$fpScratch,""" +
      s""""fp_epoch_rows":$fpRows,"fp_epoch_bytes":$fpBytes,""" +
      s""""n_base_fz":${fBase.count()},"n_batch_fz":${fBatch.count()},""" +
      s""""fz_init_sec":$fzInit,"fz_append_sec":$fzAppend,""" +
      s""""fz_read_sec":$fzRead,"fz_scratch_sec":$fzScratch,""" +
      s""""fz_epoch_rows":$fzRows,"fz_epoch_bytes":$fzBytes,""" +
      s""""n_base_sm":${sBase.count()},"n_batch_sm":${sBatch.count()},""" +
      s""""sm_cells":$k,"sm_init_sec":$smInit,"sm_append_sec":$smAppend,""" +
      s""""sm_read_sec":$smRead,"sm_scratch_sec":$smScratch,""" +
      s""""sm_epoch_rows":$smRows,"sm_epoch_bytes":$smBytes}""")
    spark.stop()
  }
}
