package graft

import graft.operators.{Ckpt, Clustering, Dedup}
import graft.queries.DedupQueries
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 incremental-family economics probe (dev tool, not a declared
  * query): for each family that gained an append path this round —
  * media fingerprints (q118), fuzzy keys (q120), semantic (q119) —
  * price the INCREMENTAL batch step (persisted base artifacts assumed,
  * built outside the timer) against the FROM-SCRATCH run over the union
  * (what a deployment without the artifacts re-runs every time). The
  * incremental walls exclude base-artifact construction by design: the
  * artifacts are amortized across appends, which is the entire claim.
  *
  * One JSON line; SPARK_GRAFT_SF_DIR picks the (possibly make_scale.py
  * replicated) fixture; repeats via SPARK_GRAFT_R12_REPEATS (floors). */
object BenchIncrR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R12_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def floorOf(body: => Unit): Double = (1 to repeats).map(_ => timed(body)).min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // The deployment shape: a FIXED ~1% batch appended onto a base that
    // GROWS with the scale fixture (make_scale replicas shift ids by
    // 10M per replica, so "replica 0" predicates pin the batch size
    // while the base absorbs every replica) — from-scratch re-runs grow
    // with the corpus, the append path should track the batch.

    // ---- MEDIA (image dHash) ----
    // from-scratch decodes + bands EVERYTHING; incremental decodes only
    // the batch and bands batch reps × (base reps ∪ batch reps)
    val media = DedupQueries.mediaFrame(spark, sfDir)
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
    val nDocs = ids.count()
    val isBatchM = pmod(col("media_id"), lit(97)) === 5 &&
      col("media_id") < 10000000L
    val baseHashes = Ckpt.eager(graft.operators.Multimodal.dHashes(
      media.where(!isBatchM)))
    val baseCompM = Dedup.hashComponents(baseHashes, 3)
    val batchMedia = media.where(isBatchM)
    val mediaIncr = floorOf {
      noop(Dedup.extendHashDeduped(ids, "doc_id", baseHashes, baseCompM,
        graft.operators.Multimodal.dHashes(batchMedia), maxHamming = 3))
    }
    val mediaScratch = floorOf {
      noop(Dedup.hashDeduped(ids, "doc_id",
        graft.operators.Multimodal.dHashes(media), maxHamming = 3))
    }
    // decode attribution: the term the incremental path avoids is the
    // BASE media decode — trivial on the synthetic 32×32 fixture, the
    // dominant cost on real media (ms–100ms per doc); report both sides
    // so the fixture walls can be extrapolated honestly
    val decodeFull = floorOf {
      noop(graft.operators.Multimodal.dHashes(media))
    }
    val decodeBatch = floorOf {
      noop(graft.operators.Multimodal.dHashes(batchMedia))
    }

    // ---- FUZZY keys: batch = the HIGHEST replica block's fuzz tiers
    // (extendFuzzyKeyPairs' append contract: batch ids must exceed every
    // stored rep — the fixed-size batch has to sit at the id top), base =
    // everything else ----
    val fk = DedupQueries.fuzzKeys(spark, sfDir)
    val maxBlock = fk.agg(max(col("doc_id"))).head().getLong(0) /
      10000000L * 10000000L
    val isFuzz = col("doc_id") >= maxBlock + 30000L &&
      col("doc_id") < maxBlock + 50000L
    val fBase = fk.where(!isFuzz)
    val fBatch = fk.where(isFuzz)
    val baseIdx = Ckpt.eager(Dedup.fuzzyVariantIndex(fBase, "key", "doc_id"))
    val baseAsgF = Ckpt.eager(Dedup.connectedComponents(
      Dedup.fuzzyKeyPairs(fBase, "key", "doc_id")
        .select(col("rep_a").as("id1"), col("rep_b").as("id2"))))
    val fuzzyIncr = floorOf {
      noop(Dedup.extendComponents(baseAsgF,
        Dedup.extendFuzzyKeyPairs(baseIdx, fBatch, "key", "doc_id")
          .select(col("rep_a").as("id1"), col("rep_b").as("id2"))))
    }
    val fuzzyScratch = floorOf {
      noop(Dedup.connectedComponents(
        Dedup.fuzzyKeyPairs(fk, "key", "doc_id")
          .select(col("rep_a").as("id1"), col("rep_b").as("id2"))))
    }

    // ---- SEMANTIC: batch = replica-0 jittered copies, base = rest ----
    val emb = DedupQueries.augEmb(spark, sfDir)
    val isBatch = col("vec_id") >= 10000L && col("vec_id") < 10000000L
    val sBase = emb.where(!isBatch)
    val sBatch = emb.where(isBatch)
    val k = Dedup.autoCells(sBase.count(), 256L)
    val cents = Clustering.kmeansCentroidsD(sBase, k, 3)
    val baseAsgS = Ckpt.eager(
      Clustering.assignVecWithCentroids(sBase, cents))
    val baseCompS = Ckpt.eager(Dedup.connectedComponents(
      Dedup.assignmentDupPairs(baseAsgS, 0.95).select("id1", "id2")))
    val semIncr = floorOf {
      noop(Dedup.extendSemanticDeduped(emb, "vec_id", baseAsgS,
        baseCompS, sBatch, cents, tau = 0.95))
    }
    val semScratch = floorOf {
      noop(Dedup.semanticDeduped(emb, k, 3, 0.95))
    }

    println(
      s"""{"metric":"incr_r12","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_docs":$nDocs,"n_batch_media":${batchMedia.count()},""" +
      s""""n_batch_fuzzy":${fBatch.count()},""" +
      s""""n_batch_sem":${sBatch.count()},""" +
      s""""media_incr_sec":$mediaIncr,"media_scratch_sec":$mediaScratch,""" +
      s""""media_decode_full_sec":$decodeFull,""" +
      s""""media_decode_batch_sec":$decodeBatch,""" +
      s""""fuzzy_incr_sec":$fuzzyIncr,"fuzzy_scratch_sec":$fuzzyScratch,""" +
      s""""sem_cells":$k,""" +
      s""""sem_incr_sec":$semIncr,"sem_scratch_sec":$semScratch}""")
    spark.stop()
  }
}
