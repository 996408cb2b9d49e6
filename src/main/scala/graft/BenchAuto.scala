package graft

import graft.operators.Dedup
import graft.queries.DedupQueries.{augDocs, augEmb}

/** Production-sizing scale probe (local tooling, like BenchAttr): runs the
  * AUTO-SIZED dedup entry points — the deployment paths whose knobs grow
  * with the corpus — on the same prepared corpora as the pinned-knob
  * declared queries (q23b / q26b / q70), so their wall-clock at the 100×
  * varied fixture can sit beside the declared queries' recorded creep
  * (BENCH_LOCAL_r08.md: q23b 157×, q26b 128×, q70 91× at PINNED knobs —
  * the knobs the oracle surface pins for determinism, not the knobs a
  * deployment would run).
  *
  * Also attributes the pinned-knob creep: for the q23b banding shape it
  * counts CANDIDATE pairs vs VERIFIED pairs at both knob sets. Candidates
  * ≈ verified means the wall is the corpus's own near-dup mass (the
  * varied fixture makes every replica family a true near-dup clique —
  * output the operator must emit); candidates ≫ verified is the random-
  * collision waste that sizing exists to kill.
  *
  * One JSON line on stdout: per-path seconds, output counts, and the
  * knobs the sizers chose.
  */
object BenchAuto {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    // Locale.ROOT: f"" uses the JVM default locale, which renders 1.5 as
    // "1,500" under comma-decimal locales — invalid JSON
    def put(k: String, v: Double): Unit = out += k ->
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def putL(k: String, v: Long): Unit = out += k -> v.toString

    // ---- text corpus: the q23b/q42/q57 document prep -------------------
    val docs = augDocs(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    putL("n_docs", nDocs)

    // attribution at the PINNED q23b knobs (16 hashes, 4 bands, tau 0.5):
    // candidate pairs vs verified pairs — the precision of the pinned
    // banding on this corpus shape
    val (candPinned, tCandP) = timed {
      Dedup.bandCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text", n = 3,
          numHashes = 16), 16, 4).count()
    }
    putL("minhash_pinned_candidates", candPinned)
    put("minhash_pinned_candidates_sec", tCandP)
    val (verPinned, tVerP) = timed {
      Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5,
        collapseExactDups = Some(false)).count()
    }
    putL("minhash_pinned_verified", verPinned)
    put("minhash_pinned_sec", tVerP)

    // the AUTO path at the production threshold (0.8): knobs from the
    // actual corpus count
    val (hAuto, bAuto) = Dedup.autoMinhashKnobs(nDocs, tau = 0.8)
    putL("minhash_auto_hashes", hAuto.toLong)
    putL("minhash_auto_bands", bAuto.toLong)
    val (candAuto, tCandA) = timed {
      Dedup.bandCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text", n = 3,
          numHashes = hAuto), hAuto, bAuto).count()
    }
    putL("minhash_auto_candidates", candAuto)
    put("minhash_auto_candidates_sec", tCandA)
    val (verAuto, tVerA) = timed {
      Dedup.nearDupPairsAuto(docs, "doc_id", "text", tau = 0.8)
    }
    val (verAutoN, tVerA2) = timed(verAuto.count())
    putL("minhash_auto_verified", verAutoN)
    put("minhash_auto_sec", tVerA + tVerA2)
    docs.unpersist(false)

    // ---- embedding corpus: the q25/q26/q70 vector prep -----------------
    val emb = augEmb(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEmb = emb.count()
    putL("n_emb", nEmb)

    // hyperplane-LSH near-dup with autoBits sizing (the q26b production
    // path; the declared query pins 6 bits — at 100× that is the measured
    // Σ bucket² creep)
    putL("lsh_auto_bits", Dedup.autoBits(nEmb).toLong)
    val (lshN, tLsh) = timed {
      Dedup.nearDupPairsLshAuto(emb, "vec_id", "embedding", tau = 0.95,
        nTables = 2).count()
    }
    putL("lsh_auto_pairs", lshN)
    put("lsh_auto_sec", tLsh)

    // semantic dedup with corpus-sized cells (the q70 production path;
    // the declared query pins nCells=8, which at 100× pays Σ cell²)
    val (semN, tSem) = timed {
      Dedup.semanticDedupedAuto(emb, knownCount = Some(nEmb)).count()
    }
    putL("semantic_auto_kept", semN)
    put("semantic_auto_sec", tSem)
    emb.unpersist(false)

    val line = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", s""","sf":"$sfDir"}""")
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_auto_last.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
