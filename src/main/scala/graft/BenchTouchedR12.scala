package graft

import graft.operators.{Ckpt, SubstringIndex, SuffixArray}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Round-12 ADVERSARIAL touched-set probe (dev tool, not a declared
  * query): [[SubstringIndex.appendDeduped]]'s cost is batch + TOUCHED
  * work, and the bench fixtures keep touched small; this probe drives
  * touched toward the whole base — batches that near-copy a growing
  * fraction f of the base corpus verbatim, so (almost) every copied
  * doc's base-unique windows become duplicated and the doc lands in the
  * recompute set — and measures where append stops beating a
  * from-scratch rebuild of the union.
  *
  * Per f ∈ {0, ¼, ½, 1}: `touched` (measured via the package-private
  * touched probe), `append_sec` (appendDeduped over the prebuilt index,
  * noop write) and `rebuild_sec` (from-scratch substringDeduped over
  * the union, noop write). One JSON line; SPARK_GRAFT_SF_DIR picks the
  * fixture, repeats via SPARK_GRAFT_R12_REPEATS (floors). SCALE.md
  * documents the measured crossover. */
object BenchTouchedR12 {
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
      .transform(Ckpt.eager(_))
    val nBase = base.count()
    val baseDeduped = Ckpt.eager(SuffixArray.substringDeduped(base, W))
    val index = Ckpt.eager(SubstringIndex.buildIndex(base, W))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val rows = Seq(0.0, 0.25, 0.5, 1.0).map { f =>
      // f = 0: a FRESH batch (the deployment-shape control, ~1/97 of the
      // base); f > 0: verbatim near-copies of the lowest-md5 f-fraction
      // of base docs (ids shifted above every base id), the adversarial
      // shape — every copied doc with a base-unique window is touched
      val batch =
        if (f == 0.0)
          base.where(pmod(col("doc_id"), lit(97)) === 5)
            .select((col("doc_id") + 2000000000L).as("doc_id"),
              regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
            .transform(Ckpt.eager(_))
        else {
          val k = math.max(1L, (f * nBase).toLong)
          base.orderBy(graft.operators.Dedup
              .md5Long(col("doc_id").cast("string")), col("doc_id"))
            .limit(k.toInt)
            .select((col("doc_id") + 2000000000L).as("doc_id"),
              col("text"))
            .transform(Ckpt.eager(_))
        }
      val nBatch = batch.count()
      val touched = SubstringIndex.touchedBaseIds(index,
        SubstringIndex.windowKeys(batch, W)
          .groupBy("k1", "k2").agg(count(lit(1)).as("_no"))).count()
      val appendS = (1 to repeats).map { _ =>
        timed {
          SubstringIndex.appendDeduped(base, baseDeduped, index, batch, W)
            .write.format("noop").mode("overwrite").save()
        }
      }.min
      val rebuildS = (1 to repeats).map { _ =>
        timed {
          SuffixArray.substringDeduped(base.unionByName(batch), W)
            .write.format("noop").mode("overwrite").save()
        }
      }.min
      s"""{"f":$f,"n_batch":$nBatch,"touched":$touched,""" +
        s""""append_sec":$appendS,"rebuild_sec":$rebuildS}"""
    }
    println(
      s"""{"metric":"touched_r12","sf":"$sfDir","repeats":$repeats,""" +
      s""""n_base":$nBase,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
