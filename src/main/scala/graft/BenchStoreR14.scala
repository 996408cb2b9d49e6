package graft

import graft.api.{FingerprintStore, MinHashDedupStore, SubstringDedupStore}
import graft.operators.{Ckpt, Dedup}
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 append-economics probe (dev tool, not a declared query):
  * measures what the banded-projection / hash-group / key-restricted
  * artifacts bought — the APPEND WALL as a function of BASE SIZE — for
  * the three stores whose r13 appends carried a base-linear term:
  *
  *  - MinHash: the base signature frame used to be re-collapsed (a full
  *    window shuffle) and re-banded per batch; now the batch bands
  *    against a SCAN of the persisted (band, bhash, id) projection
  *    (r13 100× wall: 42.4 s, dominated by that re-band);
  *  - Fingerprint: the stored prints used to be re-aggregated
  *    (hashGroups) per batch; now the maintained grp artifact resolves
  *    key-restricted and the banded join scans the plain union;
  *  - Substring: the full index used to resolve through a corpus-wide
  *    latest-wins window per append; now resolution is key-restricted
  *    to the batch/touched keys.
  *
  * Fixture discipline = BenchStoreR13: batch = pmod(doc_id, 97) == 5
  * (~1% of the corpus), base = the rest, over the make_scale-varied
  * fixtures so the BASE grows 10×/100× while the batch stays ~1%. The
  * store inits ONCE per decade (the amortized cost, reported), then the
  * append wall is the min over SPARK_GRAFT_R14_REPEATS appends of
  * further disjoint ~1% batches (pmod residues 6, 7, …) — each against
  * the grown store, the deployment shape. SPARK_GRAFT_R14_STORES picks
  * a comma list of {mh, fp, sub}. One JSON line per store. */
object BenchStoreR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R14_REPEATS", "3").toInt
    val stores = sys.env.getOrElse("SPARK_GRAFT_R14_STORES", "mh,fp,sub")
      .split(",").map(_.trim).toSet
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tmp(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_store14_$tag").toString + "/store"
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    val aug = DedupQueries.augDocs(spark, sfDir)
    def slice(res: Int): DataFrame =
      Ckpt.eager(aug.where(pmod(col("doc_id"), lit(97)) === res))
    val base = Ckpt.eager(aug.where(pmod(col("doc_id"), lit(97)) =!= 5 &&
      pmod(col("doc_id"), lit(97)) =!= 6 &&
      pmod(col("doc_id"), lit(97)) =!= 7))
    val nBase = base.count()
    val allIds = aug.select("doc_id")

    if (stores("mh")) {
      val root = tmp("mh")
      val init = timed { MinHashDedupStore.init(spark, root, base, 0.5) }
      System.err.println(s"[r14] mh init done: $init s")
      val s = MinHashDedupStore.open(spark, root, 0.5)
      val appends = Seq(5, 6, 7).take(math.max(1, repeats)).map { res =>
        val b = slice(res)
        val n = b.count()
        val w = timed { s.append(b) }
        System.err.println(s"[r14] mh append res=$res: $w s ($n rows)")
        (n, w)
      }
      val read = timed {
        noop(MinHashDedupStore.open(spark, root, 0.5).kept(allIds))
      }
      println(s"""{"metric":"mh_append_r14","unit":"sec",""" +
        s""""sf_dir":"$sfDir","n_base":$nBase,""" +
        s""""init_wall":${r3(init)},""" +
        s""""appends":[${appends.map(a =>
          s"""{"n_batch":${a._1},"wall":${r3(a._2)}}""").mkString(",")}],""" +
        s""""append_wall_min":${r3(appends.map(_._2).min)},""" +
        s""""kept_read_wall":${r3(read)}}""")
    }

    if (stores("fp")) {
      val root = tmp("fp")
      val prints = Ckpt.eager(
        Dedup.simhashes(base, "doc_id", "text"))
      val init = timed { FingerprintStore.init(spark, root, prints) }
      System.err.println(s"[r14] fp init done: $init s")
      val s = FingerprintStore.open(spark, root)
      val appends = Seq(5, 6, 7).take(math.max(1, repeats)).map { res =>
        val b = Ckpt.eager(Dedup.simhashes(slice(res), "doc_id", "text"))
        val n = b.count()
        val w = timed { s.append(b) }
        System.err.println(s"[r14] fp append res=$res: $w s ($n rows)")
        (n, w)
      }
      val read = timed {
        noop(FingerprintStore.open(spark, root).kept(allIds))
      }
      println(s"""{"metric":"fp_append_r14","unit":"sec",""" +
        s""""sf_dir":"$sfDir","n_base":$nBase,""" +
        s""""init_wall":${r3(init)},""" +
        s""""appends":[${appends.map(a =>
          s"""{"n_batch":${a._1},"wall":${r3(a._2)}}""").mkString(",")}],""" +
        s""""append_wall_min":${r3(appends.map(_._2).min)},""" +
        s""""kept_read_wall":${r3(read)}}""")
    }

    if (stores("sub")) {
      // the substring store's append contract needs batch ids STRICTLY
      // above the base — reslice by id order instead of residue
      val mx = aug.agg(max(col("doc_id"))).head.getLong(0)
      val cut = mx * 97 / 100
      val sBase = Ckpt.eager(aug.where(col("doc_id") <= cut))
      val nSB = sBase.count()
      val rest = Ckpt.eager(aug.where(col("doc_id") > cut)
        .withColumn("_r", pmod(col("doc_id"), lit(3))))
      val root = tmp("sub")
      val init = timed { SubstringDedupStore.init(spark, root, sBase, 8) }
      System.err.println(s"[r14] sub init done: $init s")
      val s = SubstringDedupStore.open(spark, root, 8)
      // three id-ordered sub-batches of the top 3%
      val appends = (0 to 2).take(math.max(1, repeats)).map { k =>
        val lo = cut + (mx - cut) * k / 3
        val hi = cut + (mx - cut) * (k + 1) / 3
        val b = rest.where(col("doc_id") > lo &&
          (if (k == 2) lit(true) else col("doc_id") <= hi))
          .select("doc_id", "text")
        val n = b.count()
        val w = timed { s.append(b) }
        System.err.println(s"[r14] sub append $k: $w s ($n rows)")
        (n, w)
      }
      val read = timed {
        noop(SubstringDedupStore.open(spark, root, 8).deduped)
      }
      println(s"""{"metric":"sub_append_r14","unit":"sec",""" +
        s""""sf_dir":"$sfDir","n_base":$nSB,""" +
        s""""init_wall":${r3(init)},""" +
        s""""appends":[${appends.map(a =>
          s"""{"n_batch":${a._1},"wall":${r3(a._2)}}""").mkString(",")}],""" +
        s""""append_wall_min":${r3(appends.map(_._2).min)},""" +
        s""""kept_read_wall":${r3(read)}}""")
    }
    spark.stop()
  }
}
