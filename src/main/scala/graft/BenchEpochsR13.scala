package graft

import graft.api.{FingerprintStore, SubstringDedupStore}
import org.apache.spark.sql.functions._

/** Round-13 auto-compaction economics probe (dev tool, not a declared
  * query): MEASURE the read-cost-vs-delta-epoch-count curve the
  * `autoCompactEpochs` knob is sized from. A store that never compacts
  * resolves reads latest-wins/union over every delta epoch since the
  * snapshot; the machinery is O(1) per epoch in WRITE volume, but the
  * READ side pays (a) file-listing + scan fan-in across epoch
  * directories and (b) the window/union over their rows. This prices
  * that growth directly:
  *
  *  - FingerprintStore: 32 five-hundred-row appends onto a 50k-print
  *    base; at 1/8/16/32 delta epochs, wall of a resolved `components`
  *    read, a full `kept` read, AND the append itself (whose
  *    extendComponents/delta stages read the same window — the
  *    append-wall series is the curve's sharpest expression); then
  *    `compact()` and the same reads at window=0.
  *  - SubstringDedupStore: 32 fifty-doc appends onto a 2k-doc base;
  *    wall of a resolved `deduped` read at 1/8/32; compact; re-read.
  *
  * Output: ONE JSON line per part; SPARK_GRAFT_EPOCHS_PART selects
  * `fp` or `sub` (each fits a ten-minute budget on a busy box).
  * SCALE.md's auto-compaction section records the curve and the chosen
  * default threshold. */
object BenchEpochsR13 {
  def main(args: Array[String]): Unit = {
    val part = sys.env.getOrElse("SPARK_GRAFT_EPOCHS_PART", "fp")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def floor3(body: => Unit): Double =
      (1 to 3).map(_ => timed(body)).min

    def tmp(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_epochs_$tag").toString + "/store"

    // mix the id into a well-spread 40-bit print so random pairs are
    // (almost surely) > 3 hamming apart — extension stays cheap and the
    // curve isolates RESOLUTION cost, not clustering cost
    def prints(from: Long, n: Long) =
      spark.range(from, from + n)
        .select(col("id").as("_id"),
          pmod(graft.operators.Dedup.md5Long(col("id").cast("string")),
            lit(1L << 40)).as("simhash"))

    def fmt(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""$k":${math.rint(v * 1000) / 1000}""" }
        .mkString("{", ",", "}")
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    if (part == "fp") {
      val fpRoot = tmp("fp")
      val baseN = 50000L
      val s = FingerprintStore.init(spark, fpRoot, prints(0L, baseN))
      val ticks = Set(1L, 8L, 16L, 32L)
      val fpCompRows =
        scala.collection.mutable.LinkedHashMap[String, Double]()
      val fpKeptRows =
        scala.collection.mutable.LinkedHashMap[String, Double]()
      val fpAppendWall =
        scala.collection.mutable.LinkedHashMap[String, Double]()
      val allIds = spark.range(0L, baseN + 16000L)
        .select(col("id").as("doc_id"))
      for (k <- 1L to 32L) {
        val w = timed {
          s.append(prints(baseN + (k - 1) * 500L, 500L))
        }
        if (ticks(k)) {
          fpAppendWall(s"$k") = w
          fpCompRows(s"$k") = floor3 { s.components.count() }
          fpKeptRows(s"$k") = floor3 { s.kept(allIds).count() }
        }
      }
      val preCompactComp = fpCompRows("32")
      s.compact()
      fpCompRows("post_compact") = floor3 { s.components.count() }
      fpKeptRows("post_compact") = floor3 { s.kept(allIds).count() }
      fpAppendWall("post_compact") = timed {
        s.append(prints(baseN + 32L * 500L, 500L))
      }
      println(s"""{"metric":"store_read_vs_delta_epochs_fp","unit":"sec",""" +
        s""""fp_components":${fmt(fpCompRows)},""" +
        s""""fp_kept":${fmt(fpKeptRows)},""" +
        s""""fp_append_wall":${fmt(fpAppendWall)},""" +
        s""""fp_comp_32_over_1":${math.rint(preCompactComp / fpCompRows("1") * 100) / 100}}""")
    } else {
      def docs(from: Long, n: Long) =
        spark.range(from, from + n)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 40).map(j =>
              md5(concat(col("id").cast("string"), lit(s":$j")))): _*)
              .as("text"))
      val subRoot = tmp("sub")
      val sub = SubstringDedupStore.init(spark, subRoot, docs(0L, 2000L), 8)
      val subTicks = Set(1L, 8L, 32L)
      val subRows =
        scala.collection.mutable.LinkedHashMap[String, Double]()
      for (k <- 1L to 32L) {
        sub.append(docs(10000L + (k - 1) * 50L, 50L))
        if (subTicks(k)) subRows(s"$k") = floor3 { sub.deduped.count() }
      }
      sub.compact()
      subRows("post_compact") = floor3 { sub.deduped.count() }
      println(s"""{"metric":"store_read_vs_delta_epochs_sub","unit":"sec",""" +
        s""""sub_deduped":${fmt(subRows)}}""")
    }
    spark.stop()
  }
}
