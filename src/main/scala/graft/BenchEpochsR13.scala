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
  *  - FingerprintStore: 128 one-k-row appends onto a 200k-print base;
  *    at 1/8/32/64/128 delta epochs, wall of a resolved `components`
  *    read and a full `kept` read (3 repeats, min); then `compact()`
  *    and the same reads at window=0.
  *  - SubstringDedupStore: 32 fifty-doc appends onto a 2k-doc base;
  *    wall of a resolved `deduped` read at 1/8/32; compact; re-read.
  *
  * Output: ONE JSON line; SCALE.md's auto-compaction section records
  * the curve and the chosen default threshold. */
object BenchEpochsR13 {
  def main(args: Array[String]): Unit = {
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

    // ---- fingerprint store: 128 delta epochs -------------------------
    val fpRoot = tmp("fp")
    val baseN = 200000L
    val s = FingerprintStore.init(spark, fpRoot, prints(0L, baseN))
    val ticks = Set(1L, 8L, 32L, 64L, 128L)
    val fpCompRows = scala.collection.mutable.LinkedHashMap[String, Double]()
    val fpKeptRows = scala.collection.mutable.LinkedHashMap[String, Double]()
    var appendWallFirst = 0.0
    var appendWallLast = 0.0
    val allIds = spark.range(0L, baseN + 128000L)
      .select(col("id").as("doc_id"))
    for (k <- 1L to 128L) {
      val w = timed {
        s.append(prints(baseN + (k - 1) * 1000L, 1000L))
      }
      if (k == 1L) appendWallFirst = w
      if (k == 128L) appendWallLast = w
      if (ticks(k)) {
        fpCompRows(s"$k") = floor3 { s.components.count() }
        fpKeptRows(s"$k") = floor3 { s.kept(allIds).count() }
      }
    }
    val preCompactComp = fpCompRows("128")
    s.compact()
    fpCompRows("post_compact") = floor3 { s.components.count() }
    fpKeptRows("post_compact") = floor3 { s.kept(allIds).count() }

    // ---- substring store: 32 delta epochs ----------------------------
    def docs(from: Long, n: Long) =
      spark.range(from, from + n)
        .select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 40).map(j =>
            md5(concat(col("id").cast("string"), lit(s":$j")))): _*)
            .as("text"))
    val subRoot = tmp("sub")
    val sub = SubstringDedupStore.init(spark, subRoot, docs(0L, 2000L), 8)
    val subTicks = Set(1L, 8L, 32L)
    val subRows = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (k <- 1L to 32L) {
      sub.append(docs(10000L + (k - 1) * 50L, 50L))
      if (subTicks(k)) subRows(s"$k") = floor3 { sub.deduped.count() }
    }
    sub.compact()
    subRows("post_compact") = floor3 { sub.deduped.count() }

    def fmt(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""$k":${math.rint(v * 1000) / 1000}""" }
        .mkString("{", ",", "}")

    println(s"""{"metric":"store_read_vs_delta_epochs","unit":"sec",""" +
      s""""fp_components":${fmt(fpCompRows)},""" +
      s""""fp_kept":${fmt(fpKeptRows)},""" +
      s""""sub_deduped":${fmt(subRows)},""" +
      s""""fp_append_wall_first":${math.rint(appendWallFirst * 1000) / 1000},""" +
      s""""fp_append_wall_last":${math.rint(appendWallLast * 1000) / 1000},""" +
      s""""fp_comp_128_over_1":${math.rint(preCompactComp / fpCompRows("1") * 100) / 100}}""")
    spark.stop()
  }
}
