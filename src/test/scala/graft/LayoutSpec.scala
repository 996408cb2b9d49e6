package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness, normalization bounds, and the
  * load-bearing claim — a z-ordered file layout bounds every file's
  * bounding box in BOTH dimensions, so a filter on the NON-leading
  * column prunes files that a single-column sort cannot. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zInterleave matches the reference Morton construction and stays " +
    "within k*bits result bits") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val rows = for (x <- 0L to 16L; y <- 0L to 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .withColumn("z", Layout.zInterleave(Seq(col("x"), col("y")), 5))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y, 5), s"($x,$y)")
      assert(z >= 0 && z < (1L << 10))
    }
    intercept[IllegalArgumentException] {
      Layout.zInterleave(Seq(col("x"), col("y")), 32) // 64 bits > 62
    }
  }

  test("normalizeInt is monotone, exact long arithmetic, lands in " +
    "[0, 2^bits)") {
    val vals = Seq(-50L, -49L, 0L, 1L, 99L, 100L)
    val got = vals.toDF("v")
      .withColumn("n", Layout.normalizeInt(col("v"), -50L, 100L, 8))
      .orderBy("v").as[(Long, Long)].collect()
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.head._2 == 0L && got.forall(r => r._2 >= 0 && r._2 < 256))
    // exact replay of (v - min) * 256 / 151
    got.foreach { case (v, n) => assert(n == (v + 50L) * 256L / 151L) }
  }

  test("zValue with pinned bounds is append-stable; derived bounds come " +
    "from one aggregation") {
    val a = (0L until 100L).map(i => (i, i % 10, i % 7)).toDF("id", "x", "y")
    val pinned = Some(Seq((0L, 9L), (0L, 6L)))
    val za = Layout.zValue(a, Seq("x", "y"), 4, pinned)
      .select("id", "zval").as[(Long, Long)].collect().toMap
    // append more rows: pinned bounds keep old zvals identical
    val b = (0L until 130L).map(i => (i, i % 10, i % 7)).toDF("id", "x", "y")
    val zb = Layout.zValue(b, Seq("x", "y"), 4, pinned)
      .select("id", "zval").as[(Long, Long)].collect().toMap
    za.foreach { case (id, z) => assert(zb(id) == z) }
  }

  test("z-ordered files prune a non-leading-column box; a linear sort " +
    "cannot (per-file min/max bounding boxes, 16 files)") {
    val n = 4096
    val df = (0 until n).map { i =>
      // decorrelated uniform grid via a fixed odd multiplier bijection
      val x = (i * 37) % 256
      val y = (i * 101) % 256
      (i.toLong, x.toLong, y.toLong)
    }.toDF("id", "x", "y")
    val base = java.nio.file.Files
      .createTempDirectory("graft_layout").toString
    Layout.zOrderLayout(df, Seq("x", "y"), files = 16, bits = 8)
      .write.mode("overwrite").parquet(s"$base/z")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .select("min(x)", "max(x)", "min(y)", "max(y)")
        .as[(Long, Long, Long, Long)].collect()
    // the y-only box a date-filter-on-an-id-sorted-lake would issue
    val (lo, hi) = (96L, 127L) // one 1/8 slab of y
    def touched(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (_, _, ymn, ymx) => ymx >= lo && ymn <= hi }
    val zt = touched(boxes(s"$base/z"))
    val lt = touched(boxes(s"$base/linear"))
    // 16 z-files tile a 4x4 grid: a 1/8 y-slab intersects one 4-file
    // row of the grid; every x-sorted file spans all of y
    assert(lt == 16, s"linear layout should touch all files, got $lt")
    assert(zt <= 6, s"z layout should touch ~4 of 16 files, got $zt")
  }
}
