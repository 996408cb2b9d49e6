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
    // exact replay of (v - min) // ceil(151 / 256) — cell width 1 here
    got.foreach { case (v, n) => assert(n == (v + 50L) / ((150L >> 8) + 1L)) }
    // a range wider than 2^bits actually buckets (width > 1)
    val wide = Seq(0L, 999L, 123456L, 999999L).toDF("v")
      .withColumn("n", Layout.normalizeInt(col("v"), 0L, 999999L, 8))
      .orderBy("v").as[(Long, Long)].collect()
    val w = (999999L >> 8) + 1L
    wide.foreach { case (v, n) => assert(n == v / w && n < 256) }
  }

  test("normalizeInt survives full-long-scale ranges where mul-first " +
    "arithmetic wraps (range >= 2^47 at bits=16)") {
    val maxV = Long.MaxValue - 1L
    val vals = Seq(0L, 1L << 40, 1L << 62, maxV)
    val got = vals.toDF("v")
      .withColumn("n", Layout.normalizeInt(col("v"), 0L, maxV, 16))
      .orderBy("v").as[(Long, Long)].collect()
    val w = ((maxV - 0L) >> 16) + 1L
    got.foreach { case (v, n) =>
      assert(n == v / w, s"v=$v") // exact div-first replay, no wrap
      assert(n >= 0 && n < (1L << 16))
    }
    // the old mul-first form would have wrapped (1L<<62)*65536 negative
    // and clamped it to bucket 0; div-first puts it in the top quarter
    assert(got.find(_._1 == (1L << 62)).get._2 >= (1L << 14))
    // out-of-bounds values clamp BEFORE arithmetic — no wrap either side
    val clamped = Seq(Long.MinValue, Long.MaxValue).toDF("v")
      .withColumn("n", Layout.normalizeInt(col("v"), -10L, 10L, 4))
      .as[(Long, Long)].collect().map(_._2).sorted
    assert(clamped.toSeq == Seq(0L, 10L)) // edge buckets: 0 and 20/w=10
    // a span wider than a long fails loudly instead of wrapping
    intercept[ArithmeticException] {
      Layout.normalizeInt(col("v"), Long.MinValue, Long.MaxValue, 16)
    }
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

  test("compactStore(zorderBy): one maintenance pass collapses files AND " +
    "z-clusters them — both seq-slab and ts-slab scans prune, while the " +
    "content-hashed compaction prunes neither; data bit-identical") {
    import graft.api.TemporalVectorDB
    import graft.operators.VersionStore
    def freshDb(): TemporalVectorDB = {
      val dir = java.nio.file.Files.createTempDirectory("tvdb_z").toFile
      dir.delete()
      new TemporalVectorDB(spark, dir.getAbsolutePath,
        VersionStore.Config(baseInterval = 8))
    }
    // 64 contents x 64 versions; ts = 64*perm(content) + seq so the two
    // layout dims (seq, ts) are decorrelated ACROSS contents while ts
    // stays increasing WITHIN each content (the ingest contract)
    val rows = for {
      i <- 0 until 64
      k <- 1 to 64
    } yield (f"c$i%02d", new java.sql.Timestamp(
      (64L * ((i * 37) % 64) + k) * 1000L), Array.fill(4)(i * 0.01f + k))
    def boxes(db: TemporalVectorDB): Array[(Long, Long, Long, Long)] =
      db.versions.groupBy(input_file_name())
        .agg(min("seq").cast("long").as("smn"),
          max("seq").cast("long").as("smx"),
          min(col("ts").cast("long")).as("tmn"),
          max(col("ts").cast("long")).as("tmx"))
        .select("smn", "smx", "tmn", "tmx")
        .as[(Long, Long, Long, Long)].collect()
    def touched(bs: Array[(Long, Long, Long, Long)],
                lo: Long, hi: Long, dim: String): Int =
      bs.count { case (smn, smx, tmn, tmx) =>
        if (dim == "seq") smx >= lo && smn <= hi
        else tmx >= lo && tmn <= hi }

    val zdb = freshDb()
    zdb.addVersions(rows.toDF("content_id", "ts", "embedding"))
    val before = zdb.versions.select("content_id", "seq", "kind")
      .as[(String, Int, String)].collect().sorted.toSeq
    val (_, nAfter) =
      zdb.compactStore(16, zorderBy = Seq("seq", "ts"), zorderBits = 6)
    assert(nAfter <= 16L, s"files after z-compaction: $nAfter")
    val after = zdb.versions.select("content_id", "seq", "kind")
      .as[(String, Int, String)].collect().sorted.toSeq
    assert(after == before) // rewrite changes layout, never data
    assert(zdb.validateTimelineIntegrity().count() == 0)

    val hdb = freshDb()
    hdb.addVersions(rows.toDF("content_id", "ts", "embedding"))
    hdb.compactStore(16) // content-hashed: every file spans everything
    val (zb, hb) = (boxes(zdb), boxes(hdb))
    // a quarter-slab on EITHER dimension touches ~1 grid row of the
    // 4x4 z-grid; hashed files all intersect every slab
    assert(touched(zb, 17L, 32L, "seq") <= 6,
      s"z seq-slab: ${touched(zb, 17L, 32L, "seq")}")
    assert(touched(zb, 1025L, 2048L, "ts") <= 6,
      s"z ts-slab: ${touched(zb, 1025L, 2048L, "ts")}")
    assert(touched(hb, 17L, 32L, "seq") == hb.length)
    // hashed files hold ~4 random contents each, so a ts quarter-slab
    // can skip the odd file — but never approaches the z-grid's 4/16
    assert(touched(hb, 1025L, 2048L, "ts") >= (hb.length * 3) / 4,
      s"hashed ts-slab: ${touched(hb, 1025L, 2048L, "ts")} of ${hb.length}")
    // the bucketed store refuses: its layout IS the bucketing
    intercept[IllegalArgumentException] {
      new graft.api.BucketedTemporalVectorDB(spark, "zlayout_reject")
        .compactStore(4, zorderBy = Seq("seq"))
    }
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
