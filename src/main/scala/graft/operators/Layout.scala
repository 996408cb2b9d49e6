package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) data layout for multi-dimensional scan pruning —
  * the data-layout lever a 100 TB deployment pulls when queries filter
  * on MORE than one column: a single-column sort gives perfect file
  * skipping on that column and none on any other, while interleaving
  * the bits of k normalized columns bounds every file's bounding box in
  * ALL k dimensions at once (Morton 1966; the same layout Delta/Iceberg
  * OPTIMIZE ZORDER BY applies). The reference engine has no layout
  * machinery (single-process files, storage_engine.py) — this targets
  * the parquet-lake deployment shape of this library.
  *
  * Everything here is integer-exact so the DuckDB oracle can replay it
  * bit for bit: normalization is `clamp(v) - min // cellWidth` in long
  * arithmetic (div-first — monotone, lands in [0, 2^bits), and
  * overflow-free at full-long key ranges, see [[normalizeInt]]), and
  * the interleave is a closed-form sum of shift/mask terms — pure
  * codegen, no UDF.
  */
object Layout {

  /** Morton-interleave `cols` (each already an integer in
    * [0, 2^bits)): bit i of column j lands at position i*k + j. For
    * k*bits <= 62 the result fits a non-negative long. */
  def zInterleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && cols.length * bits <= 62,
      s"need 1..62 result bits, got ${cols.length} cols x $bits")
    val k = cols.length
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Normalize an integer column into [0, 2^bits) given its closed
    * [min, max] bounds: exact long arithmetic (`div`, NOT `/` — Spark's
    * `/` is double division, which silently loses bits past 2^53 at
    * lake-scale keys), monotone, oracle-replayable with `//`. Values
    * outside pinned bounds clamp to the edge buckets, keeping appends
    * safe.
    *
    * Overflow-free by construction (div-FIRST, never multiply): the
    * mul-first form `(v - min) * 2^bits` wraps negative once the range
    * reaches 2^(63-bits) — 2^47 at the default 16 bits, i.e. exactly
    * the lake-scale key regime this exists for — and the clamp would
    * then silently send every large value to bucket 0. Here the value
    * is clamped INTO [min, max] before subtracting (so out-of-bounds
    * inputs can't wrap either), and the bucket is one division by the
    * cell width `W = ceil(range / 2^bits)` computed driver-side. The
    * single unavoidable limit — a column spanning more than 2^63-1,
    * where `max - min` itself won't fit a long — fails loudly
    * (ArithmeticException) instead of wrapping. */
  def normalizeInt(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty range [$minV, $maxV]")
    val range = Math.subtractExact(maxV, minV) // loud on > 2^63-1 span
    val w = (range >> bits) + 1L // = ceil((range+1) / 2^bits)
    val cc = least(greatest(c.cast("long"), lit(minV)), lit(maxV))
    call_function("div", cc - minV, lit(w))
  }

  /** df + a `zval` column over the given integer columns: one bounds
    * aggregation (a single collected row), then a map-only interleave.
    * Bounds can be pinned via `bounds` to keep zval append-stable
    * across growing corpora (the production mode — recomputed bounds
    * re-shuffle history). */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
             bounds: Option[Seq[(Long, Long)]] = None,
             out: String = "zval"): DataFrame = {
    val bs = bounds.getOrElse {
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).cast("long").as(s"_mn_$c"),
          max(col(c)).cast("long").as(s"_mx_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).collect().head
      cols.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
    }
    require(bs.length == cols.length, "one (min,max) per column")
    val normed = cols.zip(bs).map { case (c, (mn, mx)) =>
      normalizeInt(col(c), mn, mx, bits)
    }
    df.withColumn(out, zInterleave(normed, bits))
  }

  /** Cluster `df` into `files` z-ordered range buckets: rows land in
    * files whose bounding boxes are tight in EVERY layout column, so a
    * parquet reader's row-group/file min-max stats prune
    * multi-dimensional boxes instead of just the leading sort key.
    * (Range partitioning by zval + an in-partition sort — the standard
    * OPTIMIZE ZORDER shape.) */
  def zOrderLayout(df: DataFrame, cols: Seq[String], files: Int,
                   bits: Int = 16,
                   bounds: Option[Seq[(Long, Long)]] = None): DataFrame =
    zValue(df, cols, bits, bounds)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
}
