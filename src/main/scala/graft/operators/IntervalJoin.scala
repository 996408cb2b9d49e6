package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Binned interval-containment join: points p against intervals
  * [lo, hi], p in [lo, hi] — the range-join shape Spark's optimizer
  * handles badly on its own (a bare range predicate plans a broadcast
  * nested loop or a cartesian; fine at demo scale, fatal at 100 TB).
  *
  * The pigeonhole bucket trick (the same shape as
  * [[Retrieval.proximitySearch]]'s position bucketing): intervals
  * explode to the bins they cover (`(hi div W) - (lo div W) + 1` rows),
  * points key by their single bin, and the equi-join on the bin feeds an
  * exact range filter. Work is sum over bins of |points| x |intervals|
  * per bin — linear when W tracks the interval width — and both sides
  * shuffle hash-partitioned, no nested loop anywhere.
  *
  * Division is TRUNCATING (`div`) on both sides, so bins are merely
  * uneven around zero, never inconsistent: trunc is monotone, hence
  * lo <= p <= hi implies bin(lo) <= bin(p) <= bin(hi).
  *
  * Sizing: W ~ the mean interval width keeps the per-interval fan-out
  * ~2 bins; [[binnedAuto]] derives it. A single interval spanning the
  * whole domain fans out to domain/W rows — cap pathological intervals
  * upstream or raise W (the trade is fan-out rows vs per-bin pair
  * count, the same Sigma-bucket-squared economics as every banded join
  * in this engine). */
object IntervalJoin {

  /** Join `points` to `intervals` on containment
    * (`pointCol` in [`loCol`, `hiCol`], both ends inclusive): all
    * columns of both frames, empty intervals (lo > hi) dropped. */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
             loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val pb = points.withColumn("_bin",
      call_function("div", col(pointCol).cast("long"), lit(binWidth)))
    val ib = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("_bin", explode(sequence(
        call_function("div", col(loCol).cast("long"), lit(binWidth)),
        call_function("div", col(hiCol).cast("long"), lit(binWidth)))))
    pb.join(ib, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** [[binned]] with W = ceil(mean interval width) — one aggregation
    * over the (usually small) intervals side. */
  def binnedAuto(points: DataFrame, intervals: DataFrame, pointCol: String,
                 loCol: String, hiCol: String): DataFrame = {
    val r = intervals.where(col(loCol) <= col(hiCol))
      .agg(ceil(avg(col(hiCol).cast("long") - col(loCol).cast("long") + 1))
        .as("_w")).collect()
    val w = if (r.isEmpty || r.head.isNullAt(0)) 1L else r.head.getLong(0)
    binned(points, intervals, pointCol, loCol, hiCol, math.max(1L, w))
  }
}
