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
  * Sizing: with ONE bin width, W ~ the typical interval width keeps
  * the per-interval fan-out ~2 bins, but a single interval spanning
  * the whole domain fans out to domain/W rows. [[binnedAuto]] is
  * therefore TIERED: a median-derived base width plus geometric
  * levels (bin width W*2^l), each interval joining at its own scale —
  * <= 2 bins per interval at ANY width mix (the same
  * Sigma-bucket-squared economics as every banded join in this
  * engine, made skew-proof). Use plain [[binned]] when widths are
  * known-homogeneous and W is picked from the data. */
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

  /** Base bin width + geometric level per interval, skew-robustly:
    * W0 = the MEDIAN interval width (a mean is hijacked by one whale —
    * the round-9 version's documented-but-unenforced gap), and each
    * interval is assigned level ceil(log2(width / W0)) clamped to
    * [0, 62], where the level-l bin width is W0 * 2^l. An interval's
    * width never exceeds its level's bin width, so EVERY interval
    * explodes to at most 2 bins — one whole-domain whale costs 2 rows,
    * not domain/W. Returns the exploded interval frame (all interval
    * columns + `_lvl`, `_bin`) and the (level, binWidth) table for the
    * probe side. Package-private so the spec can gate the linear
    * fan-out directly. */
  private[graft] def tieredIntervals(intervals: DataFrame, loCol: String,
      hiCol: String): (DataFrame, Seq[(Int, Long)]) = {
    val iv = intervals.where(col(loCol) <= col(hiCol))
    val width = col(hiCol).cast("long") - col(loCol).cast("long") + lit(1L)
    val med = iv.agg(percentile_approx(width, lit(0.5), lit(10000)))
      .collect().headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
    val w0 = math.max(1L, med.getOrElse(1L))
    // float log2 boundary wobble is harmless: levels only PARTITION the
    // intervals (points probe every occupied level; the exact range
    // filter decides membership) — the <=2-bin bound needs width <=
    // W0*2^lvl, which ceil(log2) guarantees on both sides of a wobble
    val lvl = greatest(lit(0), least(lit(62),
      ceil(log2((col(hiCol).cast("long") - col(loCol).cast("long")
        + lit(1L)).cast("double") / w0.toDouble)))).cast("int")
    def bwOf(l: Int): Long = {
      val b = BigInt(w0) << l
      if (b > Long.MaxValue / 2) Long.MaxValue / 2 else b.toLong
    }
    val withLvl = iv.withColumn("_lvl", lvl)
    val levels = withLvl.select("_lvl").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq.map(l => (l, bwOf(l)))
    // fail-loud fallback: the level table was collected from this frame,
    // but `exploded` re-evaluates the intervals source lazily at join
    // time — a nondeterministic/changed source could mint a _lvl absent
    // from the table, and a silent sentinel width would produce
    // (_lvl,_bin) keys matching no probe row (rows quietly dropped)
    val bwCol = levels.foldLeft(
      raise_error(concat(
        lit("tieredIntervals: level "), col("_lvl").cast("string"),
        lit(" not in the planned level table — the intervals source " +
          "changed (or is nondeterministic) between planning and " +
          "execution; pin it (Ckpt.eager) before joining"))).cast("long")
    ) { case (acc, (l, bw)) =>
      when(col("_lvl") === l, lit(bw)).otherwise(acc)
    }
    val exploded = withLvl
      .withColumn("_bin", explode(sequence(
        call_function("div", col(loCol).cast("long"), bwCol),
        call_function("div", col(hiCol).cast("long"), bwCol))))
    (exploded, levels)
  }

  /** [[binned]] made skew-robust via [[tieredIntervals]]: intervals
    * join at their own width scale, so the mix of 10k tiny intervals
    * plus one whole-domain whale that fans a single-width scheme out
    * to domain/W rows (or, mean-sized, collapses every tiny interval
    * into a handful of quadratic bins) costs |points| x levels probe
    * rows + <= 2 rows per interval. Levels <= ~64 by construction and
    * in practice = the number of distinct width octaves. Everything
    * still lands on hash equi-joins on (_lvl, _bin) + the exact range
    * filter — no nested loop at any width mix. */
  def binnedAuto(points: DataFrame, intervals: DataFrame, pointCol: String,
                 loCol: String, hiCol: String): DataFrame = {
    val (ib, levels) = tieredIntervals(intervals, loCol, hiCol)
    if (levels.isEmpty)
      return binned(points, intervals, pointCol, loCol, hiCol, 1L)
    val lvlBw = levels.map { case (l, bw) => struct(lit(l).as("_lvl"),
      lit(bw).as("_bw")) }
    val pb = points
      .withColumn("_x", explode(array(lvlBw: _*)))
      .select(points.columns.map(col) :+ col("_x._lvl").as("_lvl")
        :+ call_function("div", col(pointCol).cast("long"),
          col("_x._bw")).as("_bin"): _*)
    pb.join(ib, Seq("_lvl", "_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_lvl", "_bin")
  }

  /** Interval-OVERLAP join: every (a, b) pair with
    * [loA, hiA] ∩ [loB, hiB] ≠ ∅ (all bounds inclusive; empty intervals
    * on either side drop). The classic quadratic-plan trap — Spark
    * gives `maxLo <= minHi` a nested loop — decomposed into two
    * point-in-interval halves that PARTITION the overlap cases by
    * which interval starts later: overlap with loB >= loA ⟺ A contains
    * B's start; overlap with loB < loA ⟺ B contains A's start. Each
    * half is one tiered [[binnedAuto]] (B-starts probe A, A-starts
    * probe B + the strict filter), so the whole join inherits its
    * skew-proof Σ-bucket economics — whales cost their OUTPUT, never a
    * bin fan-out — and the two halves are disjoint by construction: no
    * dedup pass, the union IS the answer. Column names of `a` and `b`
    * must be disjoint. */
  def overlapAuto(a: DataFrame, b: DataFrame,
                  loA: String, hiA: String,
                  loB: String, hiB: String): DataFrame = {
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    require(clash.isEmpty,
      s"overlapAuto needs disjoint column names; both sides have $clash")
    // each side plays POINT in one half — binnedAuto only drops empty
    // intervals on its intervals side, so empties must go here too
    val av = a.where(col(loA) <= col(hiA))
    val bv = b.where(col(loB) <= col(hiB))
    val laterB = binnedAuto(bv, av, loB, loA, hiA) // loB in [loA, hiA]
    val laterA = binnedAuto(av, bv, loA, loB, hiB) // loA in [loB, hiB]
      .where(col(loB) < col(loA)) // strict: ties live in laterB
    laterB.unionByName(laterA.select(laterB.columns.map(col): _*))
  }
}
