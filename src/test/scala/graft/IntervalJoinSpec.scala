package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Binned interval join: exact equivalence with the declarative range
  * join on adversarial data (negative domains, bin-straddling spans,
  * empty and point intervals), and the no-nested-loop plan gate. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def reference(points: Seq[(Long, Long)],
                        ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, lo, hi) <- ivs
      if lo <= hi && p >= lo && p <= hi
    } yield (pid, iid)).toSet

  private def run(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
                  w: Long): Set[(Long, Long)] =
    IntervalJoin.binned(points.toDF("pid", "p"),
        ivs.toDF("iid", "lo", "hi"), "p", "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("binned join equals the declarative range join on adversarial " +
    "fixtures across bin widths") {
    val points = Seq[(Long, Long)](
      (1L, -17L), (2L, -16L), (3L, -1L), (4L, 0L), (5L, 1L),
      (6L, 15L), (7L, 16L), (8L, 17L), (9L, 100L), (10L, 31L))
    val ivs = Seq[(Long, Long, Long)](
      (1L, -20L, -10L),   // negative domain
      (2L, -5L, 5L),      // straddles zero
      (3L, 16L, 16L),     // point interval on a bin edge
      (4L, 0L, 100L),     // many-bin span
      (5L, 30L, 33L),     // straddles the 32 boundary
      (6L, 50L, 40L))     // empty (lo > hi): dropped
    for (w <- Seq(1L, 4L, 16L, 64L))
      assert(run(points, ivs, w) == reference(points, ivs), s"w=$w")
  }

  test("binned join equals the declarative range join on seeded random " +
    "data; binnedAuto agrees") {
    val rnd = new scala.util.Random(11)
    val points = (1L to 300L).map(i => (i, rnd.nextLong(2000) - 1000L))
    val ivs = (1L to 60L).map { i =>
      val lo = rnd.nextLong(2000) - 1000L
      (i, lo, lo + rnd.nextLong(40))
    }
    val want = reference(points, ivs)
    assert(run(points, ivs, 16L) == want)
    val auto = IntervalJoin.binnedAuto(points.toDF("pid", "p"),
        ivs.toDF("iid", "lo", "hi"), "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(auto == want)
  }

  test("binnedAuto is skew-robust: one whole-domain whale among 10k " +
    "tiny intervals explodes to <= 2 bins at its own level (linear " +
    "cost), and the join stays exact") {
    val rnd = new scala.util.Random(7)
    val n = 10000
    val tiny = (1L to n.toLong).map { i =>
      val lo = rnd.nextLong(1L << 40) // wide domain
      (i, lo, lo + rnd.nextLong(8))
    }
    val whale = Seq((0L, 0L, (1L << 40) - 1L)) // spans the whole domain
    val ivs = (whale ++ tiny).toDF("iid", "lo", "hi")
    // the fan-out gate: the exploded interval frame is <= 2 rows per
    // interval — the whale costs 2 rows, NOT domain/W (~2^37 at the
    // old mean-sized width)
    val (exploded, levels) = IntervalJoin.tieredIntervals(ivs, "lo", "hi")
    val fanOut = exploded.count()
    assert(fanOut <= 2L * (n + 1), s"fan-out $fanOut")
    assert(levels.size <= 64 && levels.nonEmpty)
    // exactness on a sampled point set (every point hits the whale)
    val points = (1L to 500L).map(i => (i, rnd.nextLong(1L << 40)))
    val got = IntervalJoin.binnedAuto(points.toDF("pid", "p"), ivs,
        "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == reference(points, whale ++ tiny))
    assert(got.size >= 500) // whale matched by every point
  }

  test("binnedAuto handles empty and single-width interval sets") {
    val points = Seq((1L, 5L), (2L, 50L)).toDF("pid", "p")
    val empty = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(IntervalJoin.binnedAuto(points, empty, "p", "lo", "hi")
      .count() == 0)
    val one = Seq((9L, 0L, 9L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin.binnedAuto(points, one, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 9L)))
  }

  private def overlapRef(as: Seq[(Long, Long, Long)],
                         bs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (ai, alo, ahi) <- as
      (bi, blo, bhi) <- bs
      if alo <= ahi && blo <= bhi &&
        math.max(alo, blo) <= math.min(ahi, bhi)
    } yield (ai, bi)).toSet

  private def runOverlap(as: Seq[(Long, Long, Long)],
                         bs: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    IntervalJoin.overlapAuto(as.toDF("ai", "a_lo", "a_hi"),
        bs.toDF("bi", "b_lo", "b_hi"), "a_lo", "a_hi", "b_lo", "b_hi")
      .select("ai", "bi").as[(Long, Long)].collect().toSeq

  test("overlapAuto equals the declarative overlap join on adversarial " +
    "fixtures — containment, touching endpoints, ties, negatives, " +
    "empties — and emits each pair exactly once") {
    val as = Seq[(Long, Long, Long)](
      (1L, 0L, 10L), (2L, -20L, -5L), (3L, 7L, 7L), (4L, 0L, 100L),
      (5L, 50L, 40L),  // empty: dropped
      (6L, 15L, 25L))
    val bs = Seq[(Long, Long, Long)](
      (1L, 10L, 20L),  // touches a1's endpoint
      (2L, -6L, -6L),  // point inside a2
      (3L, 0L, 10L),   // same start as a1 (the tie case)
      (4L, 3L, 5L),    // contained in a1 and a4
      (5L, 200L, 300L), // disjoint from everything
      (6L, 30L, 20L))  // empty: dropped
    val got = runOverlap(as, bs)
    assert(got.toSet == overlapRef(as, bs))
    assert(got.size == got.distinct.size, "pair emitted twice")
  }

  test("overlapAuto equals the declarative join on seeded random mixes " +
    "including whales on BOTH sides; disjoint column names enforced") {
    val rnd = new scala.util.Random(23)
    val as = (1L to 400L).map { i =>
      val lo = rnd.nextLong(5000); (i, lo, lo + rnd.nextLong(30))
    } :+ ((999L, 0L, 4999L))     // whale in A
    val bs = (1L to 300L).map { i =>
      val lo = rnd.nextLong(5000); (i, lo, lo + rnd.nextLong(50))
    } :+ ((888L, 0L, 4999L))     // whale in B
    val got = runOverlap(as, bs)
    assert(got.toSet == overlapRef(as, bs))
    assert(got.size == got.distinct.size)
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapAuto(as.toDF("id", "lo", "hi"),
        bs.toDF("id", "b_lo", "b_hi"), "lo", "hi", "b_lo", "b_hi")
    }
  }

  test("the plan is an equi-join on the bin: no nested loop, no " +
    "cartesian") {
    val plan = IntervalJoin.binned(
      Seq((1L, 5L)).toDF("pid", "p"),
      Seq((1L, 0L, 9L)).toDF("iid", "lo", "hi"),
      "p", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val auto = IntervalJoin.binnedAuto(
      Seq((1L, 5L)).toDF("pid", "p"),
      Seq((1L, 0L, 9L), (2L, 0L, 1000000L)).toDF("iid", "lo", "hi"),
      "p", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!auto.contains("CartesianProduct"), auto)
    assert(!auto.contains("BroadcastNestedLoopJoin"), auto)
  }
}
