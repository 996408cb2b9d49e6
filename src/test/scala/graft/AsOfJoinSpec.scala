package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The generic as-of join: value equivalence with a brute-force formulation,
  * strict vs non-strict boundary semantics, left-join null semantics, the
  * one-exchange/no-join plan shape, and bounded time on a pathological hot
  * key (the case the old equi-join + post-filter shape could not survive). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def anchors = Seq(
    ("a1", "u1", 100L), ("a2", "u1", 250L), ("a3", "u1", 300L),
    ("a4", "u2", 50L), ("a5", "u2", 500L), ("a6", "u3", 999L)
  ).toDF("anchor_id", "user_id", "ts")

  private def events = Seq(
    (1L, "u1", 100L, 1.0), (2L, "u1", 200L, 2.0), (3L, "u1", 300L, 3.0),
    (4L, "u2", 100L, 4.0), (5L, "u2", 100L, 5.0), (6L, "u9", 1L, 6.0)
  ).toDF("event_id", "user_id", "ts", "value")

  test("strict <: last strictly-earlier event per key, null when none") {
    val out = AsOfJoin.lastBefore(anchors, events, key = "user_id",
      leftId = "anchor_id", leftOrd = "ts", rightOrd = "ts",
      payload = Seq("event_id", "value"))
      .select("anchor_id", "asof_event_id", "asof_value")
      .as[(String, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    // a1 at ts=100: event ts=100 is NOT earlier under strict <
    assert(out("a1") == ((None, None)))
    assert(out("a2") == ((Some(2L), Some(2.0))))
    assert(out("a3") == ((Some(2L), Some(2.0))))
    assert(out("a4") == ((None, None)))
    // tie at ts=100 for u2: struct max breaks by (event_id, value) desc
    assert(out("a5") == ((Some(5L), Some(5.0))))
    assert(out("a6") == ((None, None))) // u3 has no events at all
  }

  test("non-strict <=: equal-ord events are visible") {
    val out = AsOfJoin.lastBefore(anchors, events, key = "user_id",
      leftId = "anchor_id", leftOrd = "ts", rightOrd = "ts",
      payload = Seq("event_id"), strict = false)
      .select("anchor_id", "asof_event_id")
      .as[(String, Option[Long])].collect().toMap
    assert(out("a1") == Some(1L))
    assert(out("a3") == Some(3L))
    assert(out("a4") == None) // ts=50 precedes every u2 event
    assert(out("a5") == Some(5L)) // tie at 100 -> max event_id
  }

  test("matches the brute-force window formulation on a generated fixture") {
    val ev = spark.range(2000).select(
      col("id").as("event_id"),
      concat(lit("u"), pmod(col("id"), lit(7))).as("user_id"),
      pmod(col("id") * 37, lit(500)).as("ts"),
      (col("id") % 100).cast("double").as("value"))
    val an = spark.range(300).select(
      col("id").as("anchor_id"),
      concat(lit("u"), pmod(col("id"), lit(9))).as("user_id"),
      pmod(col("id") * 53, lit(500)).as("ts"))
    val fast = AsOfJoin.lastBefore(an, ev, "user_id", "anchor_id",
        "ts", "ts", Seq("event_id", "value"))
      .select("anchor_id", "asof_event_id", "asof_value")
    val brute = an.as("a").join(ev.as("e"),
        col("e.user_id") === col("a.user_id") && col("e.ts") < col("a.ts"),
        "left")
      .groupBy(col("a.anchor_id").as("anchor_id"))
      .agg(max(when(col("e.ts").isNotNull,
        struct(col("e.ts"), col("e.event_id"), col("e.value")))).as("w"))
      .select(col("anchor_id"), col("w.event_id").as("asof_event_id"),
        col("w.value").as("asof_value"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
    assert(fast.count() == 300)
  }

  test("SQL null semantics: null keys never match; null-ord events never win") {
    val an = Seq(("a1", Some("u1"), Some(10L)), ("a2", None, Some(10L)),
      ("a3", Some("u1"), None))
      .toDF("anchor_id", "user_id", "ts")
    val ev = Seq((1L, Some("u1"), Some(5L), 1.0), (2L, None, Some(5L), 2.0),
      (3L, Some("u1"), None, 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.lastBefore(an, ev, "user_id", "anchor_id",
        "ts", "ts", Seq("event_id"))
      .select("anchor_id", "asof_event_id")
      .as[(String, Option[Long])].collect().toMap
    assert(out("a1") == Some(1L)) // real match; null-ord event 3 ignored
    assert(out("a2") == None) // null key matches nothing (not event 2)
    assert(out("a3") == None) // null anchor ord: no event is 'earlier'
    assert(out.size == 3) // null-key/ord anchors still pass through
  }

  test("randomized equivalence across seeds, strict AND non-strict") {
    for (seed <- Seq(7, 21, 99); strict <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed)
      val ev = (0 until 500).map(i =>
        (i.toLong, s"u${rnd.nextInt(5)}", rnd.nextInt(100).toLong,
          rnd.nextInt(50).toDouble))
        .toDF("event_id", "user_id", "ts", "value")
      val an = (0 until 80).map(i =>
        (i.toLong, s"u${rnd.nextInt(7)}", rnd.nextInt(100).toLong))
        .toDF("anchor_id", "user_id", "ts")
      val fast = AsOfJoin.lastBefore(an, ev, "user_id", "anchor_id",
          "ts", "ts", Seq("event_id", "value"), strict)
        .select("anchor_id", "asof_event_id", "asof_value")
      val cond = if (strict) col("e.ts") < col("a.ts")
                 else col("e.ts") <= col("a.ts")
      val brute = an.as("a").join(ev.as("e"),
          col("e.user_id") === col("a.user_id") && cond, "left")
        .groupBy(col("a.anchor_id").as("anchor_id"))
        .agg(max(when(col("e.ts").isNotNull,
          struct(col("e.ts"), col("e.event_id"), col("e.value")))).as("w"))
        .select(col("anchor_id"), col("w.event_id").as("asof_event_id"),
          col("w.value").as("asof_value"))
      assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
        s"seed=$seed strict=$strict")
    }
  }

  test("plan is one exchange + window, no join") {
    val plan = AsOfJoin.lastBefore(anchors, events, "user_id", "anchor_id",
        "ts", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
  }

  test("hot key: 100k events + 10k anchors on ONE key in bounded time") {
    // the old equi-join shape materialized 10^9 rows here; union+window is
    // linear — finishing at all (well under the suite timeout) is the gate
    val ev = spark.range(100000).select(
      lit("hot").as("user_id"), col("id").as("ts"),
      col("id").as("event_id"), (col("id") % 10).cast("double").as("value"))
    val an = spark.range(10000).select(
      col("id").as("anchor_id"), lit("hot").as("user_id"),
      (col("id") * 10 + 5).as("ts"))
    val t0 = System.nanoTime()
    val out = AsOfJoin.lastBefore(an, ev, "user_id", "anchor_id",
      "ts", "ts", Seq("event_id"))
    assert(out.where(col("asof_event_id") === col("anchor_id") * 10 + 4)
      .count() == 10000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"hot-key as-of took ${secs}s")
  }
}
