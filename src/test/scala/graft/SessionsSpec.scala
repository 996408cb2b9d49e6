package graft

import graft.operators.Sessions

/** Gap sessionization vs a sequential reference, including simultaneous
  * timestamps (tie-broken by id), exact-gap boundaries (gap is
  * inclusive: delta == gap stays in-session), and single-event users. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(evs: Seq[(Long, Long, Long)], gap: Long)
      : Map[(Long, Long), (Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var sid = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { case (_, ts, _) =>
        if (sid == 0L || ts - prev > gap) sid += 1
        prev = ts
        (sid, ts)
      }
      tagged.groupBy(_._1).map { case (s, g) =>
        (u, s) -> (g.size.toLong, g.map(_._2).min, g.map(_._2).max)
      }
    }

  test("sessionStats matches the sequential reference (ties, exact-gap " +
    "edges, singleton users, seeded random)") {
    val fixed = Seq[(Long, Long, Long)](
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L),   // one session (gap 10)
      (1L, 31L, 4L),                                 // 11 > 10: new session
      (2L, 5L, 5L), (2L, 5L, 6L),                    // simultaneous pair
      (3L, 100L, 7L))                                // singleton user
    val rnd = new scala.util.Random(13)
    val random = (1L to 400L).map(i =>
      (rnd.nextLong(5), rnd.nextLong(300), i + 100L))
    for ((evs, gap) <- Seq((fixed, 10L), (random, 25L))) {
      val got = Sessions.sessionStats(
          evs.toDF("user_id", "ts_us", "event_id"), gap)
        .select("user_id", "session_id", "n_events", "start_ts", "end_ts")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      assert(got == reference(evs, gap), s"gap=$gap")
    }
  }

  test("sessionize assigns 1-based chronological ids and in-session " +
    "sequence numbers") {
    val evs = Seq[(Long, Long, Long)](
      (1L, 0L, 1L), (1L, 5L, 2L), (1L, 100L, 3L), (1L, 102L, 4L))
    val got = Sessions.sessionize(evs.toDF("user_id", "ts_us", "event_id"),
        gap = 10L)
      .select("event_id", "session_id", "session_event_seq")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 1L),
      (4L, 2L, 2L)))
  }
}
