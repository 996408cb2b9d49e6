package graft

import graft.operators.Sessions
import graft.streaming.StreamingSessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The parity gate `StreamingSessions`' scaladoc promises: replay a
  * stream and check the emitted rollups are IDENTICAL to
  * [[Sessions.sessionStats]] on the same rows, plus the three
  * streaming-only contracts — timeout emission (a session closes via
  * the watermark, with no super-gap successor in any batch),
  * watermark drop (an event later than `lateness` behind max-seen is
  * discarded, not sessionized), and session-id continuation (a user
  * whose state shrank after timeout re-appears with the NEXT id, not
  * a colliding re-issue of id 1). */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  /** Millisecond-aligned event time so micros(ts) round-trips exactly:
    * usOf(ms) is the batch-side ts_us for Timestamp tsOf(ms). Times sit
    * a day past the epoch — an event at exactly ts=0 equals Spark's
    * INITIAL watermark (0) and is dropped by the `ts <= watermark` late
    * filter, an artifact no real event time (always > 0) can hit. */
  private val Base = 86400000L
  private def tsOf(ms: Long) = new Timestamp(Base + ms)
  private def usOf(ms: Long) = (Base + ms) * 1000L
  /** Relative micros (gaps, durations) — no Base offset. */
  private def relUs(ms: Long) = ms * 1000L

  /** A user id no fixture uses — its far-future event advances the
    * watermark past every real session's horizon so timeouts fire. */
  private val Sentinel = 999999L

  /** Run `events` (user, ts-ms, event_id) through the streaming op in
    * the given per-batch groups, flush with a sentinel event, and
    * return the emitted CLOSED sessions (sentinel excluded). */
  private def replay(batches: Seq[Seq[(Long, Long, Long)]], gapUs: Long,
                     lateness: String = "10 seconds", name: String)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingSessions.sessions(stream.toDS(), gapUs, lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        stream.addData(b.map { case (u, ms, id) => (u, tsOf(ms), id) }: _*)
        q.processAllAvailable()
      }
      val maxMs = batches.flatten.map(_._2).max
      // flush: one sentinel event far past every horizon, twice — the
      // first batch advances the watermark, the second fires timeouts
      // against it (watermark updates are visible at the NEXT batch)
      stream.addData((Sentinel, tsOf(maxMs + 1000000L), 0L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(maxMs + 1000001L), 1L))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.filter(_._1 != Sentinel)
  }

  private def batchStats(events: Seq[(Long, Long, Long)], gapUs: Long)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    Sessions.sessionStats(
        events.map { case (u, ms, id) => (u, usOf(ms), id) }
          .toDF("user_id", "ts_us", "event_id"), gapUs)
      .select("user_id", "session_id", "n_events", "start_ts", "end_ts",
        "duration")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("stream ≡ batch: emitted rollups are identical to " +
    "Sessions.sessionStats on the q99-shaped fixture, including " +
    "exact-gap boundaries, ties, and singleton users") {
    val gapUs = relUs(10) // 10ms gap
    val fixed = Seq[(Long, Long, Long)](
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), // deltas == gap: one session
      (1L, 31L, 4L),                              // 11ms > gap: new session
      (2L, 5L, 5L), (2L, 5L, 6L),                 // simultaneous pair
      (3L, 100L, 7L))                             // singleton user
    // two batches, intra-batch disorder (the op sorts by (ts, id))
    val batches = Seq(fixed.take(4).reverse, fixed.drop(4).reverse)
    val got = replay(batches, gapUs, name = "ss_parity_fixed")
    assert(got.size == got.toSet.size, "duplicate (user, session) rows")
    assert(got.toSet == batchStats(fixed, gapUs))
  }

  test("stream ≡ batch on a seeded random workload split across many " +
    "micro-batches in chronological batch order") {
    val rnd = new scala.util.Random(29)
    val events = (1L to 300L).map(i =>
      (rnd.nextLong(6), rnd.nextLong(2000), i))
    val gapUs = relUs(40)
    // chronological ACROSS batches (the documented parity contract —
    // within `lateness` of max-seen), shuffled WITHIN each batch
    val batches = events.sortBy(e => (e._2, e._3)).grouped(60)
      .map(b => rnd.shuffle(b.toSeq)).toSeq
    val got = replay(batches, gapUs, lateness = "1 second",
      name = "ss_parity_random")
    assert(got.toSet == batchStats(events, gapUs))
  }

  test("timeout emission: a session with no super-gap successor in any " +
    "batch is emitted once the watermark passes end + gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingSessions.sessions(stream.toDS(), relUs(10), "1 second")
      .writeStream.format("memory").queryName("ss_timeout")
      .outputMode("append").start()
    try {
      stream.addData((7L, tsOf(100L), 1L), (7L, tsOf(105L), 2L))
      q.processAllAvailable()
      // nothing closed yet: the session could still grow
      assert(spark.table("ss_timeout").count() == 0)
      // advance the watermark way past 105ms + gap + lateness
      stream.addData((Sentinel, tsOf(3600000L), 3L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(3600001L), 4L))
      q.processAllAvailable()
      val rows = spark.table("ss_timeout")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
        .filter(_._1 == 7L)
      assert(rows == Seq((7L, 1L, 2L, usOf(100L), usOf(105L), relUs(5L))))
    } finally q.stop()
  }

  test("watermark drop: an event later than `lateness` behind max-seen " +
    "is discarded — it never opens a session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingSessions.sessions(stream.toDS(), relUs(10), "1 second")
      .writeStream.format("memory").queryName("ss_late")
      .outputMode("append").start()
    try {
      // push the watermark to ~1 hour
      stream.addData((Sentinel, tsOf(3600000L), 1L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(3600001L), 2L))
      q.processAllAvailable()
      // an hour-stale event for user 8: behind the watermark -> dropped
      stream.addData((8L, tsOf(50L), 3L))
      q.processAllAvailable()
      // flush everything closable
      stream.addData((Sentinel, tsOf(7200000L), 4L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(7200001L), 5L))
      q.processAllAvailable()
      assert(spark.table("ss_late")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .forall(_._1 != 8L), "a watermark-late event produced a session")
    } finally q.stop()
  }

  test("session-id continuation: a user re-appearing AFTER its state " +
    "timed out (and shrank) continues ids instead of re-issuing 1") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingSessions.sessions(stream.toDS(), relUs(10), "1 second")
      .writeStream.format("memory").queryName("ss_continue")
      .outputMode("append").start()
    try {
      stream.addData((9L, tsOf(100L), 1L))
      q.processAllAvailable()
      // time the session out: state shrinks to the counter
      stream.addData((Sentinel, tsOf(3600000L), 2L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(3600001L), 3L))
      q.processAllAvailable()
      // user 9 re-appears (ahead of the watermark)
      stream.addData((9L, tsOf(3700000L), 4L))
      q.processAllAvailable()
      // ...and times out again
      stream.addData((Sentinel, tsOf(7200000L), 5L))
      q.processAllAvailable()
      stream.addData((Sentinel, tsOf(7200001L), 6L))
      q.processAllAvailable()
      val rows = spark.table("ss_continue")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
        .filter(_._1 == 9L).sortBy(_._2)
      assert(rows.map(r => (r._2, r._4)) ==
        Seq((1L, usOf(100L)), (2L, usOf(3700000L))),
        s"expected continuing ids 1,2 — got $rows")
    } finally q.stop()
  }
}
