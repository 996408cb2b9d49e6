package graft.queries

import graft.operators.{IntervalJoin, Sessions}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interval-join oracle query (round 9): events against closed-form
  * per-customer day windows. The engine runs the binned containment
  * join ([[graft.operators.IntervalJoin]] — no nested loop, no
  * cartesian); the DuckDB oracle states the same join as a bare
  * BETWEEN predicate, so the bin/fan-out machinery is checked against
  * the declarative semantics it implements. */
object IntervalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q98: per-customer event count + quantized value sum over the
    // customer's synthetic HOUR window: lo = (c*37) mod H hours from
    // 2024-01-01, width = (c mod 30) + 1, with the domain H derived
    // from the corpus — H = |customer| * 12 / 25 (= 720 at the 1500-
    // customer base, i.e. the events fixture's ~30 days). Deriving H
    // keeps interval DENSITY constant as the corpus replicates (the
    // q26c/q70c production-sizing discipline): pinning H would square
    // pair volume at 10x/100x fixtures, the measured trap this round's
    // notes record.
    "q98_interval_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val h = math.max(1L, cust.count() * 12L / 25L)
      val iv = cust.select(col("c_custkey"),
          pmod(col("c_custkey") * 37, lit(h)).cast("long").as("lo"))
        .withColumn("hi",
          col("lo") + pmod(col("c_custkey"), lit(30)).cast("long") + 1L)
      val pts = Temporal.eventsUs(s, d).select(col("event_id"),
        // hour index relative to 2024-01-01T00:00Z
        expr("(ts_us - 1704067200000000) div 3600000000").as("hour"),
        col("value"))
      IntervalJoin.binned(pts, iv, "hour", "lo", "hi", binWidth = 16)
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 1000000.0 + 0.5).cast("long"))
            .as("value_micro"))
        .orderBy("c_custkey")
    }),

    // Q110: interval-OVERLAP join — customer hour-windows (the q98 set)
    // against supplier hour-windows, rolled up per supplier (overlap
    // count + custkey sum bounds the output). The engine runs the
    // two-half tiered decomposition (B-start-in-A ∪ strict
    // A-start-in-B); the oracle states the same join declaratively
    // with greatest(lo) <= least(hi).
    "q110_interval_overlap" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val h = math.max(1L, cust.count() * 12L / 25L)
      val a = cust.select(col("c_custkey"),
          pmod(col("c_custkey") * 37, lit(h)).cast("long").as("a_lo"))
        .withColumn("a_hi",
          col("a_lo") + pmod(col("c_custkey"), lit(30)).cast("long") + 1L)
      val b = Tables.supplier(s, d).select(col("s_suppkey"),
          pmod(col("s_suppkey") * 53, lit(h)).cast("long").as("b_lo"))
        .withColumn("b_hi",
          col("b_lo") + pmod(col("s_suppkey"), lit(20)).cast("long") + 5L)
      IntervalJoin.overlapAuto(a, b, "a_lo", "a_hi", "b_lo", "b_hi")
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_overlaps"),
          sum("c_custkey").as("custkey_sum"))
        .orderBy("s_suppkey")
    }),

    // Q99: gap-based sessionization rollup — 6-hour gap over the events
    // stream, per-session event count + span. Windows partition by
    // user only (150 users x ~67 events at sf0.01); ties break on
    // event_id so simultaneous events sessionize identically everywhere.
    "q99_sessionize" -> ((s, d) =>
      Sessions.sessionStats(
        Temporal.eventsUs(s, d).select("user_id", "ts_us", "event_id"),
        gap = 21600000000L)
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_ts"), col("end_ts"), col("duration"))
        .orderBy("user_id", "session_id"))
  )

  val oracle: Map[String, String] = Map(
    "q98_interval_join" ->
      """WITH n AS (SELECT greatest(1, (count(*) * 12) // 25) AS h
        |  FROM customer),
        |iv AS (SELECT c_custkey,
        |    CAST((c_custkey * 37) % n.h AS BIGINT) AS lo,
        |    CAST((c_custkey * 37) % n.h + (c_custkey % 30) + 1 AS BIGINT)
        |      AS hi
        |  FROM customer, n),
        |pts AS (SELECT event_id,
        |    (epoch_us(ts) - 1704067200000000) // 3600000000 AS hour, value
        |  FROM events)
        |SELECT iv.c_custkey, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS value_micro
        |FROM pts JOIN iv ON pts.hour BETWEEN iv.lo AND iv.hi
        |GROUP BY iv.c_custkey
        |ORDER BY iv.c_custkey""".stripMargin,

    "q110_interval_overlap" ->
      """WITH n AS (SELECT greatest(1, (count(*) * 12) // 25) AS h
        |  FROM customer),
        |a AS (SELECT c_custkey,
        |    CAST((c_custkey * 37) % n.h AS BIGINT) AS a_lo,
        |    CAST((c_custkey * 37) % n.h + (c_custkey % 30) + 1 AS BIGINT)
        |      AS a_hi
        |  FROM customer, n),
        |b AS (SELECT s_suppkey,
        |    CAST((s_suppkey * 53) % n.h AS BIGINT) AS b_lo,
        |    CAST((s_suppkey * 53) % n.h + (s_suppkey % 20) + 5 AS BIGINT)
        |      AS b_hi
        |  FROM supplier, n)
        |SELECT s_suppkey, count(*) AS n_overlaps,
        |  CAST(sum(c_custkey) AS BIGINT) AS custkey_sum
        |FROM a JOIN b ON greatest(a_lo, b_lo) <= least(a_hi, b_hi)
        |GROUP BY s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    "q99_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |fl AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN ts_us - lag(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      > 21600000000 THEN 1 ELSE 0 END AS nw
        |  FROM ev),
        |sid AS (SELECT user_id, ts_us,
        |    CAST(sum(nw) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) + 1
        |      AS BIGINT) AS session_id
        |  FROM fl)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_ts, max(ts_us) AS end_ts,
        |  max(ts_us) - min(ts_us) AS duration
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
