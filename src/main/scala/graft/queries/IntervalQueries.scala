package graft.queries

import graft.operators.IntervalJoin
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
    // customer's synthetic HOUR window (the events fixture spans ~30
    // days): lo = (c*37) mod 720 hours from 2024-01-01, width =
    // (c mod 30) + 1 — narrow enough that pair volume stays ~30 per
    // event, wide enough to span bins.
    "q98_interval_join" -> ((s, d) => {
      val iv = Tables.customer(s, d).select(col("c_custkey"),
          pmod(col("c_custkey") * 37, lit(720)).cast("long").as("lo"))
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
    })
  )

  val oracle: Map[String, String] = Map(
    "q98_interval_join" ->
      """WITH iv AS (SELECT c_custkey,
        |    CAST((c_custkey * 37) % 720 AS BIGINT) AS lo,
        |    CAST((c_custkey * 37) % 720 + (c_custkey % 30) + 1 AS BIGINT)
        |      AS hi
        |  FROM customer),
        |pts AS (SELECT event_id,
        |    (epoch_us(ts) - 1704067200000000) // 3600000000 AS hour, value
        |  FROM events)
        |SELECT iv.c_custkey, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS value_micro
        |FROM pts JOIN iv ON pts.hour BETWEEN iv.lo AND iv.hi
        |GROUP BY iv.c_custkey
        |ORDER BY iv.c_custkey""".stripMargin
  )
}
