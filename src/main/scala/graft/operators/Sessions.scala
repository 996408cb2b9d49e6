package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Gap-based sessionization — the standard event-analytics primitive
  * (a session = a maximal run of a user's events with no gap larger
  * than `gap`): new-session flags from a per-user lag, session ids from
  * the running sum of flags. Both windows partition by the USER key —
  * corpus-scale parallelism is the user cardinality, there is no
  * global window anywhere, and a skewed power user costs one
  * partition's sort (the same bound as any per-key window).
  *
  * Deterministic ordering: (ts, tie-break id) — two events at the same
  * instant sessionize identically on every run/engine. */
object Sessions {

  /** Events + `session_id` (1-based per user, chronological) +
    * `session_event_seq` (1-based position within the session). */
  def sessionize(events: DataFrame, gap: Long,
                 userCol: String = "user_id", tsCol: String = "ts_us",
                 tieCol: String = "event_id"): DataFrame = {
    require(gap >= 1, s"gap must be >= 1, got $gap")
    val byTs = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val flagged = events.withColumn("_new",
      when(col(tsCol) - lag(col(tsCol), 1).over(byTs) > gap, 1L)
        .otherwise(lit(0L)))
      // first event per user: lag is NULL -> comparison NULL -> otherwise
      // branch 0; session ids start at 1 via the +1 below
    val withId = flagged.withColumn("session_id",
      sum(col("_new")).over(byTs.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) + 1L)
    withId.withColumn("session_event_seq",
      row_number().over(Window.partitionBy(col(userCol), col("session_id"))
        .orderBy(col(tsCol), col(tieCol))).cast("long"))
      .drop("_new")
  }

  /** Per-session rollup: (user, session_id, n_events, start, end,
    * duration) — the reporting shape dashboards read. */
  def sessionStats(events: DataFrame, gap: Long,
                   userCol: String = "user_id", tsCol: String = "ts_us",
                   tieCol: String = "event_id"): DataFrame =
    sessionize(events, gap, userCol, tsCol, tieCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
      .withColumn("duration", col("end_ts") - col("start_ts"))
}
