package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Generic as-of join (SURVEY §2 rows 24/26): for every left row, the last
  * right row at-or-before it within the same key — the temporal-database
  * primitive behind nearest-base selection
  * (/root/reference/core/data_structures.py:229-252) and
  * `get_version_before_timestamp` (:213-227), generalized to any pair of
  * tables.
  *
  * Shape: equi-join on the key (hash-partitioned, skew-free) with the
  * ordering predicate as a post-filter, then `max(struct(ord, payload))`
  * per left row — one shuffle keyed by the join key, one by the left id.
  * The struct-max trick keeps the winning right row's payload without a
  * second join back.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * (rightOrd < leftOrd), per `key`. `leftId` must uniquely identify left
    * rows. Output: all left columns + `asof_<payloadCol>` for each payload
    * column (null when no earlier right row exists). */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
                 leftId: String, leftOrd: String, rightOrd: String,
                 payload: Seq[String], strict: Boolean = true): DataFrame = {
    val cond: Column =
      if (strict) col(s"r.$rightOrd") < col(s"l.$leftOrd")
      else col(s"r.$rightOrd") <= col(s"l.$leftOrd")
    val j = left.as("l").join(right.as("r"),
      col(s"l.$key") === col(s"r.$key") && cond, "left")
    // null out join-miss rows entirely, else max() would compare a
    // struct-of-nulls instead of skipping it
    val winner = when(col(s"r.$rightOrd").isNotNull,
      struct((rightOrd +: payload).map(c => col(s"r.$c")): _*))
    val leftCols = left.columns.map(c => col(s"l.$c"))
    val grouped = j.groupBy(col(s"l.$leftId"))
      .agg(max(winner).as("_w"),
        first(struct(leftCols: _*)).as("_l"))
    val outLeft = left.columns.map(c => col(s"_l.$c").as(c))
    val outRight = payload.map(c => col(s"_w.$c").as(s"asof_$c"))
    grouped.select(outLeft ++ outRight: _*)
  }
}
