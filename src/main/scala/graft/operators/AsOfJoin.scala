package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generic as-of join (SURVEY §2 rows 24/26): for every left row, the last
  * right row at-or-before it within the same key — the temporal-database
  * primitive behind nearest-base selection
  * (/root/reference/core/data_structures.py:229-252) and
  * `get_version_before_timestamp` (:213-227), generalized to any pair of
  * tables.
  *
  * Shape: the union+window as-of pattern. Both sides are tagged and unioned
  * into one relation keyed by `key`; a single running `max(event_struct)`
  * window ordered by `(ord, tag)` carries, at every anchor row, the best
  * event seen so far — strictly earlier events for `strict`, at-or-before
  * otherwise (the tag ordering places anchors before or after equal-ord
  * events). One hash exchange on the key, one sort, NO join: per-key cost is
  * O((|anchors| + |events|) log) instead of the |anchors|×|events| row
  * explosion an equi-join + ordering-post-filter would materialize — a hot
  * key with 1M events and 10k anchors costs ~1M window rows, not 10^10 join
  * rows.
  *
  * Tie-break among equal-ord events: the struct max picks the greatest
  * `(ord, payload...)` tuple, identical to `ORDER BY ord DESC, payload...
  * DESC LIMIT 1`.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * (rightOrd < leftOrd), per `key` (or `<=` when `strict = false`).
    * Output: all left columns + `asof_<payloadCol>` for each payload
    * column (null when no earlier right row exists). `leftId` is kept for
    * API stability but no longer needed: the window formulation never
    * regroups left rows, so duplicate `leftId` rows pass through unchanged
    * — each gets its own as-of match (the pre-round-2 groupBy form
    * collapsed them to one row per id; callers with non-unique ids now see
    * one output row per input row). */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
                 leftId: String, leftOrd: String, rightOrd: String,
                 payload: Seq[String], strict: Boolean = true): DataFrame = {
    // strict (<): anchors sort BEFORE events at equal ord, so the running
    // max at an anchor has seen only strictly-earlier events; non-strict
    // (<=): anchors sort after.
    val lt = left.schema(leftOrd).dataType
    val rt = right.schema(rightOrd).dataType
    require(lt == rt,
      s"as-of ordering columns must share a type (union'd): $leftOrd is " +
        s"$lt, $rightOrd is $rt — cast one side first")
    // both sides' key columns are union'd into one relation too — a type
    // mismatch would otherwise surface as an opaque unionByName error (or
    // silently widen)
    val lk = left.schema(key).dataType
    val rk = right.schema(key).dataType
    require(lk == rk,
      s"as-of key columns must share a type (union'd): left `$key` is " +
        s"$lk, right `$key` is $rk — cast one side first")
    val aTag = if (strict) 0 else 1
    val eTag = 1 - aTag
    val wStruct = struct((rightOrd +: payload).map(col): _*)
    val wType = right.select(wStruct.as("_w")).schema("_w").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val anchors = left.select(col(key).as("_k"), col(leftOrd).as("_ord"),
      lit(aTag).as("_tag"), lStruct.as("_l"), lit(null).cast(wType).as("_w"))
    // SQL join-null semantics: a null key or null ordering value on the
    // right can never satisfy the join condition, so such event rows are
    // dropped — otherwise Window.partitionBy would group null keys
    // together and a null-ord event (sorted nulls-first) could become a
    // non-null running-max winner. Null-key/ord ANCHORS still pass
    // through with asof_* = null (left-join semantics).
    val events = right
      .where(col(key).isNotNull && col(rightOrd).isNotNull)
      .select(col(key).as("_k"), col(rightOrd).as("_ord"),
        lit(eTag).as("_tag"), lit(null).cast(lType).as("_l"), wStruct.as("_w"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ord"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // running max skips null structs (anchor rows and the pre-first-event
    // prefix), so an anchor with no earlier event gets asof_* = null —
    // left-join semantics.
    val out = anchors.unionByName(events)
      .withColumn("_win", max(col("_w")).over(w))
      .where(col("_l").isNotNull)
    out.select(
      left.columns.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_win.$c").as(s"asof_$c")): _*)
  }
}
