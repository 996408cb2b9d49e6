package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic distributed sketches. Spark's built-in approximations
  * (`approx_count_distinct` HLL++, `percentile_approx`) are
  * implementation-defined — no external engine can replay them, so they
  * can't pass a hash-compare gate and two engines profiling the same
  * corpus disagree. The sketches here trade a little efficiency for
  * DETERMINISM: md5-derived hashes and closed-form estimators, identical
  * in any engine that can md5 (the same portability discipline as the
  * engine's trainers).
  */
object Sketches {

  /** KMV (bottom-k / k-minimum-values) distinct-count estimate per group
    * — the classic mergeable distinct sketch (Bar-Yossef et al. 2002):
    * hash every value to a uniform 56-bit integer, keep each group's k
    * smallest DISTINCT hashes; with h_k the k-th smallest,
    * estimate = (k−1) · 2⁵⁶ / h_k (relative stderr ≈ 1/√(k−2)).
    * Groups with fewer than k distinct values report the EXACT count
    * (the sketch saw every value).
    *
    * Scale shape: the corpus shuffle is the (group, hash) distinct —
    * 16-byte rows with map-side partial dedup; the k-min selection is
    * the salted two-phase rank over ≤ distinct rows. Nothing else ever
    * moves, and the output is one row per group. At 100 TB this replaces
    * an exact COUNT(DISTINCT text) whose full-width shuffle is the cost
    * (the hash shuffle ships 16 B regardless of value width).
    *
    * Output: (group, n_kept, estimate) — estimate is exact-in-double
    * arithmetic on integers, so any engine replays it bit-for-bit. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashes = df.select(col(groupCol), Dedup.md5Long(value).as("hv"))
      .distinct()
    val kept = TopK.perKeySalted(hashes, groupCol, Seq(col("hv")), k)
    kept.groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max("hv").as("_hk"))
      .withColumn("estimate",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(72057594037927936.0) /
            col("_hk").cast("double")))
      .select(col(groupCol), col("n_kept"), col("estimate"))
  }
}
