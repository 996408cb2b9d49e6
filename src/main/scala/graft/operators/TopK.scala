package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-resistant per-key top-k (SURVEY §2 row 43 optimization path).
  *
  * A single `Window.partitionBy(key)` ranks each key on ONE task — with few
  * hot keys (e.g. 10 query ids ranking a whole corpus) most of the cluster
  * idles while hot keys sort millions of rows. The salted form runs two
  * phases: rank within (key, salt) — spreading each key over `salts`
  * tasks — keep k per salted group, then rank the ≤ k·salts survivors per
  * key. Output is IDENTICAL to the naive window provided `order` is a
  * total order (break ties!): any row in the true top-k is in the top-k of
  * its salted subgroup.
  */
object TopK {

  /** Keep the top `k` rows per `key` under `order` (must be total). */
  def perKeySalted(df: DataFrame, key: String, order: Seq[Column], k: Int,
                   salts: Int = 16): DataFrame = {
    // any deterministic-per-row salt works — correctness never depends on
    // the assignment, only the phase-2 re-rank does
    val salted = df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    val phase1 = salted
      .withColumn("_r1", row_number().over(
        Window.partitionBy(col(key), col("_salt")).orderBy(order: _*)))
      .where(col("_r1") <= k)
      .drop("_salt", "_r1")
    phase1.withColumn("rank", row_number().over(
        Window.partitionBy(col(key)).orderBy(order: _*)))
      .where(col("rank") <= k)
  }
}
