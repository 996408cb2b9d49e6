package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Store/change/reconstruction statistics (SURVEY §2 rows 30-37; reference
  * /root/reference/storage/storage_engine.py:471-524,
  * core/data_structures.py:277-291, core/reconstruction_service.py:360-414,
  * storage/temporal_database.py:496-542).
  *
  * All statistics are single groupBy aggregations with map-side partial
  * aggregation — one shuffle each, no per-content loops (the reference caps
  * its "database statistics" at the first 5 contents because each is a full
  * timeline reload; Spark needs no such cap).
  */
object Statistics {

  /** Per-content counts + delta-magnitude stats (rows 30-31, 33). */
  def perContent(versions: DataFrame): DataFrame =
    versions.groupBy("content_id").agg(
      max("seq").as("max_seq"),
      count(lit(1)).cast("int").as("n_versions"),
      sum(when(col("kind") === "base", 1).otherwise(0)).cast("int")
        .as("n_bases"),
      sum(when(col("kind") === "delta", 1).otherwise(0)).cast("int")
        .as("n_deltas"),
      avg(when(col("kind") === "delta", col("change_magnitude")))
        .as("avg_delta_magnitude"),
      max(when(col("kind") === "delta", col("change_magnitude")))
        .as("max_delta_magnitude"),
      min(when(col("kind") === "delta", col("change_magnitude")))
        .as("min_delta_magnitude"))

  /** Fleet-wide rollup of [[perContent]] (row 35) — a second-level agg, not
    * a 5-content sample like the reference (:508). */
  def database(versions: DataFrame): DataFrame =
    perContent(versions).agg(
      count(lit(1)).cast("int").as("n_contents"),
      sum("n_versions").cast("long").as("total_versions"),
      sum("n_bases").cast("long").as("total_bases"),
      sum("n_deltas").cast("long").as("total_deltas"),
      avg("n_versions").as("avg_versions_per_content"),
      avg("avg_delta_magnitude").as("avg_delta_magnitude"))

  /** Reconstruction-cost stats with ~`stride`-strided sampling (rows 34, 42;
    * reference core/reconstruction_service.py:360-414). Promotion
    * recommendation when max sampled cost exceeds maxChain (:413). */
  def reconstructionStats(versions: DataFrame, stride: Int = 1,
                          maxChain: Int = 15): DataFrame = {
    val costs = Reconstruction.costs(versions)
      .where(pmod(col("seq"), lit(stride)) === 0)
    costs.groupBy("content_id").agg(
      avg("reconstruction_cost").as("avg_cost"),
      max("reconstruction_cost").as("max_cost"),
      count(lit(1)).cast("int").as("n_sampled"))
      .withColumn("recommend_promotion", col("max_cost") > maxChain)
  }

  /** Per-content statistics BUNDLE to the reference's
    * `get_content_statistics` shape (storage/temporal_database.py:301-330,
    * which merges change stats + reconstruction stats + an integrity
    * summary): [[perContent]] ⋈ [[reconstructionStats]] ⋈ issue counts from
    * [[Integrity.audit]], one row per content. Three aggregations over the
    * same content-keyed partitioning plus two content-keyed joins — no
    * per-content loops (the reference reloads the timeline three times per
    * content here). */
  def contentBundle(versions: DataFrame): DataFrame = {
    val issues = Integrity.audit(versions)
      .groupBy("content_id")
      .agg(count(lit(1)).cast("int").as("n_integrity_issues"))
    perContent(versions)
      .join(reconstructionStats(versions), Seq("content_id"), "left")
      .join(issues, Seq("content_id"), "left")
      .withColumn("n_integrity_issues",
        coalesce(col("n_integrity_issues"), lit(0)))
      .withColumn("timeline_valid", col("n_integrity_issues") === 0)
  }

  /** Storage-efficiency estimate vs dense full storage (reference
    * tests/test_week1.py:205-216): dense cells / stored cells.
    * `cellsPerEntry` = 2 counts the parallel idx+val arrays (honest storage
    * cost, the default); the reference's own estimate counts
    * `len(sparse_delta)` dict entries, i.e. cellsPerEntry = 1. */
  def storageEfficiency(versions: DataFrame, dim: Int,
                        cellsPerEntry: Int = 2): DataFrame =
    versions.agg(
      (count(lit(1)) * dim).cast("double").as("dense_cells"),
      sum(when(col("kind") === "base", lit(dim))
        .otherwise(size(col("delta_idx")) * cellsPerEntry)).cast("double")
        .as("stored_cells"))
      .withColumn("efficiency", col("dense_cells") / col("stored_cells"))
}
