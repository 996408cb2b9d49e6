package graft.operators

import graft.functions.VectorFunctions.applyMapDeltaNative
import graft.model.Defaults
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Set-based version reconstruction (SURVEY §2 rows 19, 24-25, 41, 45;
  * reference read path /root/reference/core/reconstruction_service.py:61-127,
  * fold core/delta_computer.py:90-135).
  *
  * The reference reconstructs one version at a time: load the full timeline,
  * probe downward for the nearest base at-or-before the target
  * (core/data_structures.py:242-252), then fold the delta chain forward.
  * `batch_reconstruct` loops that per target (:176-183) despite claiming
  * reuse. Here ALL targets reconstruct in one job:
  *
  *   1. as-of join: targets × base seqs -> max(base_seq <= target) per
  *      target (equi-join on content_id + range post-filter, then a groupBy —
  *      both shuffle-partitioned by content, skew-free at scale);
  *   2. range join: deltas with base_seq < seq <= target_seq;
  *   3. fold: because delta application is pure element-wise addition, the
  *      chain is order-insensitive — explode (idx,val), sum per
  *      (content, target, idx), and scatter-add the summed map into the base
  *      vector. One shuffle keyed by (content_id, target_seq).
  *
  * Error/quality provenance columns reproduce the reference's formulas
  * (core/reconstruction_service.py:229-297).
  */
object Reconstruction {

  /** Reconstruct every (content_id, seq) in `targets` from `versions`.
    * Output: content_id, seq, embedding, base_seq_used, deltas_applied,
    * reconstruction_cost, plus error/quality metrics. Targets that precede
    * the earliest base produce no row (the reference raises there,
    * core/delta_computer.py:116-119). */
  def reconstruct(versions: DataFrame, targets: DataFrame): DataFrame = {
    val bases = versions.where(col("kind") === "base")
      .select(col("content_id"), col("seq").as("base_seq"),
        col("embedding").as("base_embedding"))
    val deltas = versions.where(col("kind") === "delta")
      .select(col("content_id"), col("seq").as("delta_seq"),
        col("delta_idx"), col("delta_val"), col("change_magnitude"))

    // 1. nearest base at-or-before target (as-of join, SURVEY row 24).
    val nearest = targets.select(col("content_id"), col("seq"))
      .join(bases.select(col("content_id"), col("base_seq")),
        Seq("content_id"))
      .where(col("base_seq") <= col("seq"))
      .groupBy("content_id", "seq")
      .agg(max("base_seq").as("base_seq"))

    val withBase = nearest.join(bases, Seq("content_id", "base_seq"))

    // 2-3. delta chain contributions summed per dimension (SURVEY row 19).
    val chain = nearest
      .join(deltas, Seq("content_id"))
      .where(col("delta_seq") > col("base_seq") &&
        col("delta_seq") <= col("seq"))

    val chainStats = chain.groupBy("content_id", "seq")
      .agg(count(lit(1)).cast("int").as("deltas_applied"),
        avg("change_magnitude").as("avg_chain_magnitude"))

    val contribs = chain
      .select(col("content_id"), col("seq"),
        explode(arrays_zip(col("delta_idx"), col("delta_val"))).as("p"))
      .groupBy(col("content_id"), col("seq"),
        col("p.delta_idx").as("idx"))
      .agg(sum(col("p.delta_val").cast("double")).as("add"))
      .groupBy("content_id", "seq")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("add"))))
        .as("add_map"))

    val folded = withBase
      .join(contribs, Seq("content_id", "seq"), "left")
      .join(chainStats, Seq("content_id", "seq"), "left")
      // compiled scatter+add (O(d + |map|) per row vs the HOF transform's
      // O(d·|map|) interpreted element_at scans) — bit-identical values
      .withColumn("embedding",
        when(col("add_map").isNull, col("base_embedding"))
          .otherwise(applyMapDeltaNative(col("base_embedding"),
            col("add_map"))))
      .withColumn("deltas_applied", coalesce(col("deltas_applied"), lit(0)))
      .withColumn("reconstruction_cost", col("seq") - col("base_seq"))

    withMetrics(folded)
      .select("content_id", "seq", "embedding", "base_seq",
        "deltas_applied", "reconstruction_cost", "estimated_error",
        "quality_score")
      .withColumnRenamed("base_seq", "base_seq_used")
  }

  /** Error-bound estimate and quality score, reproducing the reference's
    * deterministic formulas (core/reconstruction_service.py:229-297,
    * constants :57-59). Pure column expressions — codegen-friendly. */
  private def withMetrics(df: DataFrame): DataFrame = {
    val cost = col("reconstruction_cost").cast("double")
    val avgMag = coalesce(col("avg_chain_magnitude"), lit(0.0))
    val baseError = cost * Defaults.ErrorAccumulationRate
    val magFactor = lit(1.0) + lit(0.05) * avgMag
    val shortBonus = when(cost < 5, lit(0.9)).otherwise(lit(1.0))
    val estError = baseError * magFactor * shortBonus

    val chainPenalty =
      lit(1.0) - least(cost / Defaults.MaxChainLength, lit(1.0)) * lit(0.3)
    val errorPenalty = greatest(lit(0.5), lit(1.0) - estError * lit(10.0))
    val lowCostBonus = when(cost < 8, lit(1.1)).otherwise(lit(1.0))
    val quality = least(lit(1.0),
      greatest(lit(0.0), chainPenalty * errorPenalty * lowCostBonus))

    df.withColumn("estimated_error", estError)
      .withColumn("quality_score", quality)
  }

  /** Alternative reconstruction using the typed [[graft.functions.DeltaFoldAggregator]]
    * (SURVEY §7.3): one UDAF row per DELTA in the shuffle instead of one row
    * per changed dimension — ~n_changed× less shuffle volume on wide
    * chains. Values agree with [[reconstruct]] to float precision
    * (cross-checked in ReconstructionSpec); the posexplode formulation
    * remains the oracle-parity path. */
  def reconstructTyped(versions: DataFrame, targets: DataFrame,
                       dim: Int): DataFrame = {
    val bases = versions.where(col("kind") === "base")
      .select(col("content_id"), col("seq").as("base_seq"),
        col("embedding").as("base_embedding"))
    val deltas = versions.where(col("kind") === "delta")
      .select(col("content_id"), col("seq").as("delta_seq"),
        col("delta_idx"), col("delta_val"))

    val nearest = targets.select(col("content_id"), col("seq"))
      .join(bases.select(col("content_id"), col("base_seq")),
        Seq("content_id"))
      .where(col("base_seq") <= col("seq"))
      .groupBy("content_id", "seq")
      .agg(max("base_seq").as("base_seq"))

    val fold = graft.functions.DeltaFold(dim)
    val adds = nearest
      .join(deltas, Seq("content_id"))
      .where(col("delta_seq") > col("base_seq") &&
        col("delta_seq") <= col("seq"))
      .groupBy("content_id", "seq")
      .agg(fold(col("delta_idx"), col("delta_val")).as("add_arr"),
        count(lit(1)).cast("int").as("deltas_applied"))

    nearest.join(bases, Seq("content_id", "base_seq"))
      .join(adds, Seq("content_id", "seq"), "left")
      .withColumn("embedding",
        when(col("add_arr").isNull, col("base_embedding"))
          .otherwise(zip_with(col("base_embedding"), col("add_arr"),
            (b, a) => (b.cast("double") + a.cast("double")).cast("float"))))
      .withColumn("deltas_applied", coalesce(col("deltas_applied"), lit(0)))
      .withColumn("reconstruction_cost", col("seq") - col("base_seq"))
      .select("content_id", "seq", "embedding", "base_seq",
        "deltas_applied", "reconstruction_cost")
      .withColumnRenamed("base_seq", "base_seq_used")
  }

  /** Reconstruction validation (reference validate_reconstruction,
    * core/delta_computer.py:193-216): L2 error vs a ground-truth embedding,
    * tolerance check, and cosine similarity, as pure column expressions.
    * Input df needs `embedding` (reconstructed) and `expected` columns. */
  def validate(df: DataFrame,
               tolerance: Double = Defaults.ReconstructionTol): DataFrame = {
    import graft.functions.VectorFunctions._
    df.withColumn("l2_error", l2Dist(col("embedding"), col("expected")))
      .withColumn("is_valid", col("l2_error") < tolerance)
      .withColumn("cosine_similarity",
        cosine(col("embedding"), col("expected")))
  }

  /** Cost-estimate heuristic without reconstructing (reference
    * estimate_reconstruction_cost, core/delta_computer.py:218-271):
    * chain length, estimated error (cost·0.001 + magnitude & sparsity
    * penalties), and the `recommended` flag (cost < 10 && err < 0.05). */
  def costEstimate(versions: DataFrame, targets: DataFrame): DataFrame = {
    val deltas = versions.where(col("kind") === "delta")
      .select(col("content_id"), col("seq").as("delta_seq"),
        col("change_magnitude"), size(col("delta_idx")).as("n_changed"))
    val bases = versions.where(col("kind") === "base")
      .select(col("content_id"), col("seq").as("base_seq"))
    val nearest = targets.select(col("content_id"), col("seq"))
      .join(bases, Seq("content_id"))
      .where(col("base_seq") <= col("seq"))
      .groupBy("content_id", "seq").agg(max("base_seq").as("base_seq"))
    // range predicate inside the LEFT join condition — a post-join filter
    // would drop targets whose chain is empty (e.g. the target IS a base)
    nearest.as("t").join(deltas.as("dd"),
        col("t.content_id") === col("dd.content_id") &&
          col("dd.delta_seq") > col("t.base_seq") &&
          col("dd.delta_seq") <= col("t.seq"), "left")
      .groupBy(col("t.content_id").as("content_id"), col("t.seq").as("seq"),
        col("t.base_seq").as("base_seq"))
      .agg(count(col("dd.delta_seq")).cast("int").as("chain_length"),
        coalesce(avg(col("dd.change_magnitude")), lit(0.0))
          .as("avg_magnitude"))
      .withColumn("estimated_error",
        col("chain_length") * lit(0.001) *
          (lit(1.0) + lit(0.1) * col("avg_magnitude")))
      .withColumn("recommended",
        col("chain_length") < 10 && col("estimated_error") < 0.05)
  }

  /** Base-candidate enumeration for a target (reference
    * find_optimal_base_for_target, core/reconstruction_service.py:186-227):
    * every base at-or-before the target with its chain cost, cheapest
    * first — set-based over all targets at once. */
  def baseCandidates(versions: DataFrame, targets: DataFrame): DataFrame =
    targets.select(col("content_id"), col("seq"))
      .join(versions.where(col("kind") === "base")
        .select(col("content_id"), col("seq").as("base_seq")),
        Seq("content_id"))
      .where(col("base_seq") <= col("seq"))
      .withColumn("cost", col("seq") - col("base_seq"))
      .orderBy(col("content_id"), col("seq"), col("cost"))

  /** Reconstruction-cost audit without materializing embeddings: for every
    * version, the chain length from its nearest base (SURVEY row 41/59;
    * reference storage/temporal_database.py:443-494). */
  def costs(versions: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("content_id").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions
      .withColumn("nearest_base_seq",
        max(when(col("kind") === "base", col("seq"))).over(w))
      .withColumn("reconstruction_cost", col("seq") - col("nearest_base_seq"))
      .select("content_id", "seq", "kind", "nearest_base_seq",
        "reconstruction_cost")
  }
}
