package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic version histories derived from the driver's
  * `embeddings` table (TESTDATA.md), replacing the reference's
  * `WikipediaSimulator` (/root/reference/simulation/wikipedia.py) whose
  * `datetime.now()` anchoring is not bit-reproducible (:129).
  *
  * Each embedding row becomes one content with [[NumVersions]] versions.
  * Version k's vector is a CLOSED-FORM edit of the original — expressible
  * identically in Spark and in the DuckDB oracle SQL:
  *
  *   v_k[i] = float( e[i] + 0.3  * [i % 12 == k % 12]
  *                        + 0.25 * [k == 9 && i % 4 != 0] )
  *
  * Consequences (with dim=64, interval=5, promotion ratio 0.7):
  *  - consecutive diffs touch ~11/64 dims (ratio ≈ 0.17 → delta);
  *  - k=9 and k=10 diffs touch >70% of dims → sparsity-promoted bases,
  *    exercising the reference's ratio rule (temporal_database.py:388-402);
  *  - interval bases at seq 1, 6, 11 — the reference's own test shape
  *    (tests/test_week2.py:405-463 uses bases {1,6,11} for 12 versions).
  *
  * The single cast-to-float happens at the same point in both engines, so
  * version vectors are bit-identical between Spark and the oracle.
  */
object SyntheticVersions {
  val Dim = 64
  val NumVersions = 12
  val Interval = 5

  val cfg: VersionStore.Config = VersionStore.Config(baseInterval = Interval)

  /** (content_id, seq, ts, embedding) rows, 12 versions per embedding.
    * Seqs come from an explode (a generator, map-only) rather than a
    * 12-row cross join, so no join node appears in any consumer's plan. */
  def build(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb.withColumn("seq",
      explode(lit((1 to NumVersions).toArray))).select(
      format_string("c%04d", col("vec_id")).as("content_id"),
      col("seq"),
      expr("timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,seq-1,0,0,0)")
        .as("ts"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double")
          + when(pmod(i, lit(12)) === pmod(col("seq"), lit(12)), lit(0.3))
            .otherwise(lit(0.0))
          + when(col("seq") === 9 && pmod(i, lit(4)) =!= 0, lit(0.25))
            .otherwise(lit(0.0))).cast("float")).as("embedding"))
  }

  /** The ingested versions table for the synthetic history, materialized to
    * parquet once per JVM+source-dir — the production shape (queries scan a
    * stored versions table with column pruning / predicate pushdown instead
    * of re-deriving it from `embeddings` per query). */
  def versions(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft_synth_versions_$key"
    synchronized {
      if (!materialized.contains(path)) {
        VersionStore.write(VersionStore.ingestWithSeq(build(spark, dir), cfg),
          path, numPartitions = 8)
        materialized += path
      }
    }
    spark.read.parquet(path)
  }

  private val materialized = scala.collection.mutable.Set[String]()

  /** Shared DuckDB CTE prefix reproducing [[build]] + the ingest kind
    * decision — prepended to the oracle SQL of every versioned-store query.
    * REAL casts sit at exactly the points where the Spark pipeline casts to
    * float, keeping both engines bit-identical pre-rounding.
    *
    * `d`/`vk` carry MATERIALIZED hints: DuckDB 1.0 inlines CTEs per
    * consumer by default, and every downstream oracle references `vk` 2-4
    * times — without the hint the whole synthetic-history replay re-runs
    * per reference (the round-6 oracle-cost blowup). */
  val oracleCte: String =
    """WITH v AS (
      |  SELECT printf('c%04d', vec_id) AS content_id, CAST(t.k AS INTEGER) AS seq,
      |         list_transform(range(0, 64), i -> CAST(
      |           CAST(embedding[i+1] AS DOUBLE)
      |           + (CASE WHEN (i % 12) = (t.k % 12) THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
      |           + (CASE WHEN t.k = 9 AND (i % 4) <> 0 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
      |           AS REAL)) AS emb
      |  FROM embeddings, generate_series(1, 12) t(k)),
      |p AS (
      |  SELECT content_id, seq, emb,
      |         lag(emb) OVER (PARTITION BY content_id ORDER BY seq) AS prev
      |  FROM v),
      |d AS MATERIALIZED (
      |  SELECT content_id, seq, emb, prev,
      |    CASE WHEN prev IS NULL THEN NULL ELSE
      |      len(list_filter(list_transform(range(0,64),
      |        i -> CAST(emb[i+1] AS DOUBLE) - CAST(prev[i+1] AS DOUBLE)),
      |        x -> abs(x) >= 0.01)) END AS n_changed,
      |    CASE WHEN prev IS NULL THEN NULL ELSE
      |      sqrt(list_sum(list_transform(range(0,64),
      |        i -> (CAST(emb[i+1] AS DOUBLE) - CAST(prev[i+1] AS DOUBLE))
      |           * (CAST(emb[i+1] AS DOUBLE) - CAST(prev[i+1] AS DOUBLE)))))
      |      END AS mag,
      |    CASE WHEN prev IS NULL THEN NULL ELSE
      |      list_transform(range(0,64), i ->
      |        CASE WHEN abs(CAST(emb[i+1] AS DOUBLE) - CAST(prev[i+1] AS DOUBLE)) >= 0.01
      |             THEN CAST(CAST(emb[i+1] AS DOUBLE) - CAST(prev[i+1] AS DOUBLE) AS REAL)
      |             ELSE CAST(0.0 AS REAL) END) END AS dstored
      |  FROM p),
      |vk AS MATERIALIZED (
      |  SELECT content_id, seq, emb, n_changed, mag, dstored,
      |    CASE WHEN seq = 1 THEN 'base'
      |         WHEN (seq - 1) % 5 = 0 THEN 'base'
      |         WHEN n_changed / 64.0 > 0.7 THEN 'base'
      |         ELSE 'delta' END AS kind
      |  FROM d)
      |""".stripMargin
}
