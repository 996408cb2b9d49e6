package graft.queries

import graft.operators.{Statistics, SyntheticVersions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistics / storage-efficiency oracle queries (SURVEY §2.5 rows 30-37)
  * over the synthetic versions table. */
object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-content counts + delta-magnitude statistics (rows 30-31, 33).
    "q29_content_stats" -> ((s, d) =>
      Statistics.perContent(SyntheticVersions.versions(s, d))
        .select(col("content_id"), col("max_seq"), col("n_versions"),
          col("n_bases"), col("n_deltas"),
          r4(col("avg_delta_magnitude")).as("avg_mag"),
          r4(col("max_delta_magnitude")).as("max_mag"),
          r4(col("min_delta_magnitude")).as("min_mag"))
        .orderBy("content_id")),

    // storage efficiency vs dense full storage (test_week1.py:205-216).
    "q29b_storage_efficiency" -> ((s, d) =>
      Statistics.storageEfficiency(SyntheticVersions.versions(s, d),
        SyntheticVersions.Dim)
        .select(col("dense_cells"), col("stored_cells"),
          r4(col("efficiency")).as("efficiency"))),

    // reconstruction-cost stats per content (rows 34, 41).
    "q29c_recon_stats" -> ((s, d) =>
      Statistics.reconstructionStats(SyntheticVersions.versions(s, d))
        .select(col("content_id"), r4(col("avg_cost")).as("avg_cost"),
          col("max_cost"), col("n_sampled"), col("recommend_promotion"))
        .orderBy("content_id")),

    // the full content-statistics BUNDLE (reference get_content_statistics,
    // temporal_database.py:301-330) over the q16 gapped sample, so the
    // integrity component is exercised with real nonzero issue counts.
    "q29d_content_bundle" -> ((s, d) => {
      val versions = SyntheticVersions.versions(s, d)
      val cnum = substring(col("content_id"), 2, 10).cast("int")
      val sample = versions.where(
        !(pmod(cnum, lit(7)) === 0 && col("seq").isin(3, 7)))
      Statistics.contentBundle(sample)
        .select(col("content_id"), col("max_seq"), col("n_versions"),
          col("n_bases"), col("n_deltas"),
          r4(col("avg_delta_magnitude")).as("avg_mag"),
          r4(col("avg_cost")).as("avg_cost"), col("max_cost"),
          col("n_sampled"), col("recommend_promotion"),
          col("n_integrity_issues"), col("timeline_valid"))
        .orderBy("content_id")
    }),

    // version-id synthesis + parse round trip (SURVEY §2.9 rows 50-51;
    // reference data_structures.py:103-104, temporal_database.py:197-220).
    "q30_version_ids" -> ((s, d) =>
      SyntheticVersions.versions(s, d)
        .where(col("seq") <= 3)
        .select(col("content_id"), col("seq"),
          format_string("%s_v%d", col("content_id"), col("seq"))
            .as("version_id"))
        .withColumn("parsed_content",
          substring_index(col("version_id"), "_v", 1))
        .withColumn("parsed_seq",
          substring_index(col("version_id"), "_v", -1).cast("int"))
        .orderBy("content_id", "seq"))
  )

  private val cte = SyntheticVersions.oracleCte

  val oracle: Map[String, String] = Map(
    "q29_content_stats" -> (cte +
      s"""SELECT content_id,
        |  CAST(max(seq) AS INTEGER) AS max_seq,
        |  CAST(count(*) AS INTEGER) AS n_versions,
        |  CAST(count(*) FILTER (WHERE kind = 'base') AS INTEGER) AS n_bases,
        |  CAST(count(*) FILTER (WHERE kind = 'delta') AS INTEGER) AS n_deltas,
        |  ${r4sql("avg(mag) FILTER (WHERE kind = 'delta')")} AS avg_mag,
        |  ${r4sql("max(mag) FILTER (WHERE kind = 'delta')")} AS max_mag,
        |  ${r4sql("min(mag) FILTER (WHERE kind = 'delta')")} AS min_mag
        |FROM vk GROUP BY content_id ORDER BY content_id""".stripMargin),

    "q29b_storage_efficiency" -> (cte +
      s"""SELECT CAST(count(*) * 64 AS DOUBLE) AS dense_cells,
        |  CAST(sum(CASE WHEN kind = 'base' THEN 64
        |               ELSE n_changed * 2 END) AS DOUBLE) AS stored_cells,
        |  ${r4sql("CAST(count(*) * 64 AS DOUBLE) / CAST(sum(CASE WHEN kind = 'base' THEN 64 ELSE n_changed * 2 END) AS DOUBLE)")} AS efficiency
        |FROM vk""".stripMargin),

    "q30_version_ids" -> (cte +
      """SELECT content_id, seq,
        |  printf('%s_v%d', content_id, seq) AS version_id,
        |  str_split(printf('%s_v%d', content_id, seq), '_v')[1]
        |    AS parsed_content,
        |  CAST(str_split(printf('%s_v%d', content_id, seq), '_v')[-1]
        |    AS INTEGER) AS parsed_seq
        |FROM vk WHERE seq <= 3 ORDER BY content_id, seq""".stripMargin),

    "q29d_content_bundle" -> (cte +
      s""", smp AS (
        |  SELECT * FROM vk
        |  WHERE NOT (CAST(substr(content_id, 2) AS INTEGER) % 7 = 0
        |             AND seq IN (3, 7))),
        |pc AS (
        |  SELECT content_id,
        |    CAST(max(seq) AS INTEGER) AS max_seq,
        |    CAST(count(*) AS INTEGER) AS n_versions,
        |    CAST(count(*) FILTER (WHERE kind = 'base') AS INTEGER) AS n_bases,
        |    CAST(count(*) FILTER (WHERE kind = 'delta') AS INTEGER) AS n_deltas,
        |    ${r4sql("avg(mag) FILTER (WHERE kind = 'delta')")} AS avg_mag
        |  FROM smp GROUP BY content_id),
        |costs AS (
        |  SELECT v1.content_id, v1.seq, v1.seq - max(v2.seq) AS cost
        |  FROM smp v1 JOIN smp v2 ON v2.content_id = v1.content_id
        |    AND v2.kind = 'base' AND v2.seq <= v1.seq
        |  GROUP BY v1.content_id, v1.seq),
        |rc AS (
        |  SELECT content_id, ${r4sql("avg(cost)")} AS avg_cost,
        |    CAST(max(cost) AS INTEGER) AS max_cost,
        |    CAST(count(*) AS INTEGER) AS n_sampled,
        |    max(cost) > 15 AS recommend_promotion
        |  FROM costs GROUP BY content_id),
        |mx2 AS (SELECT content_id, max(seq) AS m FROM smp GROUP BY content_id),
        |expd2 AS (
        |  SELECT content_id, CAST(unnest(range(1, m + 1)) AS INTEGER) AS seq
        |  FROM mx2),
        |iss AS (
        |  SELECT content_id, CAST(count(*) AS INTEGER) AS n_iss FROM (
        |    SELECT e.content_id, e.seq FROM expd2 e
        |    WHERE NOT EXISTS (SELECT 1 FROM smp
        |      WHERE smp.content_id = e.content_id AND smp.seq = e.seq)
        |    UNION ALL
        |    SELECT d2.content_id, d2.seq
        |    FROM smp d2 WHERE d2.kind = 'delta' AND NOT EXISTS (
        |      SELECT 1 FROM smp p2 WHERE p2.content_id = d2.content_id
        |        AND p2.seq = d2.seq - 1)) u
        |  GROUP BY content_id)
        |SELECT pc.content_id, pc.max_seq, pc.n_versions, pc.n_bases,
        |  pc.n_deltas, pc.avg_mag, rc.avg_cost, rc.max_cost, rc.n_sampled,
        |  rc.recommend_promotion,
        |  coalesce(iss.n_iss, 0) AS n_integrity_issues,
        |  coalesce(iss.n_iss, 0) = 0 AS timeline_valid
        |FROM pc JOIN rc ON rc.content_id = pc.content_id
        |LEFT JOIN iss ON iss.content_id = pc.content_id
        |ORDER BY pc.content_id""".stripMargin),

    "q29c_recon_stats" -> (cte +
      s""", costs AS (
        |  SELECT v1.content_id, v1.seq,
        |    v1.seq - max(v2.seq) AS cost
        |  FROM vk v1 JOIN vk v2 ON v2.content_id = v1.content_id
        |    AND v2.kind = 'base' AND v2.seq <= v1.seq
        |  GROUP BY v1.content_id, v1.seq)
        |SELECT content_id, ${r4sql("avg(cost)")} AS avg_cost,
        |  CAST(max(cost) AS INTEGER) AS max_cost,
        |  CAST(count(*) AS INTEGER) AS n_sampled,
        |  max(cost) > 15 AS recommend_promotion
        |FROM costs GROUP BY content_id ORDER BY content_id""".stripMargin)
  )
}
