package graft

import graft.queries.{DedupQueries, ExtQueries, GraphQueries, IntervalQueries, LayoutQueries, PipelineQueries, Relational, ScaleQueries, StatsQueries, SuffixQueries, Temporal, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared oracle surface (SURVEY §2.10): every
  * entry has a DuckDB-equivalent SQL in `oracleSql` with identical column
  * names/types and a total ORDER BY, so the driver's hash compare is
  * deterministic.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Temporal.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ ExtQueries.queries ++ StatsQueries.queries ++
      ScaleQueries.queries ++ PipelineQueries.queries ++
      SuffixQueries.queries ++ LayoutQueries.queries ++
      IntervalQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Temporal.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ ExtQueries.oracle ++ StatsQueries.oracle ++
      ScaleQueries.oracle ++ PipelineQueries.oracle ++
      SuffixQueries.oracle ++ LayoutQueries.oracle ++
      IntervalQueries.oracle ++ GraphQueries.oracle
}
