package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle query surface. */
package object queries {

  /** Deterministic 4-decimal rounding identical in Spark and DuckDB:
    * floor(x·1e4 + 0.5)/1e4 in pure double arithmetic. Spark's ROUND
    * (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB's
    * (std::round(x·1e4)/1e4) disagree when a double sits within ~1e-9 of a
    * .00005 boundary; this formula is the same IEEE ops in both engines. */
  def r4(c: Column): Column =
    floor(c.cast("double") * 10000.0 + 0.5).cast("double") / 10000.0

  /** The DuckDB-side spelling of [[r4]]. */
  def r4sql(e: String): String = s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** Spread a small single-split source across the cluster before a
    * compute-heavy map stage. The driver's parquet files are one row group
    * each, so Spark gives them ONE partition — at production scale the
    * source has thousands of splits and this is a no-op-shaped concern, but
    * locally a 5 MB shuffle buys full-core parallelism for md5/regex-heavy
    * stages. */
  def par(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
