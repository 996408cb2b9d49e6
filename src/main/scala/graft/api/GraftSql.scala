package graft.api

import graft.functions.DotProduct
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration (SURVEY §7.1 module 7): every engine capability
  * is reachable from Spark SQL text — driver tables as temp views and the
  * engine's custom expressions as SQL functions. */
object GraftSql {

  val TableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register graft's custom expressions (currently `graft_dot`). */
  def registerFunctions(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))

  /** Create temp views for the driver's parquet tables. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    TableNames.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
