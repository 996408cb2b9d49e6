package graft.api

import graft.functions.{ApplyMapDeltaExpr, DotProduct, HyperplaneBucketExpr, L2NormalizeExpr, SparseDiffExpr}
import graft.sources.Tables
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration (SURVEY §7.1 module 7): every engine capability
  * is reachable from Spark SQL text — driver tables as temp views and the
  * engine's custom expressions as SQL functions. */
object GraftSql {

  val TableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register graft's custom expressions: `graft_dot(a, b)` and
    * `graft_hyperplane_bucket(vec, nBits, table)` (the latter two args must
    * be integer literals — they size the generated code). */
  def registerFunctions(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_hyperplane_bucket", exprs => {
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_bucket expects integer literals, got $other")
        }
      HyperplaneBucketExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))
    })
    Bridge.registerFunction(spark, "graft_l2_scale",
      exprs => L2NormalizeExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_apply_delta",
      exprs => ApplyMapDeltaExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_sparse_diff", exprs => {
      val thr = exprs(2) match {
        case Literal(v: Double, _) => v
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
        case Literal(v: Float, _) => v.toDouble
        case other => throw new IllegalArgumentException(
          s"graft_sparse_diff expects a numeric literal threshold, got $other")
      }
      SparseDiffExpr(exprs(0), exprs(1), thr)
    })
  }

  /** Create temp views for the driver's parquet tables. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    TableNames.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
