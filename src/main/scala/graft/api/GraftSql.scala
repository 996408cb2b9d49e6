package graft.api

import graft.functions.{ApplyMapDeltaExpr, DotProduct, HyperplaneBucketExpr, L2NormalizeExpr, SimHashExpr, SparseDiffExpr}
import graft.sources.Tables
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
    * be compile-time constants — they size the generated code; any foldable
    * integer expression works, e.g. `6`, `CAST(6 AS BIGINT)`, `3+3`). */
  def registerFunctions(spark: SparkSession): Unit = {
    // fold a compile-time-constant argument to its value (covers plain
    // literals, casts of literals, and constant arithmetic alike)
    def fold(fn: String,
             e: org.apache.spark.sql.catalyst.expressions.Expression): Any = {
      if (!e.foldable) throw new IllegalArgumentException(
        s"$fn expects a compile-time constant, got $e")
      e.eval(null)
    }
    def intConst(fn: String,
                 e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      fold(fn, e) match {
        case i: Int => i
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"$fn expects an integer constant, got $other")
      }
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_hyperplane_bucket", exprs =>
      HyperplaneBucketExpr(exprs(0),
        intConst("graft_hyperplane_bucket", exprs(1)),
        intConst("graft_hyperplane_bucket", exprs(2))))
    Bridge.registerFunction(spark, "graft_minhash", exprs =>
      graft.functions.MinHashExpr(exprs(0),
        intConst("graft_minhash", exprs(1)),
        intConst("graft_minhash", exprs(2))))
    Bridge.registerFunction(spark, "graft_simhash", exprs =>
      SimHashExpr(exprs(0),
        if (exprs.length > 1) intConst("graft_simhash", exprs(1))
        else graft.operators.Dedup.SimhashBits))
    Bridge.registerFunction(spark, "graft_l2_scale",
      exprs => L2NormalizeExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_apply_delta",
      exprs => ApplyMapDeltaExpr(exprs(0), exprs(1)))
    Bridge.registerFunction(spark, "graft_sparse_diff", exprs => {
      val thr = fold("graft_sparse_diff", exprs(2)) match {
        case v: Double => v
        case v: org.apache.spark.sql.types.Decimal => v.toDouble
        case v: Float => v.toDouble
        case v: Int => v.toDouble
        case v: Long => v.toDouble
        case other => throw new IllegalArgumentException(
          s"graft_sparse_diff expects a numeric constant threshold, got $other")
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
