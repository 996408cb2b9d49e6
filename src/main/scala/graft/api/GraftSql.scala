package graft.api

import graft.functions.{ApplyMapDeltaExpr, DotProduct, DotProductDouble, HyperplaneBucketExpr, L2NormalizeExpr, SimHashExpr, SparseDiffExpr}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration (SURVEY §7.1 module 7): every engine capability
  * is reachable from Spark SQL text — driver tables as temp views and the
  * engine's custom expressions as SQL functions. */
object GraftSql {

  val TableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // fold a compile-time-constant argument to its value (covers plain
  // literals, casts of literals, and constant arithmetic alike)
  private def fold(fn: String,
                   e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn expects a compile-time constant, got $e")
    e.eval(null)
  }
  private def intConst(fn: String,
                       e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Int =
    fold(fn, e) match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn expects an integer constant, got $other")
    }

  /** Every graft SQL function as (name, expression builder) — the single
    * source both registration paths share: [[registerFunctions]] (into a
    * live session's registry) and [[GraftExtensions]] (injected at session
    * build via `spark.sql.extensions`). */
  private[api] val functionBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_dot" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))),
    "graft_dot_d" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductDouble(exprs(0), exprs(1))),
    "graft_hyperplane_bucket" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HyperplaneBucketExpr(exprs(0),
          intConst("graft_hyperplane_bucket", exprs(1)),
          intConst("graft_hyperplane_bucket", exprs(2)))),
    "graft_minhash" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.MinHashExpr(exprs(0),
          intConst("graft_minhash", exprs(1)),
          intConst("graft_minhash", exprs(2)))),
    "graft_simhash" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashExpr(exprs(0),
          if (exprs.length > 1) intConst("graft_simhash", exprs(1))
          else graft.operators.Dedup.SimhashBits)),
    "graft_l2_scale" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2NormalizeExpr(exprs(0), exprs(1))),
    "graft_apply_delta" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ApplyMapDeltaExpr(exprs(0), exprs(1))),
    "graft_sparse_diff" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
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
      }),
    // text kernels over the shipped default artifacts (a deployment
    // swapping in its own merge list / profiles uses the Scala API)
    "graft_bpe_merge_count" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeMergeCountExpr(exprs(0),
          graft.operators.TextAnalysis.BpeMergesDefault)),
    "graft_bpe_merge_tokens" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeMergeTokensExpr(exprs(0),
          graft.operators.TextAnalysis.BpeMergesDefault)),
    // lowercases the child at registration so a SQL caller passing raw
    // text scores identically to the Scala API (langScoresExpr always
    // wraps lower(text) — the trigram profiles are lowercase-only, so a
    // raw-cased input would silently miss every profile hit otherwise)
    "graft_lang_scores" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.LangTrigramScoresExpr(
          org.apache.spark.sql.catalyst.expressions.Lower(exprs(0)),
          graft.operators.TextAnalysis.LangTrigrams.map(_._2))),
    "graft_delete_variants" ->
      ((exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DeleteVariantsExpr(exprs(0),
          if (exprs.length > 1) intConst("graft_delete_variants", exprs(1))
          else 1)))

  /** Register graft's custom expressions: `graft_dot(a, b)` and
    * `graft_hyperplane_bucket(vec, nBits, table)` (the latter two args must
    * be compile-time constants — they size the generated code; any foldable
    * integer expression works, e.g. `6`, `CAST(6 AS BIGINT)`, `3+3`). */
  def registerFunctions(spark: SparkSession): Unit =
    functionBuilders.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }

  /** Create temp views for the driver's parquet tables. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    TableNames.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
