package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide registration of the engine's SQL surface through Spark's
  * standard extension point: set
  *
  * {{{
  * spark.sql.extensions=graft.api.GraftExtensions
  * }}}
  *
  * on any session (spark-submit conf, spark-defaults.conf, or
  * `SparkSession.builder.config`) and every graft function
  * (`graft_dot`, `graft_simhash`, `graft_minhash`,
  * `graft_hyperplane_bucket`, `graft_l2_scale`, `graft_apply_delta`,
  * `graft_sparse_diff`) is resolvable from SQL text in that session —
  * no driver-side [[GraftSql.registerFunctions]] call needed. This is the
  * deployment path for shared clusters / SQL gateways (Thrift server,
  * Connect) where user code never touches the session builder.
  *
  * The function list is [[GraftSql.functionBuilders]] — the same builders
  * the in-session registration uses, so both paths stay in lockstep. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftSql.functionBuilders.foreach { case (name, builder) =>
      extensions.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        builder))
    }
}
