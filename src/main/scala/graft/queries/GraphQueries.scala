package graft.queries

import graft.operators.Graph
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Link-graph oracle queries (round 9): integer-exact PageRank over the
  * bipartite customer-supplier trading graph. The oracle UNROLLS every
  * iteration as a chained CTE — `//` contributions, `// 100` damping —
  * so hash equality checks the whole fixed-point computation, not a
  * converged summary. */
object GraphQueries {

  private val Iters = 10
  private val Scale = 1000000000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q100: authority rank of every customer/supplier node after 10
    // exact-integer PageRank rounds on the distinct trading-pair graph
    // (both directions per pair). Node ids namespaced 2c / 2s+1.
    "q100_pagerank" -> ((s, d) => {
      val edges = Graph.tradeEdges(Tables.orders(s, d), Tables.lineitem(s, d))
      Graph.pageRank(edges, iters = Iters, scale = Scale)
        .select(col("node"), col("rank"))
        .orderBy("node")
    }),
    // Q100b: the conserving variant on the DIRECTED customer->supplier
    // graph — every supplier is dangling (no out-edges), the
    // crawl-frontier shape where drop-mass PageRank deflates everyone
    // toward the teleport floor. Each round's dangling sum is
    // redistributed uniformly; the oracle replays the redistribution
    // (`// n` share) inside the same `//` CTE chain.
    "q100b_pagerank_conserving" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val edges = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      Graph.pageRankConserving(edges, iters = Iters, scale = Scale)
        .select(col("node"), col("rank"))
        .orderBy("node")
    })
  )

  /** One CTE per iteration: contribution sum keyed by dst, teleport +
    * damped forward in the same `//` order the operator uses. Every
    * multiply-consumed CTE is MATERIALIZED (edges/deg/nodes are read
    * each round; DuckDB inlines per consumer otherwise). */
  private def pagerankSql(iters: Int, scale: Long): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT nd.node AS node,
         |    CAST(($scale * 15) // 100 // nn.n
         |      + (COALESCE(agg.c, 0) * 85) // 100 AS BIGINT) AS rank
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(r.rank // deg.d) AS BIGINT) AS c
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) agg ON agg.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION ALL SELECT s AS src, c AS dst FROM pairs),
       |deg AS MATERIALIZED (
       |  SELECT src, count(*) AS d FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges
       |    UNION ALL SELECT dst AS node FROM edges)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, CAST($scale // n AS BIGINT) AS rank
       |  FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** The conserving unroll over the one-way graph: per round, a share
    * CTE computes `sum(rank of dangling) // n` and every node's damped
    * term becomes `((COALESCE(c,0) + share) * 85) // 100` — the exact
    * arithmetic [[Graph.pageRankConserving]] runs, dangling set
    * included (nodes never appearing as src). */
  private def pagerankConservingSql(iters: Int, scale: Long): String = {
    val steps = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT CAST(COALESCE((SELECT SUM(r.rank) FROM r${k - 1} r
         |      JOIN dangling dn ON dn.node = r.node), 0)
         |    // (SELECT n FROM nn) AS BIGINT) AS share),
         |r$k AS MATERIALIZED (
         |  SELECT nd.node AS node,
         |    CAST(($scale * 15) // 100 // nn.n
         |      + ((COALESCE(agg.c, 0) + ds.share) * 85) // 100
         |      AS BIGINT) AS rank
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$k ds
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(r.rank // deg.d) AS BIGINT) AS c
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) agg ON agg.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |deg AS MATERIALIZED (
       |  SELECT src, count(*) AS d FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges
       |    UNION ALL SELECT dst AS node FROM edges)),
       |dangling AS MATERIALIZED (
       |  SELECT node FROM nodes
       |  WHERE node NOT IN (SELECT src FROM edges)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, CAST($scale // n AS BIGINT) AS rank
       |  FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, rank FROM r$iters ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q100_pagerank" -> pagerankSql(Iters, Scale),
    "q100b_pagerank_conserving" -> pagerankConservingSql(Iters, Scale)
  )
}
