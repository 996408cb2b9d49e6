package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Link-graph authority scoring — integer-exact PageRank (Page et al.
  * 1999). Web-scale curation pipelines rank pages by link authority
  * before quality filtering (a crawl's highest-value documents are the
  * ones the rest of the graph points at); the reference engine has no
  * graph machinery at all, so this targets the lake-deployment shape
  * of this library the same way the dedup components do.
  *
  * Everything is EXACT LONG arithmetic (the repo-wide oracle
  * discipline): ranks live at a fixed integer `scale`, each edge
  * forwards `rank div out_degree`, damping is `(x * dampNum) div
  * dampDen` — every step is replayable bit for bit by a DuckDB `//`
  * CTE chain, so hash equality checks the whole iteration, not a
  * float within epsilon.
  *
  * Scale shape: one pass builds out-degrees and pins them to the edge
  * list (checkpointed — it is re-read every round); each iteration is
  * ONE shuffle of edge size (join ranks on src, groupBy dst) plus a
  * node-sized left join, with the lineage truncated per round by an
  * eager localCheckpoint (the round-9 suffix-array lesson: lazy plans
  * cascade recomputes exponentially across iteration pyramids). Total
  * cost O(iters) edge-sized shuffles — the standard distributed
  * PageRank bound; nothing is ever collected to the driver except the
  * node count.
  *
  * Dangling nodes (out-degree 0): [[pageRank]] lets their mass leave
  * the system (order-preserving, one-join exact — fine when dangling
  * nodes are rare); [[pageRankConserving]] redistributes it uniformly
  * each round (the textbook stochastic-matrix fix — one extra scalar
  * aggregate per round), the right variant when dangling nodes
  * dominate (crawl frontiers). Edge multiplicity counts (a multigraph
  * edge forwards twice); callers wanting a simple graph pass
  * `edges.distinct()`.
  */
object Graph {

  /** (node, rank) at fixed integer scale after `iters` rounds.
    *
    * rank_0      = scale div N
    * rank_{t+1}  = (scale * (dampDen-dampNum) div dampDen) div N
    *             + (sum over in-edges of rank_t div out_deg) * dampNum
    *               div dampDen
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    pageRankImpl(edges, iters, dampNum, dampDen, scale, srcCol, dstCol,
      conserve = false)

  /** [[pageRank]] with the textbook-exact dangling-mass treatment: each
    * round, the summed rank of out-degree-0 nodes is redistributed
    * uniformly (`danglingSum div N` added to every node's contribution
    * BEFORE damping — Page et al. 1999's stochastic-matrix fix) instead
    * of leaving the system. Costs one extra node-sized semi-join + a
    * scalar aggregate per round; everything stays exact long
    * arithmetic, replayed by the q100b oracle in the same `//` CTE
    * chain. Prefer this on crawl-shaped graphs where dangling pages are
    * the MAJORITY (freshly discovered frontier URLs): the drop-mass
    * variant deflates everyone's rank toward the teleport floor there,
    * compressing the ranking signal curation consumes. */
  def pageRankConserving(edges: DataFrame, iters: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    pageRankImpl(edges, iters, dampNum, dampDen, scale, srcCol, dstCol,
      conserve = true)

  private def pageRankImpl(edges: DataFrame, iters: Int,
               dampNum: Long, dampDen: Long, scale: Long,
               srcCol: String, dstCol: String,
               conserve: Boolean): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampDen > dampNum && dampNum > 0,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // Out-degrees pinned to the edges once: the per-iteration join then
    // needs only the rank table. Checkpointed eagerly — this frame is
    // scanned every round.
    val eDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("out_deg")), "src")
      .transform(Ckpt.eager)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .transform(Ckpt.eager)
    val n = nodes.count()
    require(n > 0, "empty graph")
    // dangling = nodes that never appear as a src; pinned once (scanned
    // every round in conserving mode)
    val dangling = if (!conserve) null
      else nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").transform(Ckpt.eager)

    val teleport = scale * (dampDen - dampNum) / dampDen / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      // uniform share of this round's dangling mass (driver-side scalar
      // — the ONE value collected per round beyond the node count)
      val share = if (!conserve) 0L
        else ranks.join(dangling, Seq("node"), "left_semi")
          .agg(coalesce(sum("rank"), lit(0L))).first().getLong(0) / n
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(call_function("div", col("rank"), col("out_deg")))
          .as("_c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            call_function("div",
              (coalesce(col("_c"), lit(0L)) + lit(share)) * dampNum,
              lit(dampDen)))
            .as("rank"))
        .transform(Ckpt.eager)
    }
    ranks
  }

  /** Bipartite purchased-from graph over the fixture star schema:
    * customer and supplier keys share a numeric domain, so nodes are
    * namespaced 2c / 2s+1; each DISTINCT (customer, supplier) trading
    * pair contributes both directed edges (rank flows both ways —
    * a one-way bipartite graph is rank-dead after one round). */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
  }
}
