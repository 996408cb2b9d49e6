package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer-exact PageRank vs a sequential reference: hand-checkable
  * graphs (cycle symmetry, star concentration), a seeded random
  * multigraph, dangling-node semantics (mass dropped, base rank kept),
  * and input validation. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Sequential replay of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = Scale, dampNum: Long = 85,
                        dampDen: Long = 100): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport = scale * (dampDen - dampNum) / dampDen / n
    var ranks = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ranks(s) / outDeg(s) }.sum
      }
      ranks = nodes.map(v =>
        v -> (teleport + contrib.getOrElse(v, 0L) * dampNum / dampDen)).toMap
    }
    ranks
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cycle symmetry: every node of a 4-cycle holds the same rank") {
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = run(edges, 10)
    assert(got.values.toSet.size === 1)
    assert(got === reference(edges, 10))
  }

  test("star concentration: the hub out-ranks every leaf") {
    // leaves 2..6 all point at 1; 1 points back at 2 only
    val edges = Seq[(Long, Long)]((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L), (1L, 2L))
    val got = run(edges, 10)
    assert(got === reference(edges, 10))
    // the hub and its sole target (which receives the hub's ENTIRE rank
    // each round — their mutual order oscillates by parity) both
    // out-rank every plain leaf
    assert((3L to 6L).forall(l => got(1L) > got(l)))
    assert((3L to 6L).forall(l => got(2L) > got(l)))
  }

  test("dangling node: forwards nothing, keeps teleport-only rank") {
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 1L), (1L, 9L))
    val got = run(edges, 5)
    val ref = reference(edges, 5)
    assert(got === ref)
    // node 9 has no out-edges: its rank is teleport + damped inflow,
    // and nothing downstream ever receives from it
    val teleport = Scale * 15 / 100 / 4
    assert(got(9L) >= teleport)
  }

  test("seeded random multigraph matches the sequential reference " +
    "(duplicate edges forward twice)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges, 10)
    assert(got === reference(edges, 10))
  }

  test("tradeEdges namespaces and symmetrizes distinct pairs") {
    val orders = Seq((10L, 7L), (11L, 7L), (12L, 8L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 3L), (10L, 3L), (11L, 3L), (12L, 4L))
      .toDF("l_orderkey", "l_suppkey")
    val got = Graph.tradeEdges(orders, li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // distinct pairs: (7,3), (8,4) -> nodes 14,16 (cust) and 7,9 (supp)
    assert(got === Set((14L, 7L), (7L, 14L), (16L, 9L), (9L, 16L)))
  }

  /** Sequential replay of the CONSERVING recurrence: each round the
    * dangling mass is summed, divided by N (floor), and added to every
    * node's pre-damping contribution. */
  private def referenceConserving(edges: Seq[(Long, Long)], iters: Int,
                                  scale: Long = Scale, dampNum: Long = 85,
                                  dampDen: Long = 100): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport = scale * (dampDen - dampNum) / dampDen / n
    var ranks = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val share =
        nodes.filterNot(outDeg.contains).map(ranks).sum / n
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ranks(s) / outDeg(s) }.sum
      }
      ranks = nodes.map(v => v ->
        (teleport + (contrib.getOrElse(v, 0L) + share) * dampNum / dampDen))
        .toMap
    }
    ranks
  }

  private def runConserving(edges: Seq[(Long, Long)],
                            iters: Int): Map[Long, Long] =
    Graph.pageRankConserving(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("conserving variant matches its sequential reference on a " +
    "dangling-heavy graph and keeps total mass near scale where the " +
    "drop-mass variant deflates toward the teleport floor") {
    // crawl-frontier shape: 3 core pages link each other AND 9 dangling
    // frontier nodes — 75% of nodes have no out-edges
    val core = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 1L))
    val frontier = for {
      s <- 1L to 3L; d <- 10L to 18L if (d - 10) % 3 == s - 1
    } yield (s, d)
    val edges = core ++ frontier
    val iters = 10
    val got = runConserving(edges, iters)
    assert(got === referenceConserving(edges, iters))
    // mass conservation (up to integer-floor leakage, < 1 unit/node/round)
    val n = got.size.toLong
    val conservedTotal = got.values.sum
    val droppedTotal = run(edges, iters).values.sum
    assert(conservedTotal > Scale - iters * n * 2,
      s"conserving total $conservedTotal")
    // drop-mass loses the frontier's entire damped mass every round
    assert(droppedTotal < conservedTotal * 85L / 100L,
      s"dropped $droppedTotal vs conserved $conservedTotal")
    // no dangling nodes -> the two variants agree exactly
    val cycle = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 1L))
    assert(runConserving(cycle, 5) === run(cycle, 5))
  }

  test("conserving variant on a seeded random graph with dangling sinks " +
    "matches the sequential reference") {
    val rnd = new scala.util.Random(7)
    // 15 linkers + 10 pure sinks (ids 20..29 never appear as src)
    val edges = Seq.fill(80)(
      (rnd.nextInt(15).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    assert(runConserving(edges, 10) === referenceConserving(edges, 10))
  }

  test("input validation fails loudly") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e, dampNum = 100, dampDen = 100))
    intercept[IllegalArgumentException](
      Graph.pageRank(spark.emptyDataset[(Long, Long)].toDF("src", "dst")))
  }
}
