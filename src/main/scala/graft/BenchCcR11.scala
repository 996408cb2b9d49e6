package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental-component-maintenance economics probe (dev tool) — the
  * shape [[graft.operators.Dedup.extendComponents]] exists for: DENSE
  * duplicate clusters, where the old PAIR graph is quadratic in cluster
  * size (a K-member near-dup group verifies K(K−1)/2 pairs — the crawl
  * shape) while the persisted assignment is one row per member. The
  * probe builds C clusters × K members of synthetic edges (all
  * within-cluster pairs), persists the assignment, then times
  * star-extension with a few hundred cross-cluster joins against the
  * from-scratch closure of (old ∪ new) — both closure inputs pinned, so
  * the rows compare pure closure cost: |members|+|new| vs |pairs|+|new|.
  * On SPARSE graphs (2–3-member groups, e.g. the augDocs fixture) the
  * star graph is the pair graph and extension only adds loop overhead —
  * stated in the operator's scaladoc; this probe prices the dense
  * regime.
  *
  * One JSON line, the Bench* pattern. SPARK_GRAFT_CC_CLUSTERS /
  * SPARK_GRAFT_CC_K size the fixture (defaults 100 × 200 → ~2M old
  * pairs vs 20k assignment rows). */
object BenchCcR11 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R11_REPEATS", "3").toInt
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_CC_CLUSTERS", "100").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_CC_K", "200").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def floor(body: => Unit): Double =
      (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.min

    // nodes 0..C*K-1; cluster c owns [c*K, (c+1)*K); old edges = every
    // within-cluster pair (the verified near-dup pair list of a dense
    // duplicate group)
    val nodes = spark.range(nClusters.toLong * k)
      .select(col("id"), (col("id") / k).cast("long").as("c"))
    val oldEdges = graft.operators.Ckpt.eager(
      nodes.as("a").join(nodes.as("b"),
          col("a.c") === col("b.c") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")))
    val nOld = oldEdges.count()
    // the persisted artifact: component = cluster min (= c*K)
    val assignment = graft.operators.Ckpt.eager(
      nodes.select(col("id"), (col("c") * k).as("component")))
    // new edges: a few hundred cross-cluster joins (batch arrivals that
    // bridge existing clusters) + a fresh small cluster
    val newEdges = graft.operators.Ckpt.eager(
      spark.range(nClusters.toLong)
        .select((col("id") * k).as("id1"),
          (pmod(col("id") * 37 + 1, lit(nClusters)) * k + 5).as("id2"))
        .where(col("id1") =!= col("id2"))
        .unionByName(spark.range(100)
          .select((lit(nClusters.toLong * k) + col("id")).as("id1"),
            (lit(nClusters.toLong * k) + pmod(col("id") + 1, lit(100)))
              .as("id2"))
          .where(col("id1") < col("id2"))))
    val nNew = newEdges.count()

    val extendSec = floor {
      Dedup.extendComponents(assignment, newEdges)
        .write.format("noop").mode("overwrite").save()
    }
    // the cross-cluster bridges form a long chain (a permutation
    // cycle over clusters) — exactly the diameter regime the
    // large/small-star algorithm exists for; both sides run it
    val scratchSec = floor {
      Dedup.connectedComponentsStar(oldEdges.unionByName(newEdges))
        .write.format("noop").mode("overwrite").save()
    }
    // correctness of the probe itself: identical partitions
    val a = Dedup.extendComponents(assignment, newEdges)
      .select("id", "component")
    val b = Dedup.connectedComponentsStar(oldEdges.unionByName(newEdges))
      .select("id", "component")
    val same = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    println(
      s"""{"metric":"cc_r11","clusters":$nClusters,"k":$k,""" +
      s""""n_old_pairs":$nOld,"n_assignment":${nClusters.toLong * k},""" +
      s""""n_new_edges":$nNew,"repeats":$repeats,""" +
      s""""extend_sec":$extendSec,"scratch_sec":$scratchSec,""" +
      s""""identical":$same}""")
    spark.stop()
  }
}
