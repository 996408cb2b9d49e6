package graft

import graft.operators.{Graph, IntervalJoin, Layout, Mixture, Packing}
import graft.queries.Temporal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-10 scale probes (dev tool, not a declared query): prices the
  * three new execution paths at the bench scale factor so the 10x/100x
  * varied fixtures give measured — not asserted — scaling evidence.
  *
  *  - `auto_tiny` / `auto_whale`: the tiered [[IntervalJoin.binnedAuto]]
  *    on the q98 point/interval mix, without and with 5 whole-domain
  *    whale intervals. The tiering claim: whales cost ~their OUTPUT
  *    (they match every point) plus 2 exploded rows each, never a
  *    domain/W bin fan-out — so wall tracks output rows.
  *  - `pagerank_conserving`: the q100b shape (directed cust->supplier,
  *    every supplier dangling, 10 rounds) vs the q100 drop-mass shape
  *    on the same corpus — the extra scalar aggregate per round priced.
  *  - `zorder_write`: [[Layout.zOrderLayout]] over orders with the
  *    div-first normalization, written to parquet — the kernel
  *    `compactStore(zorderBy)` runs (the facade adds only the store
  *    read, priced elsewhere).
  *
  * One JSON line, the Bench* pattern. */
object BenchScaleR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- q98-shaped points and intervals ---
    val cust = Tables.customer(spark, sfDir)
    val h = math.max(1L, cust.count() * 12L / 25L)
    val tiny = cust.select(col("c_custkey"),
        pmod(col("c_custkey") * 37, lit(h)).cast("long").as("lo"))
      .withColumn("hi",
        col("lo") + pmod(col("c_custkey"), lit(30)).cast("long") + 1L)
    val whales = spark.range(1, 6)
      .select((-col("id")).as("c_custkey"), lit(0L).as("lo"),
        lit(h - 1).as("hi"))
    val pts = Temporal.eventsUs(spark, sfDir).select(col("event_id"),
      expr("(ts_us - 1704067200000000) div 3600000000").as("hour"))
      .transform(graft.operators.Ckpt.eager(_)) // isolate join cost from scan
    val nPts = pts.count()

    val (tinyRows, tinySec) = time(
      IntervalJoin.binnedAuto(pts, tiny, "hour", "lo", "hi").count())
    val (whaleRows, whaleSec) = time(
      IntervalJoin.binnedAuto(pts, tiny.unionByName(whales),
        "hour", "lo", "hi").count())

    // --- PageRank: conserving vs drop-mass on the directed graph ---
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val directed = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .transform(graft.operators.Ckpt.eager(_))
    val nEdges = directed.count()
    val (_, prcSec) = time(Graph.pageRankConserving(directed, 10).count())
    val (_, prdSec) = time(Graph.pageRank(directed, 10).count())

    // --- z-order write kernel ---
    val o = orders.select(col("o_orderkey"), col("o_custkey"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("o_day"))
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_zwrite").toString
    val (_, zSec) = time(
      Layout.zOrderLayout(o, Seq("o_custkey", "o_day"), files = 32)
        .write.mode("overwrite").parquet(outDir))

    // --- packing + mixture over the documents corpus ---
    val docs = Tables.documents(spark, sfDir)
      .repartition(cpus.toInt * 2)
      .transform(graft.operators.Ckpt.eager(_)) // isolate op cost from scan
    val nDocs = docs.count()
    val (seqRows, seqSec) = time(
      Packing.packSequences(docs, seqLen = 2048).count())
    val (_, grdSec) = time(
      Packing.packGreedy(docs, seqLen = 2048,
        shards = math.max(64, (nDocs / 4096L).toInt)).count())
    val srcWeights = (0 until 20).map(i => s"src$i" -> 50000L).toMap
    val (_, mixSec) = time(
      Mixture.epochPlan(docs, srcWeights, tokenBudget = nDocs * 100L)
        .count())
    val (_, shfSec) = time(
      Mixture.shuffledOrder(docs.select("doc_id"), "doc_id").count())
    val (_, mftSec) = time(
      graft.operators.Pipeline.datasetManifest(docs
        .withColumn("source", lit("s")), "source").count())
    val perturbed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(37)) === 0,
        concat(col("text"), lit(" x"))).otherwise(col("text")))
      .where(pmod(col("doc_id"), lit(53)) =!= 0)
    val (diffRows, diffSec) = time(
      graft.operators.Pipeline.corpusDiff(docs, perturbed).count())

    println(
      s"""{"metric":"scale_r10","sf":"$sfDir","n_points":$nPts,""" +
      s""""n_edges":$nEdges,"auto_tiny_sec":$tinySec,""" +
      s""""auto_tiny_rows":$tinyRows,"auto_whale_sec":$whaleSec,""" +
      s""""auto_whale_rows":$whaleRows,""" +
      s""""pagerank_conserving_sec":$prcSec,"pagerank_drop_sec":$prdSec,""" +
      s""""zorder_write_sec":$zSec,"n_docs":$nDocs,""" +
      s""""pack_seq_sec":$seqSec,"pack_seq_rows":$seqRows,""" +
      s""""pack_greedy_sec":$grdSec,"epoch_plan_sec":$mixSec,""" +
      s""""shuffled_order_sec":$shfSec,"manifest_sec":$mftSec,""" +
      s""""diff_sec":$diffSec,"diff_rows":$diffRows}""")
    spark.stop()
  }
}
