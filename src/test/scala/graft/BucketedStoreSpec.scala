package graft

import graft.operators.{BucketedStore, Reconstruction, VersionStore}
import graft.simulation.EvolutionSimulator
import org.apache.spark.sql.functions._

/** Bucketed-table layout: per-content aggregations over the bucketed
  * versions table run WITHOUT a shuffle exchange, and results match the
  * unbucketed path. */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val versions = VersionStore.ingestWithSeq(
    EvolutionSimulator.historyDf(spark, 5, 10, 32, seed = 3))

  test("groupBy(content_id) over a bucketed table has no shuffle exchange") {
    BucketedStore.write(versions, "graft_bucketed_test", buckets = 4)
    try {
      val agg = BucketedStore.read(spark, "graft_bucketed_test")
        .groupBy("content_id").agg(max("seq").as("max_seq"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)

      // same aggregation over the raw DataFrame must shuffle
      val rawPlan = versions.groupBy("content_id")
        .agg(max("seq")).queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning"))

      // and the values agree
      val a = agg.as[(String, Int)].collect().toMap
      val b = versions.groupBy("content_id").agg(max("seq").as("m"))
        .as[(String, Int)].collect().toMap
      assert(a == b)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_test")
  }

  test("bucketed facade: per-content reads and nearest-base reconstruction " +
    "run with ZERO hash exchanges, and results match the path-backed store") {
    import graft.api.{BucketedTemporalVectorDB, TemporalVectorDB}
    import java.nio.file.Files
    val history = EvolutionSimulator.historyDf(spark, 4, 9, 16, seed = 11)
      .select("content_id", "ts", "embedding")
    val bdb = new BucketedTemporalVectorDB(spark, "graft_bucketed_facade",
      VersionStore.Config(baseInterval = 5), buckets = 4)
    val dir = Files.createTempDirectory("tvdb-plain").toFile
    dir.delete()
    val pdb = new TemporalVectorDB(spark, dir.getAbsolutePath,
      VersionStore.Config(baseInterval = 5))
    try {
      bdb.addVersions(history)
      pdb.addVersions(history)
      // per-content max-seq aggregation: bucketing metadata must eliminate
      // the hash exchange entirely (broadcast of the tiny target side ok)
      val latest = bdb.versions.groupBy("content_id")
        .agg(max("seq").as("seq"))
      val aggPlan = latest.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)
      // the facade read path: reconstruction's nearest-base groupBy and
      // delta-chain join both consume the bucketed distribution
      val recon = bdb.getVersion("article_000", 7)
      val reconPlan = recon.queryExecution.executedPlan.toString
      assert(!reconPlan.contains("Exchange hashpartitioning"), reconPlan)
      // identical results to the plain path-backed facade
      val a = recon.select("content_id", "seq", "base_seq_used", "embedding")
        .as[(String, Int, Int, Seq[Float])].collect().toSeq
      val b = pdb.getVersion("article_000", 7)
        .select("content_id", "seq", "base_seq_used", "embedding")
        .as[(String, Int, Int, Seq[Float])].collect().toSeq
      assert(a == b && a.size == 1)
      // appends stay bucket-aligned: a second batch appends and the
      // exchange-free plan shape survives
      bdb.addVersions(Seq(("article_000",
        java.sql.Timestamp.valueOf("2025-06-01 00:00:00"),
        Array.fill(16)(0.9f))).toDF("content_id", "ts", "embedding"))
      assert(bdb.versions.where(col("content_id") === "article_000")
        .count() == 10)
      val plan2 = bdb.versions.groupBy("content_id").agg(max("seq"))
        .queryExecution.executedPlan.toString
      assert(!plan2.contains("Exchange hashpartitioning"), plan2)
      assert(bdb.validateTimelineIntegrity().count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_facade")
  }

  test("bucketed facade compaction: per-append bucket files collapse to " +
    "one file set; data and the exchange-free plan shape survive") {
    import graft.api.BucketedTemporalVectorDB
    val bdb = new BucketedTemporalVectorDB(spark, "graft_bucketed_compact",
      VersionStore.Config(baseInterval = 5), buckets = 4)
    try {
      // three appends -> three file sets per bucket
      (1 to 3).foreach { b =>
        bdb.addVersions((0 until 4).map(i =>
          (s"c$i", java.sql.Timestamp.valueOf(f"2025-06-0$b 00:00:00"),
            Array.fill(8)(0.1f * b))).toDF("content_id", "ts", "embedding"))
      }
      val rows = bdb.versions.select("content_id", "seq")
        .as[(String, Int)].collect().sorted.toSeq
      // single write task -> exactly one file per bucket
      val (nb, na) = bdb.compactStore(targetPartitions = 1)
      assert(nb > na && na <= 4L, s"$nb -> $na")
      assert(bdb.versions.select("content_id", "seq")
        .as[(String, Int)].collect().sorted.toSeq == rows)
      // bucketing metadata survives the rewrite: still exchange-free
      val plan = bdb.versions.groupBy("content_id").agg(max("seq"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(bdb.validateTimelineIntegrity().count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_compact")
  }

  test("bucketed facade persists + reloads its maintained indexes under " +
    "the warehouse (table name is not a filesystem path)") {
    import graft.api.BucketedTemporalVectorDB
    val history = EvolutionSimulator.historyDf(spark, 4, 6, 16, seed = 23)
      .select("content_id", "ts", "embedding")
    val bdb = new BucketedTemporalVectorDB(spark, "graft_bucketed_persist",
      VersionStore.Config(baseInterval = 5), buckets = 4)
    try {
      bdb.addVersions(history)
      val q = history.where(col("content_id") === "article_000")
        .orderBy(desc("ts")).select("embedding")
        .as[Seq[Float]].collect().head.toArray
      val before = bdb.searchLatestVersionsPq(q, k = 2, refine = 4)
        .select("rank", "id").as[(Int, String)].collect().toSeq
      bdb.persistIndexes()
      val bdb2 = new BucketedTemporalVectorDB(spark,
        "graft_bucketed_persist", VersionStore.Config(baseInterval = 5),
        buckets = 4)
      assert(bdb2.loadIndexes())
      val after = bdb2.searchLatestVersionsPq(q, k = 2, refine = 4)
        .select("rank", "id").as[(Int, String)].collect().toSeq
      assert(after == before && before.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_persist")
  }

  test("reconstruction over the bucketed store matches the plain store") {
    BucketedStore.write(versions, "graft_bucketed_test2", buckets = 4)
    try {
      val targets = Seq(("article_000", 7), ("article_004", 10))
        .toDF("content_id", "seq")
      val plain = Reconstruction.reconstruct(versions, targets)
        .select("content_id", "seq", "reconstruction_cost")
        .as[(String, Int, Int)].collect().toSet
      val bucketed = Reconstruction.reconstruct(
        BucketedStore.read(spark, "graft_bucketed_test2"), targets)
        .select("content_id", "seq", "reconstruction_cost")
        .as[(String, Int, Int)].collect().toSet
      assert(plain == bucketed && plain.size == 2)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_test2")
  }
}
