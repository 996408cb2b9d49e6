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
