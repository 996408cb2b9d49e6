package graft

import graft.operators.{Reconstruction, VersionStore}
import graft.simulation.EvolutionSimulator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import java.nio.file.Files

/** Source/sink coverage (SURVEY §2.1): the reference supports only its own
  * HDF5 layout; the Spark engine gets parquet/JSON/CSV connectors for free.
  * Gate: the versions table survives a JSON round trip and reconstructs
  * identically, and the parquet store prunes scans by content_id. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val versions = VersionStore.ingestWithSeq(
    EvolutionSimulator.historyDf(spark, 3, 8, 32, seed = 7))

  test("versions table round-trips through JSON with identical reconstruction") {
    val dir = Files.createTempDirectory("graft-json").toFile.getAbsolutePath
    versions.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .withColumn("seq", col("seq").cast(IntegerType))
      .withColumn("from_seq", col("from_seq").cast(IntegerType))
      .withColumn("delta_idx",
        col("delta_idx").cast("array<int>"))
      .withColumn("delta_val", col("delta_val").cast("array<float>"))
      .withColumn("embedding", col("embedding").cast("array<float>"))

    val targets = Seq(("article_000", 5), ("article_002", 8))
      .toDF("content_id", "seq")
    val a = Reconstruction.reconstruct(versions, targets)
      .select("content_id", "seq", "embedding")
      .as[(String, Int, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    val b = Reconstruction.reconstruct(back, targets)
      .select("content_id", "seq", "embedding")
      .as[(String, Int, Array[Float])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(a.keySet == b.keySet && a.keySet.size == 2)
    for (k <- a.keySet) {
      val diff = a(k).zip(b(k)).map { case (x, y) => math.abs(x - y) }.max
      assert(diff < 1e-6, s"$k diff $diff")
    }
  }

  test("parquet store scan prunes by content_id predicate") {
    val dir = Files.createTempDirectory("graft-pq").toFile.getAbsolutePath
    VersionStore.write(versions, dir, numPartitions = 4)
    val scan = spark.read.parquet(dir)
      .where(col("content_id") === "article_001")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(content_id,article_001)"), plan)
    assert(scan.count() == 8)
  }
}
