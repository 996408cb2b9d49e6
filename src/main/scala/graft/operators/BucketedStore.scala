package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for the versions table (SURVEY §1.3 / cluster-scale
  * layout): `bucketBy(content_id)` + `sortBy(content_id, seq)` makes every
  * per-content aggregation and every content-keyed join SHUFFLE-FREE — the
  * bucketing metadata tells Catalyst the data is already hash-distributed
  * on the key, so `groupBy(content_id)`, the nearest-base as-of join, and
  * the delta-chain join all skip their exchanges. On a 1000-executor
  * cluster over 100 TB this removes the dominant data movement of the read
  * path; locally it is exercised through the session catalog's
  * spark-warehouse. */
object BucketedStore {

  /** Persist as a bucketed managed table. Bucket count should approximate
    * cluster parallelism (e.g. 4× total cores). */
  def write(versions: DataFrame, table: String, buckets: Int = 32): Unit =
    versions.write.mode("overwrite")
      .bucketBy(buckets, "content_id")
      .sortBy("content_id", "seq")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
