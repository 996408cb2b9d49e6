package graft.api

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory with the engine's recommended
  * configuration — the settings that matter at 100 TB, applied locally too
  * so plans exercised in tests match production shapes. */
object GraftSession {

  /** @param shufflePartitions ~2-4× total cores; the driver harness uses
    *                          core count (local mode has no dynamic
    *                          executors to absorb extra waves). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // AQE: runtime coalescing, skew-join splitting, dynamic join strategy
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // parquet scans: keep split sizes bounded so wide embedding columns
      // don't produce executor-memory-sized partitions
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      // accept subset co-partitioning for joins: a store bucketed on
      // content_id then serves (content_id, seq) joins — reconstruction's
      // delta-fold — without reshuffling the big side (the parallelism
      // trade is bounded by the bucket count, which we size to the fleet)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // events table interop (TIMESTAMP(NANOS) parquet)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
