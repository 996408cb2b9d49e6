package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager lineage truncation for iterative pyramids (suffix doubling,
  * PageRank rounds, connected-components label propagation) with a
  * cluster-fault-tolerance switch.
  *
  * Default mode is `localCheckpoint(eager = true)` — executor-local
  * blocks, zero extra I/O, the measured-right choice on a healthy
  * cluster (and the eager form is load-bearing: a lazy persist lets one
  * cache miss cascade a recompute through every prior level — measured
  * exponential, round-9 notes §7). But local checkpoint blocks are
  * NON-REPLICATED: on a real cluster, losing one executor at round N-1
  * of a 10-round PageRank or a 14-level suffix build kills the whole
  * job. Setting `spark.graft.checkpoint.reliable=true` (plus
  * `SparkContext.setCheckpointDir` to a fault-tolerant filesystem)
  * switches every pyramid to reliable `checkpoint(eager = true)` —
  * identical truncation semantics, identical results (spec-gated
  * bit-identical on the q96/q100 fixtures), at the price of one
  * write+read of the frame per round against the checkpoint dir. Flip
  * it when (expected executor-loss rate × pyramid depth × round cost)
  * exceeds that I/O tax — long jobs on preemptible/spot executors;
  * leave it off for short pyramids or on-demand nodes (SCALE.md §
  * fault tolerance). Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to let the
  * ContextCleaner reap checkpoint files as frames are dropped.
  */
object Ckpt {
  /** Session conf key selecting reliable (checkpoint-dir-backed)
    * truncation for all iterative operators. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** True when the session asks for reliable checkpoints. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableKey).contains("true")

  /** Truncate `df`'s lineage NOW, in the session-selected mode. */
  def eager(df: DataFrame): DataFrame =
    if (reliable(df)) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs SparkContext.setCheckpointDir to a " +
          "fault-tolerant path (HDFS/S3) before running iterative " +
          "operators")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
}
