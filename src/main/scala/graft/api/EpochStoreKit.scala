package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery for the durable epoch-committed stores
  * ([[SubstringDedupStore]], [[FingerprintStore]], [[FuzzyKeyStore]],
  * [[SemanticDedupStore]]) — ONE implementation of the store-wide
  * contract so its crash-safety reasoning lives in one place:
  *
  *  - artifacts are written FIRST (idempotent overwrites), then the
  *    epoch's commit marker is created atomically with overwrite=false
  *    — unmarked litter is invisible to readers and a replayed commit
  *    onto a marked epoch fails loudly at the marker create;
  *  - readers resolve at the highest MARKED epoch;
  *  - delta-epoch artifact chains resolve LATEST-EPOCH-WINS per key
  *    from the governing snapshot (valid whenever rows are only added
  *    or relabeled, never deleted — each store documents why);
  *  - pruning only ever removes directories BELOW the latest snapshot,
  *    which readers never resolve, so an interrupted prune is finished
  *    by the next compaction's sweep.
  */
private[api] object EpochStoreKit {

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest numeric child of `dir` (commit/snapshot marker dirs), or
    * -1 when the directory does not exist / has no numeric child. */
  def maxMarked(fs: FileSystem, dir: Path): Long =
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(-1L)(math.max)

  /** Create an empty marker file atomically (overwrite=false): the
    * commit point. A second writer replaying the same epoch fails HERE,
    * after which its (identical-input) artifact overwrites have harmed
    * nothing. */
  def commitMarker(fs: FileSystem, marker: Path): Unit = {
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false)
    out.close()
  }

  /** Plain union of `kind`'s epoch directories `from..to` — the
    * resolution for artifacts whose epochs are DISJOINT row slices
    * (appended data, new-key index deltas). */
  def unionEpochs(spark: SparkSession, root: String, kind: String,
                  from: Long, to: Long,
                  outCols: Seq[String]): DataFrame =
    spark.read.option("basePath", s"$root/$kind")
      .parquet((from to to).map(n => s"$root/$kind/epoch=$n"): _*)
      .select(outCols.map(col): _*)

  /** LATEST-EPOCH-WINS resolution of a delta-epoch artifact chain:
    * epoch `from` must be a full snapshot; later epochs carry only new
    * or changed rows per `keyCols`. Single-epoch reads skip the window. */
  def resolveLatestWins(spark: SparkSession, root: String, kind: String,
                        from: Long, to: Long, keyCols: Seq[String],
                        outCols: Seq[String]): DataFrame = {
    val df = spark.read.option("basePath", s"$root/$kind")
      .parquet((from to to).map(n => s"$root/$kind/epoch=$n"): _*)
    if (from == to) df.select(outCols.map(col): _*)
    else df
      .withColumn("_rk", row_number().over(Window
        .partitionBy(keyCols.map(col): _*).orderBy(col("epoch").desc)))
      .where(col("_rk") === 1)
      .select(outCols.map(col): _*)
  }

  /** Delete `kind/epoch=N` directories with N below `snap`. Readers
    * never resolve below the latest snapshot, so this is safe to
    * (re-)run any time — compaction uses it both as its prune step and
    * as the recovery sweep for an interrupted prune. */
  def pruneEpochDirsBelow(fs: FileSystem, root: String, kind: String,
                          snap: Long): Unit = {
    val dir = new Path(s"$root/$kind")
    if (fs.exists(dir)) fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("epoch="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("epoch=").toLong).toOption
        .map(v => (v, st.getPath)))
      .filter(_._1 < snap)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Delete numeric marker files below `snap` in a marker directory. */
  def pruneMarkersBelow(fs: FileSystem, dir: Path, snap: Long): Unit =
    if (fs.exists(dir)) fs.listStatus(dir)
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption
        .map(v => (v, st.getPath)))
      .filter(_._1 < snap)
      .foreach { case (_, p) => fs.delete(p, true) }
}
