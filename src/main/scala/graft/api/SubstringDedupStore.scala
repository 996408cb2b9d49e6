package graft.api

import graft.operators.{Ckpt, SubstringIndex, SuffixArray}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental substring-dedup store — the deployment packaging
  * of [[graft.operators.SubstringIndex]]: a growing corpus deduped after
  * every append, with the maintained artifacts written beside the data the
  * way [[graft.operators.VersionStore]] persists versions and the facade
  * persists its PQ codes. q111 proves the append path hash-identical to a
  * from-scratch rebuild; `bench/bench_r11_scale.json` prices the gap
  * (append ≪ rebuild, structurally — batch-proportional vs
  * corpus-proportional); this class makes the flow a durable API instead
  * of a recipe the caller re-derives.
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   corpus/epoch=N/    the batch APPENDED at epoch N (corpus = union ≤ N)
  *   index/epoch=N/     the FULL window-key index as of epoch N
  *   deduped/epoch=N/   the FULL deduped corpus as of epoch N
  *   _commits/N         empty marker file — the epoch's commit point
  * }}}
  *
  * Crash safety, single-writer (the store-wide contract): an epoch's three
  * artifact directories are written FIRST (idempotent overwrites), then
  * the marker is created atomically with overwrite=false. Readers resolve
  * the store at the highest MARKED epoch, so a crash mid-append leaves
  * unmarked litter that the retry simply overwrites; a replayed
  * append onto an already-marked epoch fails the marker create and is
  * rejected loudly (same duplicate-commit discipline as the streaming
  * staged renames — see [[graft.streaming.StreamingIngest
  * .processSubstringBatch]]).
  *
  * Costs, stated honestly: each append WRITES the full merged index and
  * full deduped corpus (read-optimized artifacts, one predictable scan to
  * open) while COMPUTING only batch + touched work — the I/O is the
  * artifact size, the compute is incremental. A deployment whose index
  * outgrows per-epoch rewrites holds partials instead and merges on read:
  * that trade is already built as the streaming path
  * ([[graft.streaming.StreamingIngest.readSubstringIndex]] +
  * [[graft.operators.SubstringIndex.dedupeWithIndex]]). Old epochs are
  * retained for time-travel/audit and prunable by deleting
  * `epoch<N` directories plus nothing else (markers are per-epoch).
  *
  * The reference engine has no substring machinery (vector-level dedup
  * only; reference storage_engine.py) — training-data-pipeline tier.
  */
class SubstringDedupStore private (val spark: SparkSession,
                                   val root: String, val window: Int) {

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(n: Long) = new Path(s"$root/_commits/$n")

  /** Highest committed epoch, or -1 for an empty/initialized-never store. */
  def epoch: Long = {
    val dir = new Path(s"$root/_commits")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"SubstringDedupStore at $root has no committed epoch")
    e
  }

  /** The full corpus at the latest committed epoch (union of appended
    * batches — epoch pruning via the partition column). */
  def corpus: DataFrame = {
    val e = requireCommitted()
    spark.read.option("basePath", s"$root/corpus")
      .parquet((0L to e).map(n => s"$root/corpus/epoch=$n"): _*)
      .select(col("doc_id"), col("text"))
  }

  /** The maintained window-key index at the latest committed epoch. */
  def index: DataFrame =
    spark.read.parquet(s"$root/index/epoch=${requireCommitted()}")

  /** The deduped corpus at the latest committed epoch. */
  def deduped: DataFrame =
    spark.read.parquet(s"$root/deduped/epoch=${requireCommitted()}")

  /** Dedup result as of a PAST committed epoch (audit/time-travel). */
  def dedupedAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    spark.read.parquet(s"$root/deduped/epoch=$e")
  }

  private def writeEpoch(n: Long, batch: DataFrame, idx: DataFrame,
                         ded: DataFrame): Unit = {
    batch.write.mode("overwrite").parquet(s"$root/corpus/epoch=$n")
    idx.write.mode("overwrite").parquet(s"$root/index/epoch=$n")
    ded.write.mode("overwrite").parquet(s"$root/deduped/epoch=$n")
    fs.mkdirs(marker(n).getParent)
    // atomic create, overwrite=false: the commit point; a second append
    // racing/replaying onto the same epoch fails HERE, after which its
    // (identical-input) artifact overwrites have harmed nothing
    val out = fs.create(marker(n), false)
    out.close()
  }

  /** Append a batch (ids strictly above every stored id — enforced by
    * [[graft.operators.SubstringIndex.appendDeduped]]'s guard), extend
    * the index, dedup incrementally, commit epoch+1. Returns the new
    * epoch. */
  def append(batch: DataFrame): Long = {
    val e = requireCommitted()
    val n = e + 1
    val b = Ckpt.eager(batch.select(col("doc_id").cast("long")
      .as("doc_id"), col("text").cast("string").as("text")))
    val baseDocs = corpus
    // the persisted artifacts, pinned once each across their consumers
    val idx = Ckpt.eager(spark.read.parquet(s"$root/index/epoch=$e"))
    val ded = SubstringIndex.appendDeduped(
      baseDocs, dedupedAt(e), idx, b, window)
    val nextIndex = SubstringIndex.extendIndex(idx, b, window)
    writeEpoch(n, b, nextIndex, ded)
    n
  }
}

object SubstringDedupStore {

  /** Create the store at `root` from an initial corpus: epoch 0 holds the
    * corpus itself, its index, and its from-scratch dedup. Fails loudly
    * if the root already has a committed epoch. */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           window: Int): SubstringDedupStore = {
    val s = new SubstringDedupStore(spark, root, window)
    require(s.epoch < 0,
      s"SubstringDedupStore already initialized at $root (epoch ${s.epoch})")
    val d = Ckpt.eager(docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").cast("string").as("text")))
    s.writeEpoch(0L, d,
      SubstringIndex.buildIndex(d, window),
      SuffixArray.substringDeduped(d, window))
    s
  }

  /** Open an existing store (any committed epoch present). */
  def open(spark: SparkSession, root: String,
           window: Int): SubstringDedupStore = {
    val s = new SubstringDedupStore(spark, root, window)
    s.requireCommitted()
    s
  }
}
