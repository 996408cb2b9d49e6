package graft.api

import graft.operators.{Ckpt, SubstringIndex, SuffixArray}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED incremental substring-dedup store — the deployment packaging
  * of [[graft.operators.SubstringIndex]]: a growing corpus deduped after
  * every append, with the maintained artifacts written beside the data the
  * way [[graft.operators.VersionStore]] persists versions and the facade
  * persists its PQ codes. q111 proves the append path hash-identical to a
  * from-scratch rebuild; this class makes the flow a durable API AND keeps
  * per-append WRITE volume batch-proportional: an append persists only
  * the index rows its batch touched and the deduped rows it changed
  * (touched ∪ batch), never the full corpus artifacts — the round-11
  * design's one O(corpus)-per-append cost, removed.
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   corpus/epoch=N/    the batch APPENDED at epoch N (corpus = union ≤ N)
  *   index/epoch=N/     snapshot epochs: the FULL window-key index;
  *                      delta epochs: merged rows for BATCH-PRESENT keys
  *   deduped/epoch=N/   snapshot epochs: the FULL deduped corpus;
  *                      delta epochs: the rows the append CHANGED
  *                      (recomputed touched base docs + the new batch)
  *   _commits/N         empty marker file — the epoch's commit point
  *   _snapshots/N       marks epoch N's index/deduped as full snapshots
  * }}}
  *
  * Epoch 0 (init) is a snapshot; [[append]] writes deltas; readers resolve
  * at the latest committed epoch by LATEST-EPOCH-WINS — per window key for
  * the index (the [[graft.operators.SubstringIndex.extendIndexDelta]] merge
  * is per-key, so a key untouched since epoch k is byte-identical to k's
  * row) and per doc_id for the deduped corpus (an untouched doc's latest
  * row is the last epoch that rewrote it). [[compact]] rewrites the
  * resolved state as ONE new snapshot epoch and prunes the absorbed
  * index/deduped delta directories (the
  * [[graft.streaming.StreamingIngest.compactDeltas]] generation
  * discipline applied to the epoch chain) — bounding read-side resolution
  * work on a long-lived store. `corpus/` epochs are NEVER pruned: each
  * holds an appended batch, i.e. the data itself, not a derived snapshot.
  *
  * Crash safety, single-writer (the store-wide contract): an epoch's
  * artifact directories are written FIRST (idempotent overwrites), then
  * the commit marker is created atomically with overwrite=false. Readers
  * resolve at the highest MARKED epoch, so a crash mid-append leaves
  * unmarked litter the retry simply overwrites; a replayed append onto an
  * already-marked epoch fails the marker create loudly. [[compact]]'s
  * snapshot marker is created AFTER its commit marker: a crash between
  * the two leaves a committed epoch whose full artifacts read correctly
  * as deltas (latest-wins over a full index IS that index), and the next
  * [[compact]] re-marks; a crash mid-prune leaves absorbed directories
  * the next [[compact]] sweeps (readers never resolve below the latest
  * snapshot, so they are invisible either way).
  *
  * Time-travel: [[dedupedAt]] serves any epoch at or above the latest
  * snapshot; epochs below it were pruned by [[compact]] and fail loudly.
  *
  * The reference engine has no substring machinery (vector-level dedup
  * only; reference storage_engine.py) — training-data-pipeline tier.
  */
class SubstringDedupStore private (val spark: SparkSession,
                                   val root: String, val window: Int,
                                   val autoCompactEpochs: Int) {

  private def fs = EpochStoreKit.fsOf(spark, root)

  private def marker(n: Long) = new Path(s"$root/_commits/$n")
  private def snapMarker(n: Long) = new Path(s"$root/_snapshots/$n")

  /** Highest committed epoch, or -1 for an empty/initialized-never store. */
  def epoch: Long = EpochStoreKit.maxMarked(fs, new Path(s"$root/_commits"))

  /** Highest epoch whose index/deduped artifacts are full snapshots
    * (epoch 0 after [[SubstringDedupStore.init]]; bumped by [[compact]]). */
  def latestSnapshot: Long =
    EpochStoreKit.maxMarked(fs, new Path(s"$root/_snapshots"))

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"SubstringDedupStore at $root has no committed epoch")
    e
  }

  /** Snapshot base for reads at epoch `e` — fails loudly when `e`
    * predates the latest compaction (its deltas were pruned). */
  private def snapshotFor(e: Long): Long = {
    val s = latestSnapshot
    require(s >= 0 && s <= e,
      s"epoch $e at $root is below the latest snapshot $s — its delta " +
        "epochs were pruned by compact(); time-travel only reaches " +
        "epochs at or above the snapshot")
    s
  }

  private def indexAt(e: Long): DataFrame =
    EpochStoreKit.resolveLatestWins(spark, root, "index",
      snapshotFor(e), e, Seq("k1", "k2"), Seq("k1", "k2", "keep", "occ"))

  private def dedupedResolved(e: Long): DataFrame =
    EpochStoreKit.resolveLatestWins(spark, root, "deduped",
      snapshotFor(e), e, Seq("doc_id"),
      Seq("doc_id", "text", "n_tokens_before", "n_tokens_after"))

  /** The full corpus at the latest committed epoch (union of appended
    * batches — epoch pruning via the partition column). */
  def corpus: DataFrame = corpusAt(requireCommitted())

  /** The corpus as of a PAST committed epoch — reaches ANY committed
    * epoch (`corpus/` holds the data itself and is never pruned, so
    * corpus time-travel is not snapshot-bounded). */
  def corpusAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    EpochStoreKit.unionEpochs(spark, root, "corpus", 0L, e,
      Seq("doc_id", "text"))
  }

  /** The maintained window-key index at the latest committed epoch
    * (snapshot + deltas, latest-epoch-wins per key). */
  def index: DataFrame = indexAt(requireCommitted())

  /** The deduped corpus at the latest committed epoch. */
  def deduped: DataFrame = dedupedResolved(requireCommitted())

  /** Dedup result as of a PAST committed epoch (audit/time-travel) —
    * reaches any epoch at or above the latest snapshot; older epochs
    * were pruned by [[compact]] and fail loudly. */
  def dedupedAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    dedupedResolved(e)
  }

  private def writeEpoch(n: Long, batch: DataFrame, idx: DataFrame,
                         ded: DataFrame,
                         token: Option[String] = None): Unit = {
    EpochStoreKit.writeParquet(batch, s"$root/corpus/epoch=$n")
    EpochStoreKit.writeParquet(idx, s"$root/index/epoch=$n")
    EpochStoreKit.writeParquet(ded, s"$root/deduped/epoch=$n")
    token.foreach(t =>
      EpochStoreKit.writeToken(fs, EpochStoreKit.tokenPath(root, t), n))
    EpochStoreKit.commitMarker(fs, marker(n))
  }

  /** Append a batch (ids strictly above every stored id — enforced by
    * [[graft.operators.SubstringIndex]]'s guard), commit epoch+1 as a
    * DELTA epoch: compute is batch + touched
    * ([[graft.operators.SubstringIndex.appendDeltas]], key-restricted
    * index resolution — the stored index is scanned, never shuffled
    * whole) and the WRITE is exactly those rows plus the batch-present
    * index keys — never the full corpus artifacts. Returns the new
    * epoch (the head may advance further when `autoCompactEpochs`
    * triggers a compaction — read-identical, spec-gated). */
  def append(batch: DataFrame): Long = appendImpl(batch, None)

  /** Exactly-once append for replayable callers (the Structured
    * Streaming `foreachBatch` bridge, [[graft.streaming.StoreSink]]):
    * `token` (e.g. the stream's batchId) is recorded durably between
    * the epoch's artifacts and its commit marker, so a replayed call
    * with the same token is a NO-OP returning the original epoch, and
    * every crash window in between converges on retry (the
    * [[EpochStoreKit]] token protocol). */
  def append(batch: DataFrame, token: String): Long =
    EpochStoreKit.replayCheck(fs, root, token, epoch)
      .getOrElse(appendImpl(batch, Some(token)))

  private def appendImpl(batch: DataFrame,
                         token: Option[String]): Long = {
    val e = requireCommitted()
    val n = e + 1
    val b = Ckpt.eager(batch.select(col("doc_id").cast("long")
      .as("doc_id"), col("text").cast("string").as("text")))
    val baseDocs = corpus
    // the index is consumed KEY-RESTRICTED: the latest-wins window runs
    // only over the rows whose key the batch (then the touched docs)
    // actually carries — filtering on the window's own partition keys
    // first is resolution-transparent — so the stored index is scanned,
    // never shuffled whole (the former base-linear append term, r14)
    val indexFor: DataFrame => DataFrame = keys =>
      EpochStoreKit.resolveLatestWinsForKeys(spark, root, "index",
        snapshotFor(e), e, Seq("k1", "k2"),
        Seq("k1", "k2", "keep", "occ"), keys)
    val (dedDelta, idxDelta) =
      SubstringIndex.appendDeltas(baseDocs, indexFor, b, window)
    writeEpoch(n, b, idxDelta, dedDelta, token)
    maybeAutoCompact(n)
    n
  }

  /** The auto-compaction policy: once the latest-wins resolution window
    * spans more than `autoCompactEpochs` delta epochs, fold it. The
    * threshold trades append-side compaction wall against read-side
    * window fan-in — SCALE.md's measured curve sizes it; 0 disables. */
  private def maybeAutoCompact(n: Long): Unit =
    if (autoCompactEpochs > 0 && n - latestSnapshot >= autoCompactEpochs)
      compact()

  /** Rewrite the resolved index + deduped state as ONE new snapshot
    * epoch and prune the absorbed index/deduped delta directories (and
    * their snapshot markers) below it — the epoch-chain analogue of
    * [[graft.streaming.StreamingIngest.compactDeltas]]. The new epoch
    * appends NO data (its corpus delta is empty); `corpus/` directories
    * are all retained. Idempotent: compacting an already-snapshot head
    * only finishes any interrupted prune. Returns the snapshot epoch. */
  def compact(): Long = {
    val e = requireCommitted()
    val s = latestSnapshot
    if (s == e) { pruneBelow(s); return e }
    val n = e + 1
    val emptyBatch = spark.read
      .parquet(s"$root/corpus/epoch=0").select("doc_id", "text").limit(0)
    writeEpoch(n, emptyBatch,
      Ckpt.eager(indexAt(e)), Ckpt.eager(dedupedResolved(e)))
    // the snapshot marker comes AFTER the commit marker: a crash between
    // the two leaves epoch n committed as a (full-content) delta, which
    // reads identically under latest-wins; the next compact() re-marks
    EpochStoreKit.markFile(fs, snapMarker(n))
    pruneBelow(n)
    n
  }

  /** Delete index/deduped epoch directories and snapshot markers below
    * the latest snapshot. Readers never resolve below it, so this is
    * safe to (re-)run any time — [[compact]] uses it both as its prune
    * step and as the recovery sweep for an interrupted prune. */
  private def pruneBelow(snap: Long): Unit = {
    Seq("index", "deduped").foreach(kind =>
      EpochStoreKit.pruneEpochDirsBelow(fs, root, kind, snap))
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_snapshots"),
      snap)
  }
}

object SubstringDedupStore {

  /** Create the store at `root` from an initial corpus: epoch 0 holds the
    * corpus itself, its full index, and its from-scratch dedup (the first
    * snapshot). Fails loudly if the root already has a committed epoch. */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           window: Int,
           autoCompactEpochs: Int = 16): SubstringDedupStore = {
    val s = new SubstringDedupStore(spark, root, window,
      autoCompactEpochs)
    require(s.epoch < 0,
      s"SubstringDedupStore already initialized at $root (epoch ${s.epoch})")
    val d = Ckpt.eager(docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text").cast("string").as("text")))
    s.writeEpoch(0L, d,
      SubstringIndex.buildIndex(d, window),
      SuffixArray.substringDeduped(d, window))
    EpochStoreKit.markFile(EpochStoreKit.fsOf(spark, root),
      new Path(s"$root/_snapshots/0"))
    s
  }

  /** Open an existing store (any committed epoch present). */
  def open(spark: SparkSession, root: String, window: Int,
           autoCompactEpochs: Int = 16): SubstringDedupStore = {
    val s = new SubstringDedupStore(spark, root, window,
      autoCompactEpochs)
    s.requireCommitted()
    s
  }
}
