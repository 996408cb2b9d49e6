package graft.api

import graft.operators.{Ckpt, Dedup}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental fuzzy-key store — the deployment packaging of
  * [[graft.operators.Dedup.extendFuzzyKeyPairs]], the way
  * [[FingerprintStore]] packages the media families and
  * [[SubstringDedupStore]] the substring flow: a growing key corpus
  * (titles, normalized names) whose per-append cost is batch variant
  * emission + one equi-join against the STORED variant index + the
  * star closure — base variants are never re-derived and base keys
  * never re-join. q120 proves the extension hash-identical to
  * from-scratch [[graft.operators.Dedup.fuzzyKeyPairs]] + closure over
  * the union; bench_r12_incr.json prices the gap (from-scratch
  * re-collapses and re-explodes every corpus key per run: 97.7 s vs
  * 3.5 s at the 100× decade).
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   keys/epoch=N/   the batch APPENDED at N (doc_id, key) — the data;
  *                   NEVER pruned
  *   index/epoch=N/  variant rows (rep, key, _vh): snapshot epochs hold
  *                   the FULL index; append epochs only the distinct
  *                   keys GENUINELY NEW at N — epochs are disjoint key
  *                   slices, so the resolved index is their PLAIN UNION
  *                   from the latest snapshot (no latest-wins window:
  *                   a stored key's rep and variants never change)
  *   comp/epoch=N/   the rep-level cluster assignment (paired reps
  *                   only — fuzzy-cluster-structure sized): snapshot
  *                   epochs FULL, append epochs only the rows the
  *                   append ADDED or RELABELED, resolved
  *                   latest-epoch-wins per id (extension never deletes
  *                   a row)
  *   _commits/N      empty marker file — the epoch's commit point
  *   _snapshots/N    marks epoch N's index/comp as full snapshots
  * }}}
  *
  * The index stores NO `cnt` column: counts grow under append, so a
  * key's cnt is epoch-relative — [[keptKeysAt]] derives it from the
  * stored key batches at read time (min-id reps are append-invariant
  * under the id contract below, so the derived rep always equals the
  * stored rep).
  *
  * [[compact]] rewrites the resolved index + assignment as ONE snapshot
  * epoch and prunes the absorbed delta directories — bounding read-side
  * union/resolution fan-in on a long-lived store; `keys/` is never
  * pruned. Time-travel ([[keptKeysAt]]) reaches epochs at or above the
  * latest snapshot.
  *
  * Crash safety, single-writer (the [[EpochStoreKit]] contract):
  * artifacts first (idempotent overwrites), then the marker with
  * overwrite=false — unmarked litter is invisible and a replayed append
  * onto a marked epoch fails loudly. [[compact]]'s snapshot marker
  * comes AFTER its commit marker (a full index re-unioned above the old
  * snapshot would double keys — but the commit-then-mark window is
  * safe here because the compaction epoch's index holds EXACTLY the
  * union it replaces and its comp reads correctly as a full-content
  * delta; see [[compact]]). APPEND CONTRACT: every batch id must
  * STRICTLY EXCEED every stored doc id (fails loudly) — this keeps
  * stored reps invariant, which is what lets epoch index slices union
  * instead of merge.
  *
  * The reference has no fuzzy-string machinery (its dedup surface is
  * vector-level; reference storage_engine.py) —
  * training-data-pipeline tier.
  */
class FuzzyKeyStore private (val spark: SparkSession, val root: String,
                             val maxKeyLen: Int, val maxEdit: Int,
                             val autoCompactEpochs: Int) {

  private def fs = EpochStoreKit.fsOf(spark, root)

  private def marker(n: Long) = new Path(s"$root/_commits/$n")

  /** Highest committed epoch, or -1 for a never-initialized root. */
  def epoch: Long = EpochStoreKit.maxMarked(fs, new Path(s"$root/_commits"))

  /** Highest epoch whose index/comp artifacts are full snapshots (0
    * after [[FuzzyKeyStore.init]]; bumped by [[compact]]). */
  def latestSnapshot: Long =
    EpochStoreKit.maxMarked(fs, new Path(s"$root/_snapshots"))

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"FuzzyKeyStore at $root has no committed epoch")
    e
  }

  private def snapshotFor(e: Long): Long = {
    val s = latestSnapshot
    require(s >= 0 && s <= e,
      s"epoch $e at $root is below the latest snapshot $s — its delta " +
        "epochs were pruned by compact(); time-travel only reaches " +
        "epochs at or above the snapshot")
    s
  }

  private def keysAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "keys", 0L, e,
      Seq("doc_id", "key"))

  private def indexAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "index", snapshotFor(e), e,
      Seq("rep", "key", "_vh"))

  private def compAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    EpochStoreKit.resolveLatestWins(spark, root, "comp",
      snapshotFor(e), e, Seq("id"), Seq("id", "component"))
  }

  /** Every stored (doc_id, key) row at the latest committed epoch. */
  def keys: DataFrame = keysAt(requireCommitted())

  /** The maintained variant index (rep, key, _vh) — latest epoch. */
  def index: DataFrame = indexAt(requireCommitted())

  /** The maintained rep-level fuzzy-cluster assignment (latest epoch,
    * snapshot + deltas resolved latest-wins). */
  def components: DataFrame = compAt(requireCommitted())

  private def writeEpoch(n: Long, batch: DataFrame, idx: DataFrame,
                         comp: DataFrame,
                         token: Option[String] = None): Unit = {
    EpochStoreKit.writeParquet(batch, s"$root/keys/epoch=$n")
    EpochStoreKit.writeParquet(idx, s"$root/index/epoch=$n")
    EpochStoreKit.writeParquet(comp, s"$root/comp/epoch=$n")
    token.foreach(t =>
      EpochStoreKit.writeToken(fs, EpochStoreKit.tokenPath(root, t), n))
    EpochStoreKit.commitMarker(fs, marker(n))
  }

  /** Append a key batch (doc_id, key) — ids strictly above every stored
    * id (fails loudly) — extend the variant index with the batch's
    * genuinely-new keys and the cluster assignment with their edges,
    * commit epoch+1 writing only the new-key variants and the
    * assignment rows the batch ADDED or RELABELED. Returns the new
    * epoch (the head may advance further when `autoCompactEpochs`
    * triggers a compaction — read-identical, spec-gated). */
  def append(batch: DataFrame): Long = appendImpl(batch, None)

  /** Exactly-once append for replayable callers (the Structured
    * Streaming `foreachBatch` bridge): a replayed call with the same
    * `token` is a NO-OP returning the original epoch; every crash
    * window converges on retry (the [[EpochStoreKit]] token protocol). */
  def append(batch: DataFrame, token: String): Long =
    EpochStoreKit.replayCheck(fs, root, token, epoch)
      .getOrElse(appendImpl(batch, Some(token)))

  private def appendImpl(batch: DataFrame,
                         token: Option[String]): Long = {
    val e = requireCommitted()
    val n = e + 1
    val b = Ckpt.eager(batch.select(
      col("doc_id").cast("long").as("doc_id"),
      col("key").cast("string").as("key")))
    val storedMax = keysAt(e).agg(max(col("doc_id"))).collect()
      .headOption.filter(!_.isNullAt(0)).map(_.getLong(0))
      .getOrElse(Long.MinValue)
    val batchMin = b.agg(min(col("doc_id"))).collect()
      .headOption.filter(!_.isNullAt(0)).map(_.getLong(0))
      .getOrElse(Long.MaxValue)
    require(batchMin > storedMax,
      s"FuzzyKeyStore.append: batch min id $batchMin does not exceed " +
        s"the stored max id $storedMax at $root — appended ids must be " +
        "strictly above every stored id so min-id reps stay invariant")
    val idx = indexAt(e)
    // variants computed ONCE: the epoch's index delta AND the pair
    // probe are the same frame (the refactor extendFuzzyKeyPairs
    // itself composes)
    val nv = Ckpt.eager(Dedup.fuzzyNewVariants(idx, b, "key", "doc_id",
      maxKeyLen, maxEdit))
    val pairs = Dedup.extendFuzzyKeyPairsOf(idx, nv, maxEdit)
      .select(col("rep_a").as("id1"), col("rep_b").as("id2"))
    val oldComp = compAt(e)
    val comp = Ckpt.eager(Dedup.extendComponents(oldComp, pairs))
    // the delta: rows whose (id → component) mapping is new or changed
    val delta = comp.join(oldComp, Seq("id", "component"), "left_anti")
    writeEpoch(n, b, nv, delta, token)
    if (autoCompactEpochs > 0 && n - latestSnapshot >= autoCompactEpochs)
      compact()
    n
  }

  /** Rewrite the resolved index + assignment as ONE new snapshot epoch
    * (empty keys delta) and prune the absorbed index/comp delta
    * directories below it. The snapshot marker comes AFTER the commit
    * marker — safe because the compaction epoch's index is EXACTLY the
    * union of the directories it absorbs (unioning both double-counts
    * nothing the next compact() won't re-resolve: readers between the
    * crash and the re-mark would union duplicate index rows, which the
    * variant join tolerates — pairs are distinct()-ed — and the comp
    * full-content delta reads identically under latest-wins). The index
    * snapshot is written DISTINCT: after a torn compact (commit marker
    * present, snapshot marker absent), `indexAt` unions the old
    * snapshot with the torn epoch's full index, and persisting that
    * union verbatim would bake the duplicate rows into the new snapshot
    * permanently (doubling per torn window) — a no-op shuffle in the
    * normal disjoint-slice case buys the guarantee that no snapshot
    * ever holds duplicate (rep, key, _vh) rows. Idempotent: compacting
    * an already-snapshot head only finishes any interrupted prune.
    * Returns the snapshot epoch. */
  def compact(): Long = {
    val e = requireCommitted()
    val s = latestSnapshot
    if (s == e) { pruneBelow(s); return e }
    val n = e + 1
    val emptyBatch = spark.read.parquet(s"$root/keys/epoch=0")
      .select("doc_id", "key").limit(0)
    writeEpoch(n, emptyBatch,
      Ckpt.eager(indexAt(e).dropDuplicates("rep", "key", "_vh")),
      Ckpt.eager(compAt(e)))
    EpochStoreKit.markFile(fs, new Path(s"$root/_snapshots/$n"))
    pruneBelow(n)
    n
  }

  private def pruneBelow(snap: Long): Unit = {
    EpochStoreKit.pruneEpochDirsBelow(fs, root, "index", snap)
    EpochStoreKit.pruneEpochDirsBelow(fs, root, "comp", snap)
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_snapshots"),
      snap)
  }

  /** The fuzzy-deduped key corpus at the latest epoch — one row per
    * surviving distinct key: (rep, key, cnt), dropping every key whose
    * rep is a non-minimum member of a cluster (the q114b policy);
    * unpaired keys survive. Derived from the persisted artifacts: one
    * aggregation over the stored key batches, one anti-join to the
    * assignment — no variant work. */
  def keptKeys: DataFrame = keptKeysAt(requireCommitted())

  /** [[keptKeys]] as of a PAST committed epoch at or above the latest
    * snapshot (audit/time-travel; older epochs' deltas were pruned by
    * [[compact]], fails loudly). */
  def keptKeysAt(e: Long): DataFrame = {
    val comp = compAt(e)
    val ks = keysAt(e).where(length(col("key")) > 0)
      .groupBy("key")
      .agg(min(col("doc_id").cast("long")).as("rep"),
        count(lit(1)).as("cnt"))
    val drop = comp.where(col("id") =!= col("component"))
      .select(col("id").as("_drop_id"))
    ks.join(drop, ks("rep") === drop("_drop_id"), "left_anti")
      .select(col("rep"), col("key"), col("cnt"))
  }
}

object FuzzyKeyStore {

  /** Create the store at `root` from an initial key frame (doc_id,
    * key): epoch 0 holds the keys, their full variant index, and the
    * from-scratch pair-graph closure (the first snapshot). Fails loudly
    * if the root already has a committed epoch. */
  def init(spark: SparkSession, root: String, keys: DataFrame,
           maxKeyLen: Int = 64, maxEdit: Int = 1,
           autoCompactEpochs: Int = 16): FuzzyKeyStore = {
    val s = new FuzzyKeyStore(spark, root, maxKeyLen, maxEdit,
      autoCompactEpochs)
    require(s.epoch < 0,
      s"FuzzyKeyStore already initialized at $root (epoch ${s.epoch})")
    val d = Ckpt.eager(keys.select(col("doc_id").cast("long")
      .as("doc_id"), col("key").cast("string").as("key")))
    val idx = Ckpt.eager(Dedup.fuzzyVariantIndex(d, "key", "doc_id",
      maxKeyLen, maxEdit).select(col("rep"), col("key"), col("_vh")))
    // from-scratch pairs = the extension's within-join against an empty
    // base (one code path for both, so the q120 theorem covers init too)
    val pairs = Dedup.extendFuzzyKeyPairsOf(idx.limit(0), idx, maxEdit)
      .select(col("rep_a").as("id1"), col("rep_b").as("id2"))
    s.writeEpoch(0L, d, idx,
      Ckpt.eager(Dedup.connectedComponents(pairs)))
    EpochStoreKit.markFile(EpochStoreKit.fsOf(spark, root),
      new Path(s"$root/_snapshots/0"))
    s
  }

  /** Open an existing store (any committed epoch present). `maxKeyLen`
    * and `maxEdit` must match the values the store was initialized
    * with — they parameterize the stored variant family. */
  def open(spark: SparkSession, root: String, maxKeyLen: Int = 64,
           maxEdit: Int = 1,
           autoCompactEpochs: Int = 16): FuzzyKeyStore = {
    val s = new FuzzyKeyStore(spark, root, maxKeyLen, maxEdit,
      autoCompactEpochs)
    s.requireCommitted()
    s
  }
}
