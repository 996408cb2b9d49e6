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
  *   index/epoch=N/  variant rows (rep, key, _vh) for the distinct keys
  *                   GENUINELY NEW at N — epochs are disjoint key
  *                   slices, so the resolved index is their PLAIN UNION
  *                   (no latest-wins window needed); never pruned
  *   comp/epoch=N/   the FULL rep-level component assignment as of N
  *                   (paired reps only — sized by fuzzy-cluster
  *                   structure, not corpus); epochs below your
  *                   time-travel horizon can be deleted
  *   _commits/N      empty marker file — the epoch's commit point
  * }}}
  *
  * The index stores NO `cnt` column: counts grow under append, so a
  * key's cnt is epoch-relative — [[keptKeysAt]] derives it from the
  * stored key batches at read time (min-id reps are append-invariant
  * under the id contract below, so the derived rep always equals the
  * stored rep).
  *
  * Crash safety, single-writer (the store-wide contract): artifacts
  * first (idempotent overwrites), then the marker with overwrite=false
  * — unmarked litter is invisible and a replayed append onto a marked
  * epoch fails loudly. APPEND CONTRACT: every batch id must STRICTLY
  * EXCEED every stored doc id (one parquet min/max-statistics
  * aggregation per side, fails loudly) — this keeps stored reps
  * invariant, which is what lets epoch index slices union instead of
  * merge.
  *
  * The reference has no fuzzy-string machinery (its dedup surface is
  * vector-level; reference storage_engine.py) —
  * training-data-pipeline tier.
  */
class FuzzyKeyStore private (val spark: SparkSession, val root: String,
                             val maxKeyLen: Int, val maxEdit: Int) {

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(n: Long) = new Path(s"$root/_commits/$n")

  /** Highest committed epoch, or -1 for a never-initialized root. */
  def epoch: Long = {
    val dir = new Path(s"$root/_commits")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"FuzzyKeyStore at $root has no committed epoch")
    e
  }

  private def keysAt(e: Long): DataFrame =
    spark.read.option("basePath", s"$root/keys")
      .parquet((0L to e).map(n => s"$root/keys/epoch=$n"): _*)
      .select(col("doc_id"), col("key"))

  private def indexAt(e: Long): DataFrame =
    spark.read.option("basePath", s"$root/index")
      .parquet((0L to e).map(n => s"$root/index/epoch=$n"): _*)
      .select(col("rep"), col("key"), col("_vh"))

  private def compAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    spark.read.parquet(s"$root/comp/epoch=$e")
      .select(col("id"), col("component"))
  }

  /** Every stored (doc_id, key) row at the latest committed epoch. */
  def keys: DataFrame = keysAt(requireCommitted())

  /** The maintained variant index (rep, key, _vh) — latest epoch. */
  def index: DataFrame = indexAt(requireCommitted())

  /** The maintained rep-level fuzzy-cluster assignment (latest epoch). */
  def components: DataFrame = compAt(requireCommitted())

  private def writeEpoch(n: Long, batch: DataFrame, idx: DataFrame,
                         comp: DataFrame): Unit = {
    batch.write.mode("overwrite").parquet(s"$root/keys/epoch=$n")
    idx.write.mode("overwrite").parquet(s"$root/index/epoch=$n")
    comp.write.mode("overwrite").parquet(s"$root/comp/epoch=$n")
    fs.mkdirs(marker(n).getParent)
    val out = fs.create(marker(n), false) // atomic commit point
    out.close()
  }

  /** Append a key batch (doc_id, key) — ids strictly above every stored
    * id (fails loudly) — extend the variant index with the batch's
    * genuinely-new keys and the cluster assignment with their edges,
    * commit epoch+1. Returns the new epoch. */
  def append(batch: DataFrame): Long = {
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
    val comp = Ckpt.eager(Dedup.extendComponents(compAt(e), pairs))
    writeEpoch(n, b, nv, comp)
    n
  }

  /** The fuzzy-deduped key corpus at the latest epoch — one row per
    * surviving distinct key: (rep, key, cnt), dropping every key whose
    * rep is a non-minimum member of a cluster (the q114b policy);
    * unpaired keys survive. Derived from the persisted artifacts: one
    * aggregation over the stored key batches, one anti-join to the
    * assignment — no variant work. */
  def keptKeys: DataFrame = keptKeysAt(requireCommitted())

  /** [[keptKeys]] as of a PAST committed epoch (audit/time-travel). */
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
    * from-scratch pair-graph closure. Fails loudly if the root already
    * has a committed epoch. */
  def init(spark: SparkSession, root: String, keys: DataFrame,
           maxKeyLen: Int = 64, maxEdit: Int = 1): FuzzyKeyStore = {
    val s = new FuzzyKeyStore(spark, root, maxKeyLen, maxEdit)
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
    s
  }

  /** Open an existing store (any committed epoch present). `maxKeyLen`
    * and `maxEdit` must match the values the store was initialized
    * with — they parameterize the stored variant family. */
  def open(spark: SparkSession, root: String, maxKeyLen: Int = 64,
           maxEdit: Int = 1): FuzzyKeyStore = {
    val s = new FuzzyKeyStore(spark, root, maxKeyLen, maxEdit)
    s.requireCommitted()
    s
  }
}
