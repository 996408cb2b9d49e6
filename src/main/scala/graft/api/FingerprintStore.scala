package graft.api

import graft.operators.{Ckpt, Dedup}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental fingerprint-dedup store — the deployment
  * packaging of [[graft.operators.Dedup.extendHashDeduped]] for the
  * media families (image dHash, audio energy prints, video
  * temporal-majority prints, text SimHash), the way
  * [[SubstringDedupStore]] packages the substring flow: a growing media
  * corpus whose per-append cost is batch fingerprinting + rep-level
  * extension — the base media is NEVER re-decoded (its prints are the
  * persisted 8-byte-per-doc artifact) and base×base never re-bands.
  * q118/q118b/q118c prove the extension hash-identical to from-scratch
  * [[graft.operators.Dedup.hashDeduped]] over the union;
  * bench_r12_incr.json prices the gap (the from-scratch linear term is
  * the base decode: 47 s of its 51 s wall at the 100× decade).
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   prints/epoch=N/  the batch's fingerprints (_id, simhash) — appended
  *                    at N; NEVER pruned (they ARE the maintained artifact)
  *   comp/epoch=N/    the FULL rep-level component assignment as of N
  *                    (id = distinct-hash representative, component = min
  *                    member id; one row per rep in a multi-member
  *                    cluster — sized by cluster structure, not corpus)
  *   _commits/N       empty marker file — the epoch's commit point
  * }}}
  *
  * `comp` epochs are SELF-CONTAINED snapshots (unlike
  * [[SubstringDedupStore]]'s delta epochs — the assignment is small, so
  * full rewrites are the right trade here): any `comp/epoch=<N` directory
  * below the epochs you still time-travel to can be deleted; `prints`
  * epochs must all be retained.
  *
  * Crash safety, single-writer: artifacts first (idempotent overwrites),
  * then the marker with overwrite=false — unmarked litter is invisible
  * and a replayed append onto a marked epoch fails loudly. Appended ids
  * must be DISJOINT from every stored id (checked, fails loudly — a
  * duplicated id would double its membership weight in the drop set).
  */
class FingerprintStore private (val spark: SparkSession,
                                val root: String, val maxHamming: Int) {

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
    require(e >= 0, s"FingerprintStore at $root has no committed epoch")
    e
  }

  private def printsAt(e: Long): DataFrame =
    spark.read.option("basePath", s"$root/prints")
      .parquet((0L to e).map(n => s"$root/prints/epoch=$n"): _*)
      .select(col("_id"), col("simhash"))

  private def compAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    spark.read.parquet(s"$root/comp/epoch=$e")
      .select(col("id"), col("component"))
  }

  /** Every stored fingerprint at the latest committed epoch. */
  def prints: DataFrame = printsAt(requireCommitted())

  /** The maintained rep-level component assignment (latest epoch). */
  def components: DataFrame = compAt(requireCommitted())

  private def writeEpoch(n: Long, batch: DataFrame,
                         comp: DataFrame): Unit = {
    batch.write.mode("overwrite").parquet(s"$root/prints/epoch=$n")
    comp.write.mode("overwrite").parquet(s"$root/comp/epoch=$n")
    fs.mkdirs(marker(n).getParent)
    val out = fs.create(marker(n), false) // atomic commit point
    out.close()
  }

  /** Append a batch's fingerprints (_id, simhash) — ids disjoint from
    * every stored id (fails loudly) — extend the component assignment
    * with batch-only work, commit epoch+1. Returns the new epoch. */
  def append(batchHashes: DataFrame): Long = {
    val e = requireCommitted()
    val n = e + 1
    val b = Ckpt.eager(batchHashes.select(
      col("_id").cast("long").as("_id"), col("simhash").cast("long")
        .as("simhash")))
    val base = printsAt(e)
    val clash = b.select(col("_id"))
      .join(base.select(col("_id")), Seq("_id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"FingerprintStore.append: batch id ${clash.headOption.map(_.get(0))
        .getOrElse("")} already stored at $root — appended ids must be " +
        "disjoint (a duplicated id would double-count in the drop set)")
    val comp = Dedup.extendHashComponents(base, compAt(e), b, maxHamming)
    writeEpoch(n, b, comp)
    n
  }

  /** The kept rows of `corpus` (one per duplicate cluster — the min
    * member id — plus every unpaired doc) as of the latest epoch,
    * derived from the persisted artifacts: one aggregation over the
    * prints, one join to the assignment — the media never decodes. */
  def kept(corpus: DataFrame, idCol: String = "doc_id"): DataFrame =
    keptAt(requireCommitted(), corpus, idCol)

  /** [[kept]] as of a PAST committed epoch (audit/time-travel) — the
    * drop set uses only fingerprints appended at or before `e`. */
  def keptAt(e: Long, corpus: DataFrame,
             idCol: String = "doc_id"): DataFrame = {
    val comp = compAt(e)
    val ph = printsAt(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val node = ph.groupBy("simhash").agg(min(col("_id")).as("_node"))
    val drop = ph.join(node, Seq("simhash"))
      .join(comp, col("_node").cast("long") === comp("id"))
      .where(col("_id").cast("long") =!= col("component"))
      .select(col("_id").cast("long").as("_drop_id"))
      .transform(Ckpt.eager)
    ph.unpersist(false)
    corpus.join(drop, corpus(idCol).cast("long") === drop("_drop_id"),
      "left_anti")
  }
}

object FingerprintStore {

  /** Create the store at `root` from an initial fingerprint frame
    * (_id, simhash): epoch 0 holds the prints and their from-scratch
    * [[graft.operators.Dedup.hashComponents]] closure. Fails loudly if
    * the root already has a committed epoch. */
  def init(spark: SparkSession, root: String, hashes: DataFrame,
           maxHamming: Int = 3): FingerprintStore = {
    val s = new FingerprintStore(spark, root, maxHamming)
    require(s.epoch < 0,
      s"FingerprintStore already initialized at $root (epoch ${s.epoch})")
    val h = Ckpt.eager(hashes.select(col("_id").cast("long").as("_id"),
      col("simhash").cast("long").as("simhash")))
    s.writeEpoch(0L, h, Dedup.hashComponents(h, maxHamming))
    s
  }

  /** Open an existing store (any committed epoch present). */
  def open(spark: SparkSession, root: String,
           maxHamming: Int = 3): FingerprintStore = {
    val s = new FingerprintStore(spark, root, maxHamming)
    s.requireCommitted()
    s
  }
}
