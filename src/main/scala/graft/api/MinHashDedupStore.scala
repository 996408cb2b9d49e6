package graft.api

import graft.operators.{Ckpt, Dedup}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental MinHash/Jaccard near-dup store — the
  * deployment packaging of the q117 compute path
  * ([[graft.operators.Dedup.sigNearDupPairs]] +
  * [[graft.operators.Dedup.crossSigNearDupPairs]] +
  * [[graft.operators.Dedup.extendComponents]]), completing the durable
  * family beside [[SubstringDedupStore]] (substring),
  * [[FingerprintStore]] (media fingerprints), [[FuzzyKeyStore]] (fuzzy
  * keys) and [[SemanticDedupStore]] (embeddings): a growing TEXT corpus
  * near-deduplicated after every append, where the per-append cost is
  * batch shingling + batch×batch and batch×base banding + the star
  * closure — the base text is NEVER re-shingled (its signature frame is
  * the persisted artifact, ~100× smaller than the text) and base×base
  * never re-bands. q117/q121 prove the extension hash-identical to the
  * from-scratch [[graft.operators.Dedup.nearDupPairs]] + closure over
  * the union: banding is a deterministic function of the signatures, so
  * union-banding decomposes exactly into base×base (already closed in
  * the stored assignment) + batch×base + batch×batch (the appended
  * edges).
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   sig/epoch=N/    the batch's signature frame
  *                   (_id, _g, _m0.._m{k-1}, _h) appended at N —
  *                   disjoint id slices, so resolution is the PLAIN
  *                   UNION; NEVER pruned (it IS the maintained artifact)
  *   band/epoch=N/   the banded projection of the batch's exact-group
  *                   reps (_band, _bhash, _id) — [[append]] bands new
  *                   batches against a SCAN of this union instead of
  *                   re-collapsing + re-hashing every stored signature's
  *                   minima (the append's former base-linear shuffle);
  *                   epoch-LOCAL reps of a cross-epoch text group band
  *                   identically, so candidates are unchanged (the
  *                   [[graft.operators.Dedup.crossBandNearDupPairs]]
  *                   parity argument, spec-gated); NEVER pruned
  *   comp/epoch=N/   the pair-graph component assignment (paired ids
  *                   only, component = min member id): snapshot epochs
  *                   (init, [[compact]]) hold the FULL assignment,
  *                   append epochs only the rows the append ADDED or
  *                   RELABELED, resolved latest-epoch-wins per id —
  *                   extension never deletes a row, and under heavy
  *                   duplication the full assignment is corpus-sized,
  *                   so full-per-epoch rewrites would be the
  *                   write-amplification cliff the delta epochs avoid
  *   _commits/N      empty marker file — the epoch's commit point
  *   _snapshots/N    marks epoch N's comp as a full snapshot
  * }}}
  *
  * The banding knobs (tau, n, numHashes, bands) parameterize the stored
  * pair graph and must match across open() calls — they are the
  * family's analogue of [[FuzzyKeyStore]]'s (maxKeyLen, maxEdit).
  * Documents whose text yields no shingles carry no signature row; they
  * never pair and survive [[kept]] by construction (matching
  * [[graft.operators.Dedup.nearDupPairs]] dropping them pre-banding).
  *
  * Crash safety, single-writer (the [[EpochStoreKit]] contract):
  * artifacts first (idempotent overwrites), then the commit marker with
  * overwrite=false — unmarked litter is invisible and a replayed append
  * onto a marked epoch fails loudly (or no-ops under the token
  * protocol). [[compact]]'s snapshot marker comes AFTER its commit
  * marker: a crash between the two leaves a committed epoch whose full
  * assignment reads correctly as a (full-content) delta under
  * latest-wins, and the next [[compact]] re-marks; a crash mid-prune is
  * swept by the next [[compact]]. Appended ids must be DISJOINT from
  * every stored id (checked, fails loudly — a duplicated id would
  * corrupt the min-id keep policy).
  *
  * The reference has no corpus-level text dedup (its dedup surface is
  * vector-level; reference storage_engine.py) —
  * training-data-pipeline tier (MinHash+LSH, Broder 1997; the
  * RefinedWeb/Gopher-style crawl-dedup discipline).
  */
class MinHashDedupStore private (val spark: SparkSession,
                                 val root: String, val tau: Double,
                                 val n: Int, val numHashes: Int,
                                 val bands: Int,
                                 val autoCompactEpochs: Int) {

  private def fs = EpochStoreKit.fsOf(spark, root)

  private def marker(k: Long) = new Path(s"$root/_commits/$k")

  private val sigCols: Seq[String] =
    Seq("_id", "_g") ++ (0 until numHashes).map(j => s"_m$j") :+ "_h"

  /** Highest committed epoch, or -1 for a never-initialized root. */
  def epoch: Long = EpochStoreKit.maxMarked(fs, new Path(s"$root/_commits"))

  /** Highest epoch whose comp artifact is a full snapshot (0 after
    * [[MinHashDedupStore.init]]; bumped by [[compact]]). */
  def latestSnapshot: Long =
    EpochStoreKit.maxMarked(fs, new Path(s"$root/_snapshots"))

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"MinHashDedupStore at $root has no committed epoch")
    e
  }

  private def snapshotFor(e: Long): Long = {
    val s = latestSnapshot
    require(s >= 0 && s <= e,
      s"epoch $e at $root is below the latest snapshot $s — its comp " +
        "deltas were pruned by compact(); time-travel only reaches " +
        "epochs at or above the snapshot")
    s
  }

  private val bandCols: Seq[String] = Seq("_band", "_bhash", "_id")

  private def sigAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "sig", 0L, e, sigCols)

  private def bandAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "band", 0L, e, bandCols)

  private def compAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    EpochStoreKit.resolveLatestWins(spark, root, "comp",
      snapshotFor(e), e, Seq("id"), Seq("id", "component"))
  }

  /** The full stored signature frame at the latest committed epoch. */
  def signatures: DataFrame = sigAt(requireCommitted())

  /** The maintained pair-graph component assignment (latest epoch,
    * snapshot + deltas resolved latest-wins). */
  def components: DataFrame = compAt(requireCommitted())

  private def writeEpoch(k: Long, batchSig: DataFrame, band: DataFrame,
                         comp: DataFrame,
                         token: Option[String] = None): Unit = {
    EpochStoreKit.writeParquet(batchSig, s"$root/sig/epoch=$k")
    EpochStoreKit.writeParquet(band, s"$root/band/epoch=$k")
    EpochStoreKit.writeParquet(comp, s"$root/comp/epoch=$k")
    token.foreach(t =>
      EpochStoreKit.writeToken(fs, EpochStoreKit.tokenPath(root, t), k))
    EpochStoreKit.commitMarker(fs, marker(k))
  }

  /** Append a text batch (idCol, textCol) — ids disjoint from every
    * stored id (fails loudly) — shingle ONLY the batch, band it against
    * itself and against the STORED signature frame, extend the
    * component assignment with the new edges, commit epoch+1 writing
    * the batch's signatures and only the assignment rows the batch
    * ADDED or RELABELED. Returns the new epoch (the head may advance
    * further when `autoCompactEpochs` triggers a compaction —
    * read-identical, spec-gated). */
  def append(batch: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): Long =
    appendImpl(batch, idCol, textCol, None)

  /** Exactly-once append for replayable callers (the Structured
    * Streaming `foreachBatch` bridge): a replayed call with the same
    * `token` is a NO-OP returning the original epoch; every crash
    * window converges on retry (the [[EpochStoreKit]] token protocol). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             token: String): Long =
    EpochStoreKit.replayCheck(fs, root, token, epoch)
      .getOrElse(appendImpl(batch, idCol, textCol, Some(token)))

  private def appendImpl(batch: DataFrame, idCol: String,
                         textCol: String,
                         token: Option[String]): Long = {
    val e = requireCommitted()
    val k = e + 1
    val bSig = Ckpt.eager(normalizeSig(Dedup.signatureFrame(
      batch.select(col(idCol).cast("long").as(idCol), col(textCol)),
      idCol, textCol, n, numHashes)))
    val baseSig = sigAt(e)
    val clash = bSig.select(col("_id"))
      .join(baseSig.select(col("_id")), Seq("_id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"MinHashDedupStore.append: batch id ${clash.headOption
        .map(_.get(0)).getOrElse("")} already stored at $root — " +
        "appended ids must be disjoint (a duplicated id would corrupt " +
        "the min-id keep policy)")
    // ONE shared exact-dup collapse of the batch (r15): the within-pair,
    // cross-pair and band-artifact consumers all ride the same
    // (membership, rep) frames instead of re-collapsing the batch three
    // times — the fixed-cost term that dominated small-batch appends.
    // The appended edges: batch-internal pairs + batch×base pairs — the
    // batch's banded projection broadcasts against a SCAN of the stored
    // band artifact (no re-collapse or re-banding of the base minima);
    // the stored sig frame is touched only by the candidate-keyed
    // verify/expansion joins
    val (bMem, bRep) = Dedup.collapseFromSignatures(bSig)
    val newEdges = Dedup
      .sigNearDupPairsCollapsed(bMem, bRep, tau, numHashes, bands)
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .unionByName(Dedup
        .crossBandNearDupPairsCollapsed(bMem, bRep, bandAt(e), baseSig,
          tau, numHashes, bands)
        .select(col("existing_id").cast("long").as("id1"),
          col("new_id").cast("long").as("id2")))
    val oldComp = compAt(e)
    val comp = Ckpt.eager(Dedup.extendComponents(oldComp, newEdges))
    // the delta: rows whose (id → component) mapping is new or changed
    // — extension never deletes a row, so latest-wins reconstruction
    // over (old resolved state + this delta) IS the new assignment
    val delta = comp.join(oldComp, Seq("id", "component"), "left_anti")
    writeEpoch(k, bSig, Dedup.bandArtifactOfRep(bRep, numHashes, bands),
      delta, token)
    bRep.unpersist(false)
    if (autoCompactEpochs > 0 && k - latestSnapshot >= autoCompactEpochs)
      compact()
    k
  }

  /** Pin the signature frame's id to long and its column order to the
    * stored layout, so epoch unions line up by position and name. */
  private def normalizeSig(sig: DataFrame): DataFrame =
    sig.withColumn("_id", col("_id").cast("long")).select(
      sigCols.map(col): _*)

  /** Rewrite the resolved assignment as ONE new snapshot epoch (empty
    * sig delta) and prune the absorbed comp delta directories below it
    * — bounding read-side resolution work on a long-lived store.
    * Idempotent: compacting an already-snapshot head only finishes any
    * interrupted prune. Returns the snapshot epoch. */
  def compact(): Long = {
    val e = requireCommitted()
    val s = latestSnapshot
    if (s == e) { pruneBelow(s); return e }
    val k = e + 1
    val emptySig = spark.read.parquet(s"$root/sig/epoch=0")
      .select(sigCols.map(col): _*).limit(0)
    val emptyBand = spark.read.parquet(s"$root/band/epoch=0")
      .select(bandCols.map(col): _*).limit(0)
    writeEpoch(k, emptySig, emptyBand, Ckpt.eager(compAt(e)))
    // snapshot marker AFTER the commit marker: a crash between the two
    // leaves epoch k committed as a full-content delta, which reads
    // identically under latest-wins; the next compact() re-marks
    EpochStoreKit.markFile(fs, new Path(s"$root/_snapshots/$k"))
    pruneBelow(k)
    k
  }

  private def pruneBelow(snap: Long): Unit = {
    EpochStoreKit.pruneEpochDirsBelow(fs, root, "comp", snap)
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_snapshots"),
      snap)
  }

  /** The kept rows of `corpus` at the latest epoch (per near-dup
    * cluster keep the minimum member id — the
    * [[graft.operators.Dedup.dedupedCorpusCC]] policy; unpaired and
    * shingle-less docs survive), derived from the persisted assignment:
    * one anti-join — no shingling, no banding. */
  def kept(corpus: DataFrame, idCol: String = "doc_id"): DataFrame =
    keptAt(requireCommitted(), corpus, idCol)

  /** [[kept]] as of a PAST committed epoch at or above the latest
    * snapshot (audit/time-travel; older epochs' comp deltas were pruned
    * by [[compact]], fails loudly). */
  def keptAt(e: Long, corpus: DataFrame,
             idCol: String = "doc_id"): DataFrame = {
    val drop = compAt(e)
      .where(col("id") =!= col("component"))
      .select(col("id").as("_drop_id"))
    corpus.join(drop, corpus(idCol).cast("long") === drop("_drop_id"),
      "left_anti")
  }
}

object MinHashDedupStore {

  /** Create the store at `root` from an initial corpus (idCol,
    * textCol): epoch 0 holds the corpus's signature frame and its
    * from-scratch pair-graph closure (the first snapshot). The banding
    * knobs are fixed here for the store's lifetime. Fails loudly if the
    * root already has a committed epoch. */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           tau: Double, idCol: String = "doc_id",
           textCol: String = "text", n: Int = 3, numHashes: Int = 16,
           bands: Int = 4,
           autoCompactEpochs: Int = 16): MinHashDedupStore = {
    val s = new MinHashDedupStore(spark, root, tau, n, numHashes, bands,
      autoCompactEpochs)
    require(s.epoch < 0,
      s"MinHashDedupStore already initialized at $root (epoch ${s.epoch})")
    val sig = Ckpt.eager(s.normalizeSig(Dedup.signatureFrame(
      docs.select(col(idCol).cast("long").as(idCol), col(textCol)),
      idCol, textCol, n, numHashes)))
    // one shared collapse for the pair and band-artifact consumers (r15)
    val (mem, rep) = Dedup.collapseFromSignatures(sig)
    val pairs = Dedup.sigNearDupPairsCollapsed(mem, rep, tau, numHashes,
        bands)
      .select(col("id1").cast("long"), col("id2").cast("long"))
    s.writeEpoch(0L, sig, Dedup.bandArtifactOfRep(rep, numHashes, bands),
      Ckpt.eager(Dedup.connectedComponents(pairs)))
    rep.unpersist(false)
    EpochStoreKit.markFile(EpochStoreKit.fsOf(spark, root),
      new Path(s"$root/_snapshots/0"))
    s
  }

  /** Open an existing store (any committed epoch present). The banding
    * knobs must match the values the store was initialized with — they
    * parameterize the stored signatures and pair graph. */
  def open(spark: SparkSession, root: String, tau: Double,
           n: Int = 3, numHashes: Int = 16, bands: Int = 4,
           autoCompactEpochs: Int = 16): MinHashDedupStore = {
    val s = new MinHashDedupStore(spark, root, tau, n, numHashes, bands,
      autoCompactEpochs)
    val e = s.requireCommitted()
    // legacy migration (roots written before the banded projection
    // artifact): backfill each committed epoch's band content exactly
    // as its append would have written it — the epoch's own sig slice's
    // exact-group reps, banded (idempotent overwrites). A PENDING marker
    // brackets the loop: a crash mid-migration leaves the band dir
    // present but incomplete, and gating on the dir alone would skip the
    // re-run forever (silently dropping candidate pairs) — the marker
    // makes the next open resume, re-writing exactly the epochs whose
    // parquet commit (_SUCCESS) is missing.
    val fs = EpochStoreKit.fsOf(spark, root)
    val pending = new Path(s"$root/_migrations/band")
    if (!fs.exists(new Path(s"$root/band")) || fs.exists(pending)) {
      EpochStoreKit.markFile(fs, pending)
      for (k <- 0L to e)
        if (!fs.exists(new Path(s"$root/band/epoch=$k/_SUCCESS")))
          EpochStoreKit.writeParquet(
            Dedup.bandArtifact(spark.read.parquet(s"$root/sig/epoch=$k")
              .select(s.sigCols.map(col): _*), numHashes, bands),
            s"$root/band/epoch=$k")
      fs.delete(pending, false)
    }
    s
  }
}
