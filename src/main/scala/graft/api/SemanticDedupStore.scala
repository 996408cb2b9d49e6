package graft.api

import graft.operators.{Ckpt, Clustering, Dedup}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental semantic-dedup store — the deployment
  * packaging of [[graft.operators.Dedup.extendSemanticDeduped]]
  * (SemDeDup under FROZEN centroids), completing the durable-store
  * family beside [[SubstringDedupStore]] (substring),
  * [[FingerprintStore]] (media fingerprints) and [[FuzzyKeyStore]]
  * (fuzzy keys): a growing embedding corpus whose per-append cost is
  * map-only frozen-cell assignment + batch-touched-cell pairs + the
  * star closure — the base is never re-clustered and base×base never
  * re-pairs. q119 proves the extension hash-identical to a from-scratch
  * replay of the frozen chain over the union.
  *
  * Layout under `root/` (all parquet):
  * {{{
  *   vecs/epoch=N/       the batch APPENDED at N (vec_id, embedding) —
  *                       the data; NEVER pruned
  *   asg/epoch=N/        frozen-centroid assignment rows
  *                       (vec_id, cell, sim, dv): snapshot epochs (init,
  *                       retrain) hold the FULL corpus assignment,
  *                       append epochs the batch's rows — vec_ids are
  *                       disjoint across epochs, so resolution is the
  *                       PLAIN UNION from the latest snapshot
  *   comp/epoch=N/       the pair-graph component assignment (paired
  *                       vec_ids only): snapshot epochs FULL, append
  *                       epochs only the rows the append ADDED or
  *                       RELABELED, resolved latest-epoch-wins per id —
  *                       extension never deletes a row, and under heavy
  *                       duplication the full assignment is
  *                       corpus-sized, so full-per-epoch rewrites would
  *                       be the write-amplification cliff the delta
  *                       [[SubstringDedupStore]] epochs fixed for text
  *   centroids/epoch=T/  the frozen-centroid artifact for TRAIN epoch T
  *                       ([[graft.operators.Clustering.saveCentroids]] —
  *                       IEEE-754-exact doubles, so every later
  *                       assignment replays the identical argmax)
  *   _trainmass/T        the full-corpus assignment mass at train time
  *                       (one ASCII long) — survives compaction pruning
  *                       so staleness stays train-relative
  *   _compacts/N         sentinel marking epoch N a trainer-free
  *                       [[compact]] snapshot (full asg+comp under the
  *                       SAME frozen centroids)
  *   _commits/N          empty marker file — the epoch's commit point
  * }}}
  *
  * A COMMITTED epoch is a snapshot iff it carries a `centroids/epoch=N`
  * directory (init/[[retrain]]) or a `_compacts/N` sentinel
  * ([[compact]]) — no post-commit snapshot marker. This is deliberate:
  * assignment resolution here is a plain union over disjoint vec_id
  * slices, so the [[SubstringDedupStore]] trick (a
  * committed-but-unmarked snapshot reads correctly as a full-content
  * delta under latest-wins) does NOT carry over — a full assignment
  * resolved as a delta would duplicate every vec_id. Deriving
  * snapshot-ness from artifacts written BEFORE the commit marker
  * removes the torn window entirely: either the marker exists and the
  * epoch is a complete snapshot, or it doesn't and the litter is
  * invisible (and swept by the next [[append]]).
  *
  * SNAPSHOT ≠ TRAIN GENERATION: [[compact]] bounds read-side
  * resolution (the asg union fan-in and the comp latest-wins window)
  * WITHOUT retraining — sound because extension under frozen centroids
  * is append-monotone, so the resolved asg+comp at any epoch is itself
  * a valid snapshot of the same frozen generation. The centroids
  * artifact therefore lives at the latest TRAIN epoch (which a compact
  * leaves in place, possibly below the latest snapshot), and staleness
  * is measured against the TRAIN-time mass (persisted in
  * `_trainmass/T`), so compacting never masks drift.
  *
  * THE FREEZE IS THE APPROXIMATION, so it is gated like the facade's PQ
  * codebook staleness: [[append]] fails LOUDLY once the CUMULATIVE mass
  * appended since the last snapshot would exceed `maxStaleFrac` of that
  * snapshot's mass, telling the caller to [[retrain]] — which re-trains
  * the centroids on the full stored corpus, rewrites the assignment as
  * one new snapshot epoch, re-freezes, and prunes the absorbed
  * asg/comp/centroids epochs below it (the [[SubstringDedupStore]]
  * compaction discipline; `vecs/` is the data and is never pruned).
  * Time-travel ([[keptAt]]) reaches epochs at or above the latest
  * snapshot; older epochs were pruned and fail loudly.
  *
  * Crash safety, single-writer: artifacts first (idempotent
  * overwrites), then the commit marker with overwrite=false; the
  * snapshot marker comes AFTER the commit marker — a crash between the
  * two leaves a committed epoch whose full assignment reads correctly
  * as a (full-content) union slice, and the next [[retrain]] re-marks.
  * Appended vec_ids must be DISJOINT from every stored id (checked,
  * fails loudly). Zero-norm embeddings are unassignable and therefore
  * never pair — they survive [[kept]] by construction, matching
  * [[graft.operators.Dedup.semanticDeduped]].
  *
  * The reference keeps FAISS indexes per content but has no
  * corpus-level semantic dedup (reference storage_engine.py) —
  * training-data-pipeline tier (SemDeDup, Abbas et al. 2023).
  */
class SemanticDedupStore private (val spark: SparkSession,
                                  val root: String, val tau: Double,
                                  val maxStaleFrac: Double,
                                  val autoCompactEpochs: Int) {

  private def fs = EpochStoreKit.fsOf(spark, root)
  private[api] def fsPub = fs

  private def marker(n: Long) = new Path(s"$root/_commits/$n")

  /** Highest committed epoch, or -1 for a never-initialized root. */
  def epoch: Long = EpochStoreKit.maxMarked(fs, new Path(s"$root/_commits"))

  /** Highest committed TRAIN epoch — the epoch whose centroids are the
    * frozen generation every later assignment replays (0 after init;
    * bumped by every [[retrain]]; NOT bumped by [[compact]]). Centroid
    * litter at an uncommitted epoch is invisible (the `<= epoch`
    * filter). */
  def latestTrain: Long = {
    val e = epoch
    val dir = new Path(s"$root/centroids")
    if (e < 0 || !fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .flatMap(n =>
        scala.util.Try(n.stripPrefix("epoch=").toLong).toOption)
      .filter(_ <= e)
      .foldLeft(-1L)(math.max)
  }

  /** Highest full-assignment snapshot epoch — the resolution base for
    * asg/comp reads: the latest committed TRAIN epoch or trainer-free
    * [[compact]] epoch, whichever is higher. */
  def latestSnapshot: Long = {
    val e = epoch
    val dir = new Path(s"$root/_compacts")
    val compacts =
      if (e < 0 || !fs.exists(dir)) -1L
      else fs.listStatus(dir).map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption)
        .filter(_ <= e) // sentinel litter above the committed head
        .foldLeft(-1L)(math.max)
    math.max(latestTrain, compacts)
  }

  private def requireCommitted(): Long = {
    val e = epoch
    require(e >= 0, s"SemanticDedupStore at $root has no committed epoch")
    e
  }

  private def snapshotFor(e: Long): Long = {
    val s = latestSnapshot
    require(s >= 0 && s <= e,
      s"epoch $e at $root is below the latest snapshot $s — its " +
        "assignment epochs were pruned by retrain(); time-travel only " +
        "reaches epochs at or above the snapshot")
    s
  }

  private def vecsAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "vecs", 0L, e,
      Seq("vec_id", "embedding"))

  private def asgAt(e: Long): DataFrame =
    EpochStoreKit.unionEpochs(spark, root, "asg", snapshotFor(e), e,
      Seq("vec_id", "cell", "sim", "dv"))

  private def compAt(e: Long): DataFrame = {
    require(e >= 0 && e <= epoch && fs.exists(marker(e)),
      s"epoch $e not committed at $root")
    EpochStoreKit.resolveLatestWins(spark, root, "comp",
      snapshotFor(e), e, Seq("id"), Seq("id", "component"))
  }

  /** Every stored (vec_id, embedding) row at the latest epoch. */
  def vectors: DataFrame = vecsAt(requireCommitted())

  /** The maintained frozen-centroid assignment (latest epoch). */
  def assignment: DataFrame = asgAt(requireCommitted())

  /** The maintained pair-graph component assignment (latest epoch). */
  def components: DataFrame = compAt(requireCommitted())

  /** The frozen centroids of the latest TRAIN generation (init or
    * [[retrain]] — a [[compact]] snapshot reuses them). */
  def centroids: Array[Array[Double]] = {
    requireCommitted()
    val t = latestTrain
    require(t >= 0, s"SemanticDedupStore at $root has no trained " +
      "centroids artifact")
    Clustering.loadCentroids(spark, s"$root/centroids/epoch=$t")
  }

  /** `(trainMass, sinceMass)` at epoch `e`: the full-corpus assignment
    * mass when the frozen centroids were TRAINED (persisted in
    * `_trainmass/T` so it survives compaction pruning; legacy roots
    * fall back to counting the train epoch's asg directory, which they
    * still hold — they never compacted) and the mass assigned since.
    * Shared by [[staleFrac]] and [[append]]'s gate so the two can never
    * diverge. Train-relative, NOT snapshot-relative: a trainer-free
    * [[compact]] must not reset drift accounting. */
  private def staleCounts(e: Long): (Long, Long) = {
    val t = latestTrain
    require(t >= 0, s"SemanticDedupStore at $root has no trained " +
      "centroids artifact")
    val trainMass = EpochStoreKit
      .readToken(fs, new Path(s"$root/_trainmass/$t"))
      .getOrElse(spark.read.parquet(s"$root/asg/epoch=$t").count())
    val totalMass = asgAt(e).count()
    (trainMass, totalMass - trainMass)
  }

  /** Mass appended since the last [[retrain]] as a fraction of the
    * train-time mass — [[append]] fails once a batch would push this
    * past `maxStaleFrac`. Unchanged by [[compact]] (spec-gated). */
  def staleFrac: Double = {
    val (trainMass, since) = staleCounts(requireCommitted())
    if (since == 0) 0.0
    else if (trainMass == 0) Double.PositiveInfinity
    else since.toDouble / trainMass
  }

  private def writeEpoch(n: Long, batch: DataFrame, asg: DataFrame,
                         comp: DataFrame,
                         token: Option[String] = None): Unit = {
    EpochStoreKit.writeParquet(batch, s"$root/vecs/epoch=$n")
    EpochStoreKit.writeParquet(asg, s"$root/asg/epoch=$n")
    EpochStoreKit.writeParquet(comp, s"$root/comp/epoch=$n")
    token.foreach(t =>
      EpochStoreKit.writeToken(fs, EpochStoreKit.tokenPath(root, t), n))
    EpochStoreKit.commitMarker(fs, marker(n))
  }

  /** Append an embedding batch (vec_id, embedding) — ids disjoint from
    * every stored id (fails loudly) — assign against the frozen
    * centroids, extend the pair-graph components with batch-only work,
    * commit epoch+1 as a delta. Fails loudly when the cumulative
    * post-TRAIN mass would exceed `maxStaleFrac` of the train-time
    * mass — call [[retrain]] first. Returns the new epoch (the head may
    * advance further when `autoCompactEpochs` triggers a trainer-free
    * [[compact]] — read-identical, train-relative staleness untouched). */
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
    val t = latestTrain
    val n = e + 1
    val b = Ckpt.eager(batch.select(col("vec_id").cast("long")
      .as("vec_id"), col("embedding")))
    val clash = b.select(col("vec_id"))
      .join(vecsAt(e).select(col("vec_id")), Seq("vec_id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"SemanticDedupStore.append: batch vec_id ${clash.headOption
        .map(_.get(0)).getOrElse("")} already stored at $root — " +
        "appended ids must be disjoint")
    // cumulative staleness gate (the PQ-codebook discipline): count the
    // post-TRAIN assignment mass, not just this batch — via the same
    // helper staleFrac reports, so the gate and the metric cannot
    // diverge
    val (trainMass, since) = staleCounts(e)
    val nb = b.count()
    require(trainMass > 0,
      s"SemanticDedupStore.append: the frozen centroids at $root " +
        "assigned ZERO rows at train time (an unassignable corpus — " +
        "all zero-norm embeddings?) — staleness cannot be bounded " +
        "against an empty baseline, and retrain() on the same corpus " +
        "would reproduce it; re-init the store once assignable rows " +
        "exist")
    require(since + nb <= maxStaleFrac * trainMass,
      s"SemanticDedupStore.append: appending $nb rows would put " +
        s"${since + nb} post-train rows over maxStaleFrac=" +
        s"$maxStaleFrac of the train-time mass $trainMass — the frozen " +
        "centroids are stale; call retrain() to re-freeze, then append")
    val cents = Clustering.loadCentroids(spark, s"$root/centroids/epoch=$t")
    val batchAsg = Ckpt.eager(
      Clustering.assignVecWithCentroids(b, cents))
    val oldComp = compAt(e)
    val comp = Ckpt.eager(Dedup.extendSemanticComponents(
      asgAt(e), oldComp, batchAsg, tau))
    // the delta: rows whose (id → component) mapping is new or changed
    // — extension never deletes a row, so latest-wins reconstruction
    // over (old resolved state + this delta) IS the new assignment
    val compDelta = comp.join(oldComp, Seq("id", "component"),
      "left_anti")
    // torn-retrain/torn-compact litter: a crashed retrain may have left
    // a centroids dir (+ trainmass file) at this (then-uncommitted)
    // epoch, a crashed compact its _compacts sentinel; once THIS append
    // commits the epoch, that litter would falsely read as a snapshot
    // and truncate assignment resolution — clear it before the marker
    // lands
    val cdir = new Path(s"$root/centroids/epoch=$n")
    if (fs.exists(cdir)) fs.delete(cdir, true)
    Seq(new Path(s"$root/_compacts/$n"), new Path(s"$root/_trainmass/$n"))
      .foreach(p => if (fs.exists(p)) fs.delete(p, false))
    writeEpoch(n, b, batchAsg, compDelta, token)
    if (autoCompactEpochs > 0 && n - latestSnapshot >= autoCompactEpochs)
      compact()
    n
  }

  /** Re-train the centroids on the FULL stored corpus, rewrite the
    * assignment + closure as one new SNAPSHOT epoch (empty vecs delta),
    * re-freeze, and prune the absorbed asg/comp/centroids epochs below
    * it. Resets [[staleFrac]] to 0. Crash windows: before the commit
    * marker, all litter (including the new centroids dir) is invisible
    * and a retry overwrites it; after the marker but mid-prune, the
    * next [[retrain]]'s prune sweep finishes the job (readers never
    * resolve below the latest snapshot either way). Returns the
    * snapshot epoch. */
  def retrain(nCells: Int, iters: Int = 3): Long = {
    val e = requireCommitted()
    val n = e + 1
    val all = Ckpt.eager(vecsAt(e))
    val cents = Clustering.kmeansCentroidsD(all, nCells, iters)
    val asg = Ckpt.eager(Clustering.assignVecWithCentroids(all, cents))
    val comp = Ckpt.eager(Dedup.connectedComponents(
      Dedup.assignmentDupPairs(asg, tau).select("id1", "id2")))
    // the centroids dir IS the snapshot marker once the commit marker
    // lands, so it (and the train-mass record staleness needs after a
    // later compact prunes this epoch's asg) must be durable BEFORE
    // writeEpoch creates the marker
    EpochStoreKit.boundary(s"$root/centroids/epoch=$n")
    Clustering.saveCentroids(spark, cents, s"$root/centroids/epoch=$n")
    EpochStoreKit.writeToken(fs, new Path(s"$root/_trainmass/$n"),
      asg.count())
    writeEpoch(n, all.limit(0), asg, comp)
    pruneForRetrain(n)
    n
  }

  /** Trainer-free compaction: rewrite the resolved asg + comp as ONE
    * new snapshot epoch under the SAME frozen centroids — bounding the
    * asg union fan-in and the comp latest-wins window without paying
    * [[retrain]]'s Lloyd passes. Sound because extension under frozen
    * centroids is append-monotone: the resolved state at any epoch IS a
    * valid full snapshot of the same generation. [[staleFrac]] is
    * UNCHANGED (it is train-relative by construction). The `_compacts`
    * sentinel is written BEFORE the commit marker — snapshot-ness stays
    * atomic with the commit (the same argument as the centroids dir),
    * so there is no torn commit-then-mark window; sentinel litter from
    * a crash before the marker is invisible and swept by the next
    * [[append]]. A crash mid-prune is finished by the next
    * [[compact]]/[[retrain]] sweep. Idempotent: compacting an
    * already-snapshot head only finishes any interrupted prune.
    * Returns the snapshot epoch. */
  def compact(): Long = {
    val e = requireCommitted()
    val s = latestSnapshot
    if (s == e) { pruneForCompact(s); return e }
    val n = e + 1
    val fullAsg = Ckpt.eager(asgAt(e))
    val fullComp = Ckpt.eager(compAt(e))
    val emptyBatch = spark.read.parquet(s"$root/vecs/epoch=0")
      .select("vec_id", "embedding").limit(0)
    // legacy roots (pre-_trainmass) still hold the train epoch's asg
    // dir; persist its mass before the prune below deletes the only
    // place staleness could fall back to
    val t = latestTrain
    val tm = new Path(s"$root/_trainmass/$t")
    if (!fs.exists(tm))
      EpochStoreKit.writeToken(fs, tm,
        spark.read.parquet(s"$root/asg/epoch=$t").count())
    // torn-retrain litter: a retrain() that crashed after saveCentroids +
    // _trainmass but before its commit marker left centroids/epoch=n (+
    // _trainmass/n) at this still-uncommitted epoch; committing THIS
    // compact at n would silently promote those never-used centroids to
    // latestTrain (later appends would assign against a generation the
    // stored pair graph never saw) and reset staleness — sweep exactly as
    // appendImpl does, before snapshot-ness becomes visible
    val cdir = new Path(s"$root/centroids/epoch=$n")
    if (fs.exists(cdir)) fs.delete(cdir, true)
    val tmLitter = new Path(s"$root/_trainmass/$n")
    if (fs.exists(tmLitter)) fs.delete(tmLitter, false)
    EpochStoreKit.markFile(fs, new Path(s"$root/_compacts/$n"))
    writeEpoch(n, emptyBatch, fullAsg, fullComp)
    pruneForCompact(n)
    n
  }

  /** Retrain prune: everything below the new TRAIN snapshot is
    * absorbed — asg/comp/centroids epoch dirs and the compact/trainmass
    * sentinels. Safe to re-run (readers never resolve below the latest
    * snapshot); doubles as the interrupted-prune recovery sweep. */
  private def pruneForRetrain(snap: Long): Unit = {
    Seq("asg", "comp", "centroids").foreach(kind =>
      EpochStoreKit.pruneEpochDirsBelow(fs, root, kind, snap))
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_compacts"),
      snap)
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_trainmass"),
      snap)
  }

  /** Compact prune: asg/comp below the new snapshot are absorbed, but
    * the TRAIN-generation artifacts (centroids dir, `_trainmass`)
    * survive down to [[latestTrain]] — the frozen generation is still
    * in use below the snapshot. */
  private def pruneForCompact(snap: Long): Unit = {
    Seq("asg", "comp").foreach(kind =>
      EpochStoreKit.pruneEpochDirsBelow(fs, root, kind, snap))
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_compacts"),
      snap)
    val t = latestTrain
    EpochStoreKit.pruneEpochDirsBelow(fs, root, "centroids", t)
    EpochStoreKit.pruneMarkersBelow(fs, new Path(s"$root/_trainmass"), t)
  }

  /** The kept rows of `corpus` at the latest epoch under the SemDeDup
    * keep policy (per component keep the member LEAST similar to its
    * centroid, ties to the lowest id), derived from the persisted
    * artifacts — no clustering, no pairing. */
  def kept(corpus: DataFrame, idCol: String = "vec_id"): DataFrame =
    keptAt(requireCommitted(), corpus, idCol)

  /** [[kept]] as of a PAST committed epoch at or above the latest
    * snapshot (older epochs were pruned by [[retrain]], fails loudly). */
  def keptAt(e: Long, corpus: DataFrame,
             idCol: String = "vec_id"): DataFrame = {
    val comp = compAt(e)
    val sims = asgAt(e).select(col("vec_id"), col("sim"))
    val drop = Ckpt.eager(Dedup.semanticDropIds(comp, sims))
    corpus.join(drop, corpus(idCol).cast("long") === drop("_drop_id"),
      "left_anti")
  }
}

object SemanticDedupStore {

  /** Create the store at `root` from an initial embedding frame
    * (vec_id, embedding): epoch 0 trains the centroids, holds the full
    * assignment and from-scratch closure, and is the first snapshot.
    * Fails loudly if the root already has a committed epoch. */
  def init(spark: SparkSession, root: String, vecs: DataFrame,
           nCells: Int, iters: Int = 3, tau: Double = 0.95,
           maxStaleFrac: Double = 0.5,
           autoCompactEpochs: Int = 16): SemanticDedupStore = {
    val s = new SemanticDedupStore(spark, root, tau, maxStaleFrac,
      autoCompactEpochs)
    require(s.epoch < 0,
      s"SemanticDedupStore already initialized at $root (epoch ${s.epoch})")
    val v = Ckpt.eager(vecs.select(col("vec_id").cast("long")
      .as("vec_id"), col("embedding")))
    val cents = Clustering.kmeansCentroidsD(v, nCells, iters)
    val asg = Ckpt.eager(Clustering.assignVecWithCentroids(v, cents))
    val comp = Ckpt.eager(Dedup.connectedComponents(
      Dedup.assignmentDupPairs(asg, tau).select("id1", "id2")))
    EpochStoreKit.boundary(s"$root/centroids/epoch=0")
    Clustering.saveCentroids(spark, cents, s"$root/centroids/epoch=0")
    EpochStoreKit.writeToken(s.fsPub, new Path(s"$root/_trainmass/0"),
      asg.count())
    s.writeEpoch(0L, v, asg, comp)
    s
  }

  /** Open an existing store (any committed epoch present). `tau` and
    * `maxStaleFrac` must match the values the store was initialized
    * with — they parameterize the stored pair graph. */
  def open(spark: SparkSession, root: String, tau: Double = 0.95,
           maxStaleFrac: Double = 0.5,
           autoCompactEpochs: Int = 16): SemanticDedupStore = {
    val s = new SemanticDedupStore(spark, root, tau, maxStaleFrac,
      autoCompactEpochs)
    s.requireCommitted()
    s
  }
}
