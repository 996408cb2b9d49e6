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
  *   centroids/epoch=S/  the frozen-centroid artifact for snapshot S
  *                       ([[graft.operators.Clustering.saveCentroids]] —
  *                       IEEE-754-exact doubles, so every later
  *                       assignment replays the identical argmax)
  *   _commits/N          empty marker file — the epoch's commit point
  * }}}
  *
  * A COMMITTED epoch with a `centroids/epoch=N` directory IS a snapshot
  * — no separate snapshot marker. This is deliberate: assignment
  * resolution here is a plain union over disjoint vec_id slices, so the
  * [[SubstringDedupStore]] trick (a committed-but-unmarked snapshot
  * reads correctly as a full-content delta under latest-wins) does NOT
  * carry over — a full assignment resolved as a delta would duplicate
  * every vec_id under two different metric spaces. Deriving
  * snapshot-ness from the centroids directory (written BEFORE the
  * commit marker) removes the torn window entirely: either the marker
  * exists and the epoch is a complete snapshot, or it doesn't and the
  * litter is invisible.
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
                                  val maxStaleFrac: Double) {

  private def fs = EpochStoreKit.fsOf(spark, root)

  private def marker(n: Long) = new Path(s"$root/_commits/$n")

  /** Highest committed epoch, or -1 for a never-initialized root. */
  def epoch: Long = EpochStoreKit.maxMarked(fs, new Path(s"$root/_commits"))

  /** Highest full-assignment snapshot epoch: the highest COMMITTED
    * epoch carrying a centroids artifact (0 after init; bumped by every
    * [[retrain]]). Centroid litter at an uncommitted epoch is invisible
    * (the `<= epoch` filter). */
  def latestSnapshot: Long = {
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

  /** The frozen centroids of the latest snapshot generation. */
  def centroids: Array[Array[Double]] =
    Clustering.loadCentroids(spark,
      s"$root/centroids/epoch=${snapshotFor(requireCommitted())}")

  /** Mass appended since the last snapshot as a fraction of the
    * snapshot's mass — [[append]] fails once a batch would push this
    * past `maxStaleFrac`. */
  def staleFrac: Double = {
    val e = requireCommitted()
    val s = snapshotFor(e)
    if (s == e) 0.0
    else {
      val snapMass = spark.read.parquet(s"$root/asg/epoch=$s").count()
      val since = spark.read
        .parquet(((s + 1) to e).map(n => s"$root/asg/epoch=$n"): _*)
        .count()
      if (snapMass == 0) Double.PositiveInfinity
      else since.toDouble / snapMass
    }
  }

  private def writeEpoch(n: Long, batch: DataFrame, asg: DataFrame,
                         comp: DataFrame): Unit = {
    batch.write.mode("overwrite").parquet(s"$root/vecs/epoch=$n")
    asg.write.mode("overwrite").parquet(s"$root/asg/epoch=$n")
    comp.write.mode("overwrite").parquet(s"$root/comp/epoch=$n")
    EpochStoreKit.commitMarker(fs, marker(n))
  }

  /** Append an embedding batch (vec_id, embedding) — ids disjoint from
    * every stored id (fails loudly) — assign against the frozen
    * centroids, extend the pair-graph components with batch-only work,
    * commit epoch+1 as a delta. Fails loudly when the cumulative
    * post-snapshot mass would exceed `maxStaleFrac` of the snapshot —
    * call [[retrain]] first. Returns the new epoch. */
  def append(batch: DataFrame): Long = {
    val e = requireCommitted()
    val s = snapshotFor(e)
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
    // post-snapshot assignment mass, not just this batch
    val snapMass = spark.read.parquet(s"$root/asg/epoch=$s").count()
    val since =
      if (s == e) 0L
      else spark.read
        .parquet(((s + 1) to e).map(k => s"$root/asg/epoch=$k"): _*)
        .count()
    val nb = b.count()
    require(snapMass > 0 && since + nb <= maxStaleFrac * snapMass,
      s"SemanticDedupStore.append: appending $nb rows would put " +
        s"${since + nb} post-snapshot rows over maxStaleFrac=" +
        s"$maxStaleFrac of the snapshot mass $snapMass — the frozen " +
        "centroids are stale; call retrain() to re-freeze, then append")
    val cents = Clustering.loadCentroids(spark, s"$root/centroids/epoch=$s")
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
    // torn-retrain litter: a crashed retrain may have left a centroids
    // dir at this (then-uncommitted) epoch; once THIS append commits
    // the epoch, that litter would falsely read as a snapshot and
    // truncate assignment resolution — clear it before the marker lands
    val cdir = new Path(s"$root/centroids/epoch=$n")
    if (fs.exists(cdir)) fs.delete(cdir, true)
    writeEpoch(n, b, batchAsg, compDelta)
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
    // lands, so it must be durable BEFORE writeEpoch creates the marker
    Clustering.saveCentroids(spark, cents, s"$root/centroids/epoch=$n")
    writeEpoch(n, all.limit(0), asg, comp)
    pruneBelow(n)
    n
  }

  /** Delete asg/comp/centroids epoch directories below the latest
    * snapshot — safe to re-run (readers never resolve below the
    * snapshot); [[retrain]] uses it as both prune and interrupted-prune
    * recovery. */
  private def pruneBelow(snap: Long): Unit =
    Seq("asg", "comp", "centroids").foreach(kind =>
      EpochStoreKit.pruneEpochDirsBelow(fs, root, kind, snap))

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
           maxStaleFrac: Double = 0.5): SemanticDedupStore = {
    val s = new SemanticDedupStore(spark, root, tau, maxStaleFrac)
    require(s.epoch < 0,
      s"SemanticDedupStore already initialized at $root (epoch ${s.epoch})")
    val v = Ckpt.eager(vecs.select(col("vec_id").cast("long")
      .as("vec_id"), col("embedding")))
    val cents = Clustering.kmeansCentroidsD(v, nCells, iters)
    val asg = Ckpt.eager(Clustering.assignVecWithCentroids(v, cents))
    val comp = Ckpt.eager(Dedup.connectedComponents(
      Dedup.assignmentDupPairs(asg, tau).select("id1", "id2")))
    Clustering.saveCentroids(spark, cents, s"$root/centroids/epoch=0")
    s.writeEpoch(0L, v, asg, comp)
    s
  }

  /** Open an existing store (any committed epoch present). `tau` and
    * `maxStaleFrac` must match the values the store was initialized
    * with — they parameterize the stored pair graph. */
  def open(spark: SparkSession, root: String, tau: Double = 0.95,
           maxStaleFrac: Double = 0.5): SemanticDedupStore = {
    val s = new SemanticDedupStore(spark, root, tau, maxStaleFrac)
    s.requireCommitted()
    s
  }
}
