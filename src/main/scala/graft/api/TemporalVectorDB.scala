package graft.api

import graft.model.Defaults
import graft.operators._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public facade mirroring the reference's `TemporalVectorDatabase` surface
  * (/root/reference/storage/temporal_database.py:20-553; inventory SURVEY
  * §2.11), re-expressed as DataFrame programs over a parquet `versions`
  * table.
  *
  * Design differences vs the reference (deliberate, SURVEY §4.2):
  *  - no per-write full-timeline reload: ingest is one windowed batch job;
  *  - no secondary metadata store: max-seq / base lists are derived
  *    aggregations (cheap after partition pruning);
  *  - no in-memory FAISS index: the search corpus is a pruned projection of
  *    `kind='base'` rows, cacheable via [[cacheBases]];
  *  - batch APIs are genuinely set-based (the reference's batch_reconstruct
  *    loops one-at-a-time, reconstruction_service.py:176-183).
  *
  * Single-item convenience methods (`getVersion` etc.) run the same set-based
  * jobs with a 1-row target; results come back as DataFrames so callers
  * compose further without leaving the engine.
  */
class TemporalVectorDB(
    val spark: SparkSession,
    val path: String,
    val cfg: VersionStore.Config = VersionStore.Config()) {

  def versions: DataFrame = spark.read.parquet(path)

  private var basesCache: Option[DataFrame] = None
  private var latestCache: Option[DataFrame] = None
  private var latestCount: Option[Long] = None
  private var pqBooks: Option[Array[Array[Array[Float]]]] = None
  private var pqCents: Option[Array[Array[Float]]] = None // coarse (IVF) layer
  private var pqCodes: Option[DataFrame] = None
  // raw (m, ks, trainSample, nCells, fullCells) as passed to cachePqIndex
  private var pqParams: Option[(Int, Int, Int, Int, Boolean)] = None
  // whether the live codes are RESIDUAL-encoded (every index built here
  // is; false only after loading a pre-residual persisted index, whose
  // raw-encoded codes must keep scoring with the raw ADC formula)
  private var pqResidual: Boolean = true
  // staleness bookkeeping: corpus rows at codebook-train time, and rows
  // re-encoded with those (fixed) codebooks since
  private var pqTrainedN: Long = 0L
  private var pqRefreshedSinceTrain: Long = 0L

  /** Drop zero-norm rows and unit-normalize `c` in place — THE normalize
    * pipeline (one definition; bases/latest/query variants below only
    * choose their projection). */
  private def normalized(df: DataFrame, c: String): DataFrame =
    df.withColumn("_nrm", l2NormNative(col(c)))
      .where(col("_nrm") > 0)
      .withColumn(c, l2NormalizeWithNative(col(c), col("_nrm")))
      .drop("_nrm")

  private def normalizedBases(rows: DataFrame): DataFrame =
    normalized(rows.where(col("kind") === "base")
      .select(col("content_id"), col("seq"), col("embedding").as("vec")),
      "vec")

  /** Pin a maintained corpus as an eager, LINEAGE-FREE materialization.
    * `localCheckpoint` (not `cache`) on purpose: every parquet append to
    * `path` triggers Spark's `recacheByPath`, which drops and lazily
    * RE-EXECUTES any cached plan that reads the store path — with a fresh
    * file listing, so a "cached" index would silently rebuild itself from
    * post-append state (wrong seq offsets, duplicated latest rows). A
    * checkpoint has no file relation in its plan, so appends cannot touch
    * it; refreshes replace it explicitly. On a cluster with an unreliable
    * executor fleet, swap for `checkpoint()` against a durable dir.
    *
    * LIFETIME CONTRACT: a refresh frees the REPLACED checkpoint's blocks
    * immediately, so DataFrames returned by index-backed searches are
    * valid until the next [[addVersions]]/[[refreshAfterAppend]] —
    * collect results before appending; a lazy plan held across an append
    * fails with a missing-checkpoint-block error (a checkpoint has no
    * lineage to recompute). */
  private def pin(df: DataFrame): DataFrame = df.transform(Ckpt.eager)

  /** Cached normalized base snapshots — the engine's "vector index"
    * (reference storage_engine.py:89-110 rebuilds FAISS from a full scan;
    * here it is a materialized pruned projection, maintained INCREMENTALLY
    * on append like the reference's FAISS `index.add`, :153-164). */
  def cacheBases(): DataFrame = synchronized {
    basesCache.getOrElse {
      val b = pin(normalizedBases(versions))
      basesCache = Some(b)
      b
    }
  }

  /** Materialized latest-state corpus: every content's RECONSTRUCTED
    * latest version — (content_id, seq, embedding). Built once from the
    * store, then maintained incrementally per [[addVersions]] batch
    * (reconstruct only touched contents, carry the rest), so repeated
    * latest-state searches never re-run the full reconstruction. */
  def cacheLatest(): DataFrame = synchronized {
    latestCache.getOrElse {
      val latest = versions.groupBy("content_id").agg(max("seq").as("seq"))
      val l = pin(Reconstruction.reconstruct(versions, latest)
        .select("content_id", "seq", "embedding"))
      latestCache = Some(l)
      l
    }
  }

  /** Incremental index maintenance after an append. Both corpora merge
    * carried state with ONLY the touched contents' rows — never a full
    * store re-scan:
    *  - bases: rows of touched contents not already indexed (append-only
    *    set, so an anti-join on (content_id, seq) is exact);
    *  - latest: reconstruct touched contents at their new max seq, carry
    *    every untouched content's row unchanged.
    * `touched` derives from the CALLER's frame, and the merged result is
    * re-pinned lineage-free, so no plan here can be invalidated or
    * re-executed by this (or any later) append. */
  /** Hook for writers that append to the store OUTSIDE [[addVersions]]
    * (the streaming staged-commit path): refresh the maintained indexes
    * incrementally for the given touched content ids. */
  private[graft] def refreshAfterAppend(touched: DataFrame): Unit =
    refreshCaches(touched)

  private def refreshCaches(touched: DataFrame): Unit = synchronized {
    basesCache = basesCache.map { old =>
      val fresh = normalizedBases(
        versions.join(touched, Seq("content_id"), "left_semi"))
      val additions = fresh.join(old.select("content_id", "seq"),
        Seq("content_id", "seq"), "left_anti")
      val merged = pin(old.unionByName(additions))
      // free the replaced checkpoint's blocks NOW — per-batch streaming
      // refreshes would otherwise pile up full-corpus copies in executor
      // storage until driver GC gets around to the old frame
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(old)
      merged
    }
    latestCache = latestCache.map { old =>
      val targets = versions.join(touched, Seq("content_id"), "left_semi")
        .groupBy("content_id").agg(max("seq").as("seq"))
      val rebuilt = Reconstruction.reconstruct(versions, targets)
        .select("content_id", "seq", "embedding")
      val carried = old.join(touched, Seq("content_id"), "left_anti")
      val merged = pin(carried.unionByName(rebuilt))
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(old)
      latestCount = None // corpus size changed; re-derive lazily
      merged
    }
    // compressed index: re-ENCODE only the touched contents' new latest
    // rows with the EXISTING codebooks and coarse centroids (both train
    // once; retraining cadence is a caller policy — [[pqStaleness]] +
    // [[retrainPqIndexIfStale]] put a number and a gate on it) and carry
    // everything else
    pqCodes = pqCodes.map { old =>
      val books = pqBooks.get
      val cents = pqCents.get
      val fresh = latestCache.get
        .join(touched, Seq("content_id"), "left_semi")
      val encoded = encodeWithLiveBooks(
        SimilaritySearch.withCell(normalizedLatest(fresh), cents,
          col("vec")), books, cents)
      val carried = old.join(touched, Seq("content_id"), "left_anti")
      val merged = pin(carried.unionByName(encoded))
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(old)
      // one count on the CALLER's (small, already-materialized) touched
      // frame — the price of knowing how far the books have drifted
      pqRefreshedSinceTrain += touched.count()
      merged
    }
  }

  /** How far the live PQ/IVF codebooks have drifted: rows re-encoded
    * with train-time codebooks since they were trained, as a fraction of
    * the train-time corpus. 0 right after (re)train; grows with every
    * append batch that touched a live index. A heuristic, not a recall
    * measure — it counts re-encodes (including same-content updates), so
    * it overestimates drift for update-heavy workloads; the streaming
    * contract test pins what it guarantees (retrain at any moment equals
    * a cold rebuild). 0 when no PQ index is live. */
  def pqStaleness(): Double = synchronized {
    if (pqCodes.isEmpty) 0.0
    else pqRefreshedSinceTrain.toDouble / math.max(pqTrainedN, 1L).toDouble
  }

  /** The staleness gate for streaming deployments: retrain codebooks +
    * coarse centroids when [[pqStaleness]] reaches `threshold` (e.g.
    * 0.1 = retrain after drift touches 10% of the train-time corpus).
    * Call it from the ingest loop (e.g. after each foreachBatch commit);
    * retrains are full-corpus jobs, so the threshold IS the
    * freshness/cost trade. Returns true when a retrain ran. */
  def retrainPqIndexIfStale(threshold: Double): Boolean = synchronized {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    if (pqCodes.nonEmpty && pqStaleness() >= threshold) {
      retrainPqIndex(); true
    } else false
  }

  private def normalizedLatest(latest: DataFrame): DataFrame =
    normalized(latest.select(col("content_id"), col("seq"),
      col("embedding").as("vec")), "vec")

  /** Byte-encode a cell-assigned (`_cell`) normalized frame with the LIVE
    * codebooks: residual encode for indexes built here, raw encode only
    * for a loaded pre-residual index (whose books were trained raw). */
  private def encodeWithLiveBooks(assigned: DataFrame,
                                  books: Array[Array[Array[Float]]],
                                  cents: Array[Array[Float]]): DataFrame =
    if (pqResidual)
      assigned
        .withColumn("_resid",
          SimilaritySearch.residualExpr(cents, col("vec"), col("_cell")))
        .withColumn("_codes",
          SimilaritySearch.pqEncodeExpr(books, col("_resid")))
        .drop("vec", "_resid")
    else
      assigned
        .withColumn("_codes", SimilaritySearch.pqEncodeExpr(books, col("vec")))
        .drop("vec")

  /** Compressed (IVF-PQ) latest-state index: codebooks AND coarse (IVF)
    * centroids trained ONCE on a bounded sample of the materialized latest
    * corpus, then every latest vector assigned its nearest coarse cell and
    * encoded to `m` byte codes — (content_id, seq, cell, codes) is all
    * that repeated approximate searches touch, a ~32× smaller footprint
    * than the float corpus (the reason a 100 TB deployment can keep the
    * whole searchable state resident), and the cell column is what lets
    * [[searchLatestVersionsPq]] probe a FRACTION of it per query instead
    * of ADC-scanning every code row (the scale-killer of a flat PQ
    * index — the reference's FAISS-flat has exactly that shape,
    * storage_engine.py:85, 459-461). Maintained incrementally per append
    * like the other indexes: touched contents re-assign + re-encode, the
    * rest carries. `m <= 0` picks [[SimilaritySearch.autoM]]'s subspace
    * count (largest ≤ 16 keeping subvectors ≥ 2 wide).
    *
    * An explicit call whose (m, ks, trainSample, nCells, fullCells)
    * differ from the live index REBUILDS it with the requested
    * configuration (searches go through [[currentPqIndex]] and never
    * discard a configured index); [[retrainPqIndex]] refreshes drifted
    * codebooks in place.
    *
    * `fullCells = true` trains the COARSE centroids on the whole latest
    * corpus with [[graft.operators.Clustering]]'s distributed Lloyd's
    * instead of the bounded driver sample — the corpus-scale
    * configuration: a 4096-row sample of a 100 TB corpus under-fits its
    * cell structure, and mis-fitted cells cost recall at every probe.
    * Codebooks stay sample-trained either way (per-subspace quantization
    * error is a local property the sample captures; cell GEOMETRY is a
    * global one it doesn't). */
  def cachePqIndex(m: Int = 0, ks: Int = 256, trainSample: Int = 4096,
                   nCells: Int = 16, fullCells: Boolean = false)
      : DataFrame = synchronized {
    pqCodes match {
      case Some(codes)
          if pqParams.contains((m, ks, trainSample, nCells, fullCells)) =>
        codes
      case Some(_) => // explicit different configuration: rebuild
        buildPqIndex(m, ks, trainSample, nCells, fullCells)
      case None => buildPqIndex(m, ks, trainSample, nCells, fullCells)
    }
  }

  /** Retrain the codebooks + coarse centroids and re-encode the whole
    * latest corpus with the LAST-USED configuration — the codebook-drift
    * remedy after many appends (incremental refresh deliberately keeps
    * books fixed). */
  def retrainPqIndex(): DataFrame = synchronized {
    val (m, ks, ts, nc, fc) = pqParams.getOrElse((0, 256, 4096, 16, false))
    buildPqIndex(m, ks, ts, nc, fc)
  }

  private def buildPqIndex(m: Int, ks: Int, trainSample: Int,
                           nCells: Int, fullCells: Boolean): DataFrame = {
    val corpus = normalizedLatest(cacheLatest())
    val sample = corpus.orderBy("content_id", "seq").select("vec")
      .limit(trainSample).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vec").toArray)
    require(sample.nonEmpty, "PQ index: empty latest corpus")
    val dim = sample.head.length
    val mm = if (m > 0) m else SimilaritySearch.autoM(dim)
    require(dim % mm == 0, s"dim $dim not divisible by m=$mm subspaces")
    val cents =
      if (fullCells)
        Clustering.kmeansCentroids(
          corpus.select(col("content_id").as("vec_id"),
            col("vec").as("embedding")),
          nCells, iters = 5)
      else SimilaritySearch.lloydQuantized(sample, nCells, iters = 5)
    // codebooks train on RESIDUALS vs the coarse cells (FAISS IVFPQ
    // composition — see SimilaritySearch.topKIvfPq): same code budget,
    // far finer quantization, which is what holds recall at 32×
    // compression
    val books = SimilaritySearch.pqCodebooks(
      SimilaritySearch.sampleResiduals(sample, cents), mm, ks, iters = 5)
    pqResidual = true
    val codes = pin(encodeWithLiveBooks(
      SimilaritySearch.withCell(corpus, cents, col("vec")), books, cents))
    pqCodes.foreach(
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint)
    pqBooks = Some(books)
    pqCents = Some(cents)
    pqCodes = Some(codes)
    pqParams = Some((m, ks, trainSample, nCells, fullCells))
    // fresh books: reset the drift clock (codes is pinned — count is a
    // storage-local action, not a recompute)
    pqTrainedN = codes.count()
    pqRefreshedSinceTrain = 0L
    codes
  }

  /** The live index for searches: whatever configuration exists (builds
    * with defaults on first use) — a default-argument search never
    * discards an explicitly configured index. Returns the codes frame, its
    * codebooks AND its coarse centroids from ONE synchronized section:
    * fetching them separately would let a concurrent
    * [[cachePqIndex]]/[[retrainPqIndex]] pair new codebooks with the old
    * codes frame (wrong widths → wrong sims). */
  private def currentPqIndex()
      : (DataFrame, Array[Array[Array[Float]]], Array[Array[Float]],
         Boolean) =
    synchronized {
      if (pqCodes.isEmpty) buildPqIndex(0, 256, 4096, 16, fullCells = false)
      (pqCodes.get, pqBooks.get, pqCents.get, pqResidual)
    }

  /** Parameterless GETTER for the live compressed index — returns whatever
    * configuration is live (building the default on first use) and NEVER
    * rebuilds a configured index. Use this to inspect; use
    * [[cachePqIndex]](m, ks, trainSample, nCells) to (re)configure. */
  def pqIndex(): DataFrame = currentPqIndex()._1

  /** Query-side probe frame for the live index: (query_id, _lut, _cell[,
    * _csim]) — the LUT and probed cells (with their ⟨q, centroid⟩ sims
    * when the index is residual-encoded) computed once per query, below
    * any broadcast. */
  private def probeFrame(qn: DataFrame, books: Array[Array[Array[Float]]],
                         cents: Array[Array[Float]], probeN: Int,
                         residual: Boolean): DataFrame = {
    val withLut =
      qn.withColumn("_lut", SimilaritySearch.pqLutExpr(books, col("qvec")))
    if (residual)
      withLut
        .withColumn("_pc",
          SimilaritySearch.probeCellsWithSimExpr(cents, col("qvec"), probeN))
        .select(col("query_id"), col("_lut"), explode(col("_pc")).as("_p"))
        .select(col("query_id"), col("_lut"),
          col("_p.c").as("_cell"), col("_p.s").as("_csim"))
    else
      withLut
        .withColumn("_probes",
          SimilaritySearch.probeCellsExpr(cents, col("qvec"), probeN))
        .select(col("query_id"), col("_lut"),
          explode(col("_probes")).as("_cell"))
  }

  /** Approximate latest-state search over the COMPRESSED index: the query
    * probes its `nProbe` nearest coarse cells — an EQUI-JOIN on the
    * maintained cell column, so each search ADC-scores only the probed
    * cells' code rows (~nProbe/nCells of the table) instead of
    * full-scanning it (at 100 TB the flat scan reads ~3 TB of codes per
    * query; the probe reads a bounded fraction, and candidates stay
    * proportional to probed cells). Scoring is ADC (m table lookups per
    * candidate, no float vectors touched), rank is the salted two-phase
    * top-k, optionally re-ranked exactly over the top `refine` survivors
    * via the materialized latest corpus — the recall/precision two-stage
    * shape of [[SimilaritySearch.topKIvfPq]]+[[SimilaritySearch.topKPqRefine]]
    * served from maintained state. `nProbe <= 0` probes EVERY cell —
    * exact parity with a flat ADC scan of the whole code table (the
    * reference's FAISS-flat semantics, storage_engine.py:459-461). */
  def searchLatestVersionsPq(query: Array[Float], k: Int = Defaults.DefaultK,
                             refine: Int = 0,
                             nProbe: Int = Defaults.DefaultNProbe)
      : DataFrame = {
    import spark.implicits._
    searchLatestVersionsPqBatch(Seq((1L, query)).toDF("query_id", "qvec"),
        k, refine, nProbe)
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Batch form of [[searchLatestVersionsPq]]: every row of `queries`
    * ((query_id, qvec)) probes its own `nProbe` cells and ranks
    * independently — ONE job for the whole batch against the maintained
    * index, the set-based shape a per-call loop cannot express (the
    * reference searches one query per FAISS call). Output: (query_id,
    * rank, id, sim). At 100 TB this is the offline-evaluation path: a
    * million-query batch is one cell-probed join, not a million ADC
    * scans.
    *
    * `broadcastQueries = false` drops the broadcast hints: the probe
    * frame carries an m×ks-double LUT per (query, cell) row, so a
    * MILLION-query batch is gigabytes — past Spark's broadcast limit.
    * Un-hinted, the probe and refine joins become shuffled hash joins
    * on the cell / (content, seq) keys; identical results. Default true
    * (interactive batches are small — per-query broadcast is the fast
    * shape). */
  def searchLatestVersionsPqBatch(queries: DataFrame,
                                  k: Int = Defaults.DefaultK,
                                  refine: Int = 0,
                                  nProbe: Int = Defaults.DefaultNProbe,
                                  broadcastQueries: Boolean = true)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    val (codes, books, cents, residual) = currentPqIndex()
    val probeN =
      if (nProbe <= 0) cents.length else math.min(nProbe, cents.length)
    val qn = normQueries(queries)
    // LUT + probe cells computed below the broadcast: once per query
    val probes = probeFrame(qn, books, cents, probeN, residual)
    val adc = SimilaritySearch.adcSimExpr(books.length)
    val scored = codes.join(bc(probes), Seq("_cell"))
      .withColumn("sim", if (residual) col("_csim") + adc else adc)
      .withColumn("id",
        concat_ws("#", col("content_id"), col("seq")))
    if (refine <= 0)
      TopK.perKeySalted(scored, "query_id",
          Seq(desc("sim"), col("id")), k)
        .where(col("sim") > 0)
        .select(col("query_id"), col("rank"), col("id"), col("sim"))
    else {
      val survivors = TopK.perKeySalted(scored, "query_id",
          Seq(desc("sim"), col("id")), refine)
        .select("query_id", "content_id", "seq")
      val w = Window.partitionBy("query_id").orderBy(desc("sim"), col("id"))
      val exact = normalizedLatest(cacheLatest())
        .join(bc(survivors), Seq("content_id", "seq"))
        .join(bc(qn), Seq("query_id"))
        .withColumn("sim", dotNative(col("qvec"), col("vec")))
        .withColumn("id",
          concat_ws("#", col("content_id"), col("seq")))
      exact.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k && col("sim") > 0)
        .select(col("query_id"), col("rank"), col("id"), col("sim"))
    }
  }

  /** Drop zero-norm rows and unit-normalize a (query_id, qvec) frame. */
  private def normQueries(queries: DataFrame): DataFrame =
    normalized(queries, "qvec")


  /** Where the maintained indexes persist: `<store>_idx` beside the store
    * (same filesystem — HDFS/S3 at deployment scale). */
  protected def indexDir: String = path.stripSuffix("/") + "_idx"

  /** Persist the maintained indexes — bases, latest corpus, PQ codes,
    * codebooks + coarse centroids + configuration — to parquet beside the
    * store. With [[loadIndexes]] this beats the reference's startup shape
    * (storage_engine.py:87-110 re-embeds and re-adds EVERY vector into
    * FAISS on construction — the one reference inefficiency SURVEY §4.2
    * had left standing): a new session reloads materialized state and
    * serves searches with ZERO retraining, re-encoding, or
    * reconstruction, and with zero reads of the versions store itself.
    * Builds whatever isn't live yet, then writes. */
  def persistIndexes(): Unit = synchronized {
    import spark.implicits._
    val bases = cacheBases()
    val latest = cacheLatest()
    val (codes, books, cents, residual) = currentPqIndex()
    val (m, ks, ts, nc, fc) = pqParams.get
    bases.write.mode("overwrite").parquet(s"$indexDir/bases")
    latest.write.mode("overwrite").parquet(s"$indexDir/latest")
    codes.write.mode("overwrite").parquet(s"$indexDir/codes")
    Seq((m, ks, ts, nc, fc, residual,
        books.map(_.map(_.toSeq).toSeq).toSeq,
        cents.map(_.toSeq).toSeq))
      .toDF("m", "ks", "train_sample", "n_cells", "full_cells",
        "residual", "books", "cents")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** Reload persisted maintained indexes, replacing (and freeing) any
    * live ones; searches serve from the loaded materialized state
    * immediately and appends keep maintaining it incrementally. Returns
    * false — leaving live state untouched — when nothing was persisted.
    * The load MATERIALIZES the frames (same lineage-free pin as a build),
    * so later appends to the store cannot invalidate them.
    *
    * STALENESS CONTRACT: the load restores the state AS OF the matching
    * [[persistIndexes]] call — versions appended to the store between
    * persist and load are not in the loaded indexes. Persist after every
    * append batch (cheap: the frames are already materialized), or
    * rebuild (`cacheLatest`/`retrainPqIndex`) when the store may have
    * moved on under external writers. */
  def loadIndexes(): Boolean = synchronized {
    val metaPath = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) false
    else {
      type SSeq[A] = scala.collection.Seq[A]
      val meta = spark.read.parquet(s"$indexDir/meta").collect().head
      val books = meta.getAs[SSeq[SSeq[SSeq[Float]]]]("books")
        .map(_.map(_.toArray).toArray).toArray
      val cents = meta.getAs[SSeq[SSeq[Float]]]("cents")
        .map(_.toArray).toArray
      val newBases = pin(spark.read.parquet(s"$indexDir/bases"))
      val newLatest = pin(spark.read.parquet(s"$indexDir/latest"))
      val newCodes = pin(spark.read.parquet(s"$indexDir/codes"))
      Seq(basesCache, latestCache, pqCodes).flatten.foreach(
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint)
      basesCache = Some(newBases)
      latestCache = Some(newLatest)
      latestCount = None
      pqBooks = Some(books)
      pqCents = Some(cents)
      pqCodes = Some(newCodes)
      pqParams = Some((meta.getAs[Int]("m"), meta.getAs[Int]("ks"),
        meta.getAs[Int]("train_sample"), meta.getAs[Int]("n_cells"),
        meta.getAs[Boolean]("full_cells")))
      // pre-residual persisted indexes (no `residual` column) carry
      // raw-encoded codes: keep scoring them with the raw ADC formula
      pqResidual = meta.schema.fieldNames.contains("residual") &&
        meta.getAs[Boolean]("residual")
      // drift clock restarts at the loaded snapshot (drift accumulated
      // before the persist is not recoverable from the files — the
      // persist-after-every-append discipline above keeps it ~0 anyway)
      pqTrainedN = newCodes.count()
      pqRefreshedSinceTrain = 0L
      true
    }
  }

  /** Release every pinned executor-storage frame this facade holds — the
    * reference's `close()`/context-manager surface
    * (temporal_database.py:544-553) re-expressed for Spark: the store
    * itself needs no closing (parquet reads are stateless), but the
    * maintained indexes are lineage-free checkpoints pinned in executor
    * storage, and a long-lived session that opens many stores would
    * accumulate their blocks forever. Unpersists the bases/latest/PQ
    * frames and clears codebooks + drift bookkeeping. The facade stays
    * usable after: the next cache/search call rebuilds from the store,
    * and [[loadIndexes]] restores persisted state with zero recompute
    * (persist BEFORE closing to keep the zero-rebuild startup path).
    * Idempotent; safe to call with no live indexes. */
  def close(): Unit = synchronized {
    Seq(basesCache, latestCache, pqCodes).flatten.foreach(
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint)
    basesCache = None
    latestCache = None
    latestCount = None
    pqBooks = None
    pqCents = None
    pqCodes = None
    pqParams = None
    pqResidual = true
    pqTrainedN = 0L
    pqRefreshedSinceTrain = 0L
  }

  /** Batch ingest of (content_id, ts, embedding[, metadata]) rows; assigns
    * sequence numbers after any existing versions and appends to the store
    * (reference add_content_version, temporal_database.py:86-178 — but one
    * job for the whole batch instead of per-row timeline reloads). Live
    * indexes are maintained incrementally from the batch's content ids,
    * never rebuilt from a full scan. */
  def addVersions(df: DataFrame): Unit = synchronized {
    // synchronized up here (not just inside refreshCaches): the max-seq
    // read + append must not interleave with another same-facade append
    // (duplicate seqs) or with applyBaseOptimization's snapshot+overwrite
    // window (a lost append)
    val existing =
      if (storeExists) Some(versions.select("content_id", "seq")) else None
    appendToStore(VersionStore.ingest(df, existing, cfg))
    refreshCaches(df.select("content_id").distinct())
  }

  /** Storage seam (overridden by [[BucketedTemporalVectorDB]]). */
  protected def appendToStore(ingested: DataFrame): Unit =
    ingested.write.mode("append").parquet(path)

  // Hadoop FS resolution, not java.io.File: the store path may live on
  // HDFS/S3 at deployment scale, where a local-file check silently returns
  // false and seq assignment would restart at 1, colliding with stored keys.
  protected def storeExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Reconstruct one version; empty result if the target precedes the
    * earliest base (the reference raises there, delta_computer.py:116-119). */
  def getVersion(contentId: String, seq: Int): DataFrame =
    batchReconstruct(spark.createDataFrame(
      Seq((contentId, seq))).toDF("content_id", "seq"))

  /** Parse "{content}_v{seq}" ids (reference temporal_database.py:197-220). */
  def getVersionById(versionId: String): DataFrame = {
    val idx = versionId.lastIndexOf("_v")
    require(idx > 0, s"malformed version_id: $versionId")
    getVersion(versionId.substring(0, idx),
      versionId.substring(idx + 2).toInt)
  }

  /** Latest version per requested content (reference :222-236). */
  def getLatestVersion(contentId: String): DataFrame = {
    val target = versions.where(col("content_id") === contentId)
      .groupBy("content_id").agg(max("seq").as("seq"))
    Reconstruction.reconstruct(versions, target)
  }

  /** As-of read: greatest seq with ts <= t (reference :238-253; `<=`
    * semantics core/data_structures.py:213-227). */
  def getVersionAtTime(contentId: String, t: java.sql.Timestamp): DataFrame = {
    val target = versions
      .where(col("content_id") === contentId && col("ts") <= lit(t))
      .groupBy("content_id").agg(max("seq").as("seq"))
    Reconstruction.reconstruct(versions, target)
  }

  /** All versions in [fromSeq, toSeq] reconstructed in ONE set-based job
    * (reference get_version_range loops, :255-272). */
  def getVersionRange(contentId: String, fromSeq: Int, toSeq: Int): DataFrame =
    batchReconstruct(spark.range(fromSeq, toSeq + 1)
      .select(lit(contentId).as("content_id"), col("id").cast("int").as("seq")))

  /** Set-based batch reconstruction of (content_id, seq) targets. */
  def batchReconstruct(targets: DataFrame): DataFrame =
    Reconstruction.reconstruct(versions, targets)

  /** Cosine kNN over base snapshots only — exactly the reference's search
    * corpus semantics (storage_engine.py:89-110, 439-469: delta-only
    * versions are never indexed). */
  def searchSimilarContent(query: Array[Float], k: Int = Defaults.DefaultK)
      : DataFrame = {
    import spark.implicits._
    val q = Seq((1L, query)).toDF("query_id", "qvec")
    SimilaritySearch.topK(q, cacheBases()
        .select(concat_ws("#", col("content_id"), col("seq")).as("id"),
          col("vec")), k)
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Cosine kNN over each content's RECONSTRUCTED LATEST version (SURVEY
    * §3.3's optional extension beyond the reference's bases-only corpus):
    * the freshest state of every content is searchable even when the
    * latest version is a delta. The corpus is the MATERIALIZED
    * [[cacheLatest]] projection — reconstruction runs once (plus
    * incremental per-batch refresh), not per query. */
  def searchLatestVersions(query: Array[Float], k: Int = Defaults.DefaultK)
      : DataFrame = {
    import spark.implicits._
    val q = Seq((1L, query)).toDF("query_id", "qvec")
    SimilaritySearch.topK(q, latestCorpus(), k)
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Batch form of [[searchLatestVersions]]: exact cosine top-k for every
    * row of `queries` ((query_id, qvec)) against the materialized latest
    * corpus in ONE job — the corpus is scanned once for the whole batch
    * regardless of query count (the reference loops one FAISS call per
    * query). Output: (query_id, rank, id, sim). For large corpora prefer
    * [[searchLatestVersionsPqBatch]] (compressed, cell-probed). */
  def searchLatestVersionsBatch(queries: DataFrame,
                                k: Int = Defaults.DefaultK): DataFrame =
    SimilaritySearch.topK(queries, latestCorpus(), k)
      .select(col("query_id"), col("rank"), col("id"), col("sim"))

  private def latestCorpus(): DataFrame =
    cacheLatest().select(
      concat_ws("#", col("content_id"), col("seq")).as("id"),
      col("embedding").as("vec"))

  /** Approximate latest-state search via multi-table hyperplane-LSH over
    * the materialized latest corpus ([[SimilaritySearch.topKLshMulti]];
    * `nBits <= 0` sizes buckets from the corpus count via
    * [[Dedup.autoBits]]). Same contract as [[searchLatestVersions]] minus
    * recall (bounded by the table/probe configuration), at Σ bucket² cost
    * instead of an exact corpus scan. STATELESS by design — buckets are
    * recomputed from the float corpus per call; for repeat-query
    * workloads at corpus scale the maintained, ~32×-smaller
    * [[searchLatestVersionsPq]]/[[searchLatestVersionsPqBatch]] index is
    * the intended path. */
  def searchLatestVersionsApprox(query: Array[Float],
                                 k: Int = Defaults.DefaultK,
                                 nBits: Int = 0,
                                 nTables: Int = 2): DataFrame = {
    import spark.implicits._
    val corpus = latestCorpus()
    // corpus size is invariant between refreshes — derive autoBits from a
    // once-per-refresh cached count, not a count job per query
    val bits =
      if (nBits > 0) nBits
      else Dedup.autoBits(synchronized {
        latestCount.getOrElse {
          val c = corpus.count()
          latestCount = Some(c)
          c
        }
      })
    val q = Seq((1L, query)).toDF("query_id", "qvec")
    SimilaritySearch.topKLshMulti(q, corpus, k, bits, nTables)
      .select(col("rank"), col("id"), col("sim"))
  }

  /** All versions of one content, seq-ordered (reference :289-299) —
    * a pruned scan, no materialized timeline object. */
  def getContentTimeline(contentId: String): DataFrame =
    versions.where(col("content_id") === contentId).orderBy("seq")

  /** Sorted distinct content ids (reference :332-352). */
  def listContentIds(): DataFrame =
    versions.select("content_id").distinct().orderBy("content_id")

  /** Per-content stats bundle — counts + change stats + reconstruction
    * stats + integrity summary in one row, the reference's
    * `get_content_statistics` shape (temporal_database.py:301-330). */
  def getContentStatistics(contentId: String): DataFrame =
    Statistics.contentBundle(versions.where(col("content_id") === contentId))

  /** Fleet-wide statistics over ALL contents (the reference samples the
    * first 5 because each costs a timeline reload, :496-542). */
  def getDatabaseStatistics(): DataFrame = Statistics.database(versions)

  /** Versions whose chain length exceeds maxCost — promotion candidates
    * (reference optimize_content_bases, :443-494). */
  def optimizeContentBases(maxCost: Int = 10): DataFrame =
    Reconstruction.costs(versions)
      .where(col("reconstruction_cost") > maxCost)

  /** EXECUTE the recommendation [[optimizeContentBases]] reports — the
    * reference stops at "Consider promoting N versions"
    * (temporal_database.py:487) because acting on it would mean N
    * per-version reconstruct+rewrite loops; here it is ONE set-based
    * job ([[VersionStore.promoteBases]]): reconstruct every version
    * whose cost is a positive multiple of maxCost+1, rewrite those rows
    * as base snapshots, and swap the store — after which no version
    * costs more than maxCost and [[optimizeContentBases]] reports
    * nothing. An offline compaction-style maintenance job (the store is
    * rewritten in full; schedule it like compaction). Values of every
    * version are unchanged; the maintained indexes refresh incrementally
    * for the touched contents. Returns the number of promoted
    * versions. */
  def applyBaseOptimization(maxCost: Int = 10): Long = synchronized {
    // synchronized serializes against this facade's index refreshes; the
    // STORE-level contract is the same as any compaction job: no writer
    // may append between the snapshot read and the swap (an append from
    // another process in that window would be lost with the overwrite —
    // schedule rewrites in the maintenance window external writers
    // already respect)
    val targets = VersionStore.promotionTargets(versions, maxCost)
      .transform(Ckpt.eager) // pinned: consumed after the store swaps
    val n = targets.count()
    if (n > 0) {
      // materialized BEFORE overwriting the path it reads from
      val rewritten = VersionStore.promoteBases(versions, maxCost)
        .transform(Ckpt.eager)
      overwriteStore(rewritten)
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(rewritten)
      refreshCaches(targets.select("content_id").distinct())
    }
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(targets)
    n
  }

  /** Full-store rewrite seam (overridden by [[BucketedTemporalVectorDB]]);
    * `rewritten` must be materialized (checkpointed) by the caller.
    *
    * The streaming staged-commit markers are NOT at risk here: they live
    * BESIDE the store (`<store>_commits/`, see
    * [[graft.streaming.StreamingIngest.processBatch]]) precisely so a
    * destructive root overwrite cannot touch them under any crash timing
    * — losing them would let a checkpoint-recovery replay re-append
    * already-committed batches (duplicate rows). */
  protected def overwriteStore(rewritten: DataFrame): Unit =
    rewritten.write.mode("overwrite").parquet(path)

  /** Number of visible data files in the store root (hidden `_`/`.`
    * entries — commit markers, Spark metadata — excluded). Overridden by
    * [[BucketedTemporalVectorDB]] (table-backed, warehouse location). */
  protected def dataFileCount: Long = countFilesAt(path)

  protected final def countFilesAt(dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).count { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.toLong
  }

  /** Compact the versions store: rewrite the current snapshot into
    * `targetPartitions` content-hashed files (default: the session's
    * parallelism). The operational counterpart of the streaming ingest —
    * every micro-batch's staged commit adds a file set, so a long-running
    * stream accretes thousands of small files and every later scan pays
    * per-file open cost (the classic small-file problem; at 100 TB the
    * fix is this rewrite on a maintenance cadence). Data is bit-identical
    * after (values never change — only file layout), commit markers
    * survive (see [[overwriteStore]]), and the maintained indexes are
    * untouched BY DESIGN: they are lineage-free checkpoints, so a store
    * rewrite cannot invalidate or rebuild them. Same store-level writer
    * contract as [[applyBaseOptimization]]: no concurrent external
    * appends during the snapshot+overwrite window.
    *
    * `zorderBy` turns the same maintenance pass into a LAYOUT pass:
    * instead of content-hashed files, the rewrite range-partitions and
    * sorts by the Morton key over the named integer(-castable) columns
    * ([[graft.operators.Layout.zOrderLayout]]), so the compacted files
    * carry tight min/max bounding boxes in EVERY named dimension and
    * multi-column scans prune files (LayoutSpec measures 4/16 vs
    * 16/16). One rewrite, both problems — small files AND layout — the
    * OPTIMIZE + ZORDER BY shape lakehouse tables run on a cadence.
    *
    * Returns (files before, files after). */
  def compactStore(targetPartitions: Int = 0, zorderBy: Seq[String] = Nil,
                   zorderBits: Int = 16): (Long, Long) = synchronized {
    require(storeExists, s"no store at $path")
    val parts =
      if (targetPartitions > 0) targetPartitions
      else spark.sparkContext.defaultParallelism
    val before = dataFileCount
    // repartition BEFORE the pin: the checkpoint holds the final layout,
    // and the overwrite writes it with no further shuffle (for the
    // z-order path, dropping zval is a projection — in-partition order
    // survives into the written files)
    val laid =
      if (zorderBy.isEmpty) versions.repartition(parts, col("content_id"))
      else Layout.zOrderLayout(versions, zorderBy, files = parts,
        bits = zorderBits).drop("zval")
    val snap = laid.transform(Ckpt.eager)
    overwriteStore(snap)
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(snap)
    (before, dataFileCount)
  }

  /** Store-wide integrity audit (reference reconstruction_service
    * :299-358). */
  def validateTimelineIntegrity(): DataFrame = Integrity.audit(versions)

  /** Cost-estimate heuristic without reconstructing (reference
    * delta_computer.py:218-271). */
  def estimateReconstructionCost(contentId: String, seq: Int): DataFrame =
    Reconstruction.costEstimate(versions, spark.createDataFrame(
      Seq((contentId, seq))).toDF("content_id", "seq"))

  /** Candidate bases for a target, cheapest first (reference
    * reconstruction_service.py:186-227). */
  def findOptimalBase(contentId: String, seq: Int): DataFrame =
    Reconstruction.baseCandidates(versions, spark.createDataFrame(
      Seq((contentId, seq))).toDF("content_id", "seq"))
}

/** The cluster-scale storage layout behind the same facade: versions live
  * in a `bucketBy(content_id)` + `sortBy(content_id, seq)` managed table
  * ([[graft.operators.BucketedStore]]'s layout), so every per-content
  * aggregation and content-keyed join — max-seq lookups, the nearest-base
  * as-of, the delta-chain range join — reads pre-hashed data and SKIPS its
  * shuffle exchange (the plan shape BucketedStoreSpec asserts, now on the
  * facade path). On 100 TB this removes the read path's dominant data
  * movement; appends land bucket-aligned via `saveAsTable(Append)`.
  *
  * `table` is a session-catalog table name, not a filesystem path; the
  * streaming staged-commit path (file renames) applies only to the
  * path-backed parent. */
class BucketedTemporalVectorDB(
    spark: SparkSession,
    val table: String,
    cfg: VersionStore.Config = VersionStore.Config(),
    val buckets: Int = 32)
    extends TemporalVectorDB(spark, table, cfg) {

  override def versions: DataFrame = spark.table(table)

  // `path` is a table name here, not a filesystem location — persist the
  // maintained indexes under the warehouse beside the table's data
  override protected def indexDir: String =
    spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      s"/${table}_idx"

  override protected def storeExists: Boolean =
    spark.catalog.tableExists(table)

  override protected def appendToStore(ingested: DataFrame): Unit =
    ingested.write.mode("append")
      .bucketBy(buckets, "content_id")
      .sortBy("content_id", "seq")
      .format("parquet")
      .saveAsTable(table)

  override protected def overwriteStore(rewritten: DataFrame): Unit =
    rewritten.write.mode("overwrite")
      .bucketBy(buckets, "content_id")
      .sortBy("content_id", "seq")
      .format("parquet")
      .saveAsTable(table)

  // table-backed: count the managed table's files under the warehouse
  // (every append lands one file PER BUCKET, so long-running ingest
  // accretes buckets × batches files — the same compaction cadence
  // applies, and [[compactStore]]'s rewrite re-buckets into one file set)
  override protected def dataFileCount: Long =
    countFilesAt(spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + s"/$table")

  /** Bucketed compaction: the write fans out per (task, bucket), so the
    * result is bounded by targetPartitions × buckets files — against
    * batches × buckets before (every append adds a file set). Default
    * width = the bucket count; pass 1 to force exactly one file per
    * bucket (single-task write — fine for maintenance windows on
    * moderate stores, not for a 100 TB rewrite).
    *
    * `zorderBy` is rejected here: this store's layout IS
    * `bucketBy(content_id) + sortBy(content_id, seq)` — the
    * zero-exchange per-content read contract BucketedStoreSpec gates —
    * and a Morton re-sort would silently break it. Z-order compaction
    * is the path-backed store's tool. */
  override def compactStore(targetPartitions: Int = 0,
      zorderBy: Seq[String] = Nil, zorderBits: Int = 16): (Long, Long) = {
    require(zorderBy.isEmpty,
      "bucketed store layout is bucketBy(content_id)+sortBy(content_id, " +
        "seq); zorderBy applies to the path-backed TemporalVectorDB store")
    super.compactStore(
      if (targetPartitions > 0) targetPartitions else buckets)
  }
}
