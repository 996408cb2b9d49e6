package graft.streaming

import graft.api.{BucketedTemporalVectorDB, TemporalVectorDB}
import graft.model.VersionRecord
import graft.operators.VersionStore
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Per-content ingest state for [[StreamingIngest.statefulIngest]]: the
  * last assigned seq and last seen embedding — everything the promotion
  * policy and sparse-delta computation need, so no store read happens on
  * the hot path. */
case class IngestState(lastSeq: Int, lastEmbedding: Array[Float])

/** Structured Streaming ingest for the versioned store (SURVEY §2.10
  * "streaming" extension — the reference has no streaming surface; its
  * ingest is synchronous one-row-at-a-time, temporal_database.py:86-178).
  *
  * The stream reuses the BATCH ingest job via `foreachBatch`: every
  * micro-batch runs the same windowed seq-assignment + promotion + delta
  * pipeline against the current store state, so streaming and batch ingest
  * have identical semantics by construction.
  *
  * Delivery semantics: foreachBatch is at-least-once; a naive append would
  * duplicate a retried micro-batch's (content_id, seq) rows. [[start]] is
  * EXACTLY-ONCE on plain parquet via a staged commit:
  *   1. skip if `<store>_commits/<batchId>` exists (committed);
  *   2. ROLL BACK any root files carrying this batch's `b<id>-` prefix
  *      (uncommitted leftovers of a crashed attempt — the marker is the
  *      only commit point, so they are invisible to the protocol);
  *   3. write the ingested batch under `<store>_staging/<batchId>`,
  *      computed against the rolled-back store;
  *   4. rename each staged file into the table root under the batch
  *      prefix, then write the commit marker and drop the staging dir.
  * A crash ANYWHERE before the marker replays from step 2 with the same
  * inputs; a crash after the marker replays as a no-op. No crash point
  * loses or duplicates rows (fault-injection test in StreamingSpec).
  * Single-writer assumption: one streaming query owns the store path.
  */
object StreamingIngest {

  /** Start ingesting a stream of (content_id, ts, embedding) rows.
    * Micro-batches are applied through [[TemporalVectorDB.addVersions]]
    * (seq offsets continue from the stored max per content); replayed
    * batch ids whose commit marker exists are skipped (see class doc). */
  def start(stream: DataFrame, db: TemporalVectorDB,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(db, batch, batchId)
      }
      .start()

  /** One micro-batch through the staged exactly-once commit (class doc).
    * Exposed for direct testing; `crashBeforeMarker` is a fault-injection
    * point that dies after the data renames but before the commit marker —
    * the worst-case crash the protocol must absorb. */
  def processBatch(db: TemporalVectorDB, batch: DataFrame, batchId: Long,
                   crashBeforeMarker: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    // the staged commit renames files under db.path — only valid for the
    // path-backed store (a bucketed facade's `path` is a catalog table
    // NAME; renaming into it would stray-write a relative directory the
    // table never reads)
    require(!db.isInstanceOf[BucketedTemporalVectorDB],
      "streaming staged commit requires a path-backed TemporalVectorDB; " +
        "BucketedTemporalVectorDB appends go through addVersions")
    val root = new Path(db.path)
    val fs = root.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    // markers and staging live BESIDE the store (the indexDir
    // convention), not inside it: a maintenance overwrite of the root
    // (compaction, base promotion) then cannot touch them under ANY
    // crash timing — keeping them inside and restoring after the
    // overwrite would leave a window where a crash loses every marker
    // and a checkpoint-recovery replay re-appends committed batches
    val commits = new Path(db.path.stripSuffix("/") + "_commits")
    val marker = new Path(commits, batchId.toString)
    val staging = new Path(
      new Path(db.path.stripSuffix("/") + "_staging"), batchId.toString)
    if (fs.exists(marker)) { // committed: replay is a no-op
      if (fs.exists(staging)) fs.delete(staging, true) // lazy cleanup
      return
    }
    if (batch.isEmpty) return
    val prefix = s"b$batchId-"
    // roll back uncommitted leftovers of a crashed earlier attempt, so the
    // seq-offset read below never sees this batch's own partial files
    if (fs.exists(root))
      fs.listStatus(root).iterator
        .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
        .foreach(s => fs.delete(s.getPath, false))
    val hasData = fs.exists(root) && fs.listStatus(root).exists { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val existing =
      if (hasData) Some(db.versions.select("content_id", "seq")) else None
    VersionStore.ingest(batch, existing, db.cfg)
      .write.mode("overwrite").parquet(staging.toString)
    // per-file renames (atomic on HDFS-like filesystems); the batch prefix
    // marks them uncommitted until the marker lands. Hadoop rename reports
    // most failures by RETURNING FALSE, not throwing — an unchecked false
    // here would let the marker commit a batch whose files never moved,
    // then delete them with the staging dir: silent permanent loss. Abort
    // instead; replay rolls back and retries.
    fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .foreach { p =>
        val dest = new Path(root, prefix + p.getName)
        if (!fs.rename(p, dest))
          throw new java.io.IOException(
            s"staged-commit rename failed: $p -> $dest (batch $batchId); " +
              "aborting before marker — replay will roll back and retry")
      }
    if (crashBeforeMarker)
      throw new IllegalStateException("failpoint: crash before marker")
    fs.mkdirs(commits)
    fs.create(marker, true).close()
    fs.delete(staging, true)
    db.refreshAfterAppend(batch.select("content_id").distinct())
  }

  /** Fully streaming-native versioned ingest via `flatMapGroupsWithState`:
    * per-content state carries (lastSeq, lastEmbedding), so every
    * micro-batch emits base/delta rows WITHOUT re-reading the store — the
    * low-latency alternative to the [[start]] foreachBatch path (which
    * reruns the batch window job per micro-batch). Promotion semantics are
    * identical to [[VersionStore.ingestWithSeq]] (cross-checked row-for-row
    * in StreamingSpec); rows within a batch apply in ts order.
    *
    * State is one embedding per content — bounded by the content universe,
    * not the stream length. For UNBOUNDED content universes pass
    * `evictAfter`: contents idle past that event-time horizon have their
    * state SHRUNK on timeout — the embedding (the memory hog, d floats)
    * is dropped, the lastSeq counter (a few bytes) is kept. A re-appearing
    * evicted content therefore CONTINUES its seq timeline, and its next
    * version is promoted to a base (no previous embedding to diff against
    * — the same re-base a cold start performs; reconstruction semantics
    * are unaffected since a base is always a valid chain head). Eviction
    * requires an event-time watermark, applied here on the ts field; rows
    * arriving later than `lateness` behind the max seen ts may be dropped
    * by the watermark, so size it to the source's disorder.
    *
    * SEEDED-STATE CAVEAT: Spark invokes the group function only for keys
    * with batch data or a FIRED timeout, and a timeout can only be
    * registered inside an invocation — so a key seeded via `initial`
    * that never appears in the stream never registers one, and its
    * embedding stays resident regardless of `evictAfter`. Eviction
    * bounds the ACTIVE universe; it cannot shrink a never-touched seed.
    * When the store's content universe vastly exceeds the live stream's,
    * seed the active subset (filter the seed frame), not the full store.
    * The emitted Dataset appends to the versions table via any sink. */
  def statefulIngest(
      stream: Dataset[(String, java.sql.Timestamp, Array[Float])],
      cfg: VersionStore.Config = VersionStore.Config(),
      initial: Option[Dataset[(String, IngestState)]] = None,
      evictAfter: Option[java.time.Duration] = None,
      lateness: String = "1 hour")
      : Dataset[VersionRecord] = {
    import stream.sparkSession.implicits._
    val watermarked = evictAfter match {
      case None => stream
      case Some(_) => stream.withWatermark("_2", lateness)
    }
    val grouped = watermarked.groupByKey(_._1)
    val evictMs = evictAfter.map(_.toMillis)
    val func =
        (contentId: String,
         rows: Iterator[(String, java.sql.Timestamp, Array[Float])],
         state: GroupState[IngestState]) => {
          if (state.hasTimedOut) {
            // shrink, don't remove: the seq counter must survive so a
            // re-appearing content continues its timeline instead of
            // colliding with stored (content_id, seq) keys
            state.getOption.foreach(s =>
              state.update(IngestState(s.lastSeq, null)))
            Iterator.empty
          } else {
          var seq = state.getOption.map(_.lastSeq).getOrElse(0)
          var prev = state.getOption.map(_.lastEmbedding).orNull
          // full-precision ts order: getTime alone is millisecond-truncated
          // and would apply same-millisecond rows arbitrarily, diverging
          // from the batch path's full-ts window ordering
          val out = rows.toSeq
            .sortBy(r => (r._2.getTime, r._2.getNanos))
            .map { case (_, ts, emb) =>
            seq += 1
            val rec =
              if (prev == null) {
                VersionRecord(contentId, seq, ts, "base", Some(emb),
                  None, None, None, None, Map.empty)
              } else {
                // identical arithmetic to the batch expressions: dense diff
                // in double, sparse indices at |diff| >= threshold, raw-L2
                // magnitude over the WHOLE diff (delta_computer.py:74)
                val diff = Array.tabulate(emb.length)(i =>
                  emb(i).toDouble - prev(i).toDouble)
                val idx = diff.indices
                  .filter(i => math.abs(diff(i)) >= cfg.sparsityThreshold)
                val ratio = idx.length.toDouble / emb.length.toDouble
                val mag = math.sqrt(diff.map(d => d * d).sum)
                val isBase = seq == 1 ||
                  (seq - 1) % cfg.baseInterval == 0 ||
                  ratio > cfg.promotionRatio
                if (isBase)
                  VersionRecord(contentId, seq, ts, "base", Some(emb),
                    None, None, None, Some(mag), Map.empty)
                else
                  VersionRecord(contentId, seq, ts, "delta", None,
                    Some(idx.toArray),
                    Some(idx.map(i => diff(i).toFloat).toArray),
                    Some(seq - 1), Some(mag), Map.empty)
              }
            prev = emb
            rec
          }
          state.update(IngestState(seq, prev))
          evictMs.foreach { ms =>
            // fire once the watermark passes this batch's newest row + ms;
            // must stay strictly ahead of the current watermark
            if (out.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                out.map(_.ts.getTime).max + ms))
          }
          out.iterator
          }
        }

    val timeout =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    initial match {
      case None => grouped.flatMapGroupsWithState[IngestState, VersionRecord](
        OutputMode.Append, timeout)(func)
      case Some(init) =>
        grouped.flatMapGroupsWithState[IngestState, VersionRecord](
          OutputMode.Append, timeout,
          init.groupByKey(_._1).mapValues(_._2))(func)
    }
  }

  /** [[statefulIngest]] seeded from an existing versions store: initial
    * per-content state is (max seq, reconstructed latest embedding), so
    * streamed versions CONTINUE existing timelines — seqs don't restart and
    * the first streamed delta diffs against the stored latest state (the
    * reference's add-to-existing-timeline semantics,
    * temporal_database.py:107-135, in streaming form). One reconstruction
    * job at stream start; no store reads afterwards.
    *
    * `onlyContents` restricts the seed to the given content ids — the
    * large-store escape hatch: a full-store seed pins every content's
    * embedding in the state store, and eviction cannot touch seeded keys
    * the stream never mentions (see [[statefulIngest]]'s seeded-state
    * caveat). CONTRACT: the stream must then carry ONLY those contents —
    * a store-existing content that arrives unseeded restarts its seq
    * counter at 1 and collides with its stored rows (filter or route
    * the stream accordingly; the foreachBatch [[start]] path has no such
    * restriction since it reads offsets from the store each batch).
    * `evictAfter`/`lateness` pass through. */
  def statefulIngestFrom(
      stream: Dataset[(String, java.sql.Timestamp, Array[Float])],
      db: TemporalVectorDB,
      onlyContents: Option[DataFrame] = None,
      evictAfter: Option[java.time.Duration] = None,
      lateness: String = "1 hour"): Dataset[VersionRecord] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val scoped = onlyContents match {
      case None => db.versions
      case Some(ids) => db.versions.join(
        ids.select(col("content_id")), Seq("content_id"), "left_semi")
    }
    val latest = scoped.groupBy("content_id")
      .agg(max("seq").as("seq"))
    val seed = graft.operators.Reconstruction
      .reconstruct(scoped, latest)
      .select(col("content_id"), col("seq"), col("embedding"))
      .as[(String, Int, Array[Float])]
      .map { case (c, s, e) => (c, IngestState(s, e)) }
    statefulIngest(stream, db.cfg, Some(seed), evictAfter, lateness)
  }

  /** Streaming exact deduplication: drop rows whose dedup key was already
    * seen within the watermark horizon — the streaming counterpart of the
    * batch exact-dedup operator, with bounded state (keys expire with the
    * watermark). `df` must carry a TimestampType `ts` column. */
  def streamingDedup(df: DataFrame, keyCols: Seq[String],
                     watermarkDelay: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming quality guard: keep stream documents whose hashed-linear
    * classifier margin ([[graft.operators.QualityModels.marginExpr]])
    * meets `minMargin` — the fastText-style quality filter at ingest
    * time. Unlike the decontamination guard this needs NO JVM probe:
    * the margin is a pure column fold (exact long arithmetic), so the
    * filter is stateless, watermark-free, and agrees bit-for-bit with
    * the batch scorer on every row (gated in StreamingSpec).
    * `invert = true` emits the REJECT stream instead.
    *
    * NULL-text rows REJECT (there is nothing to score — garbage in a
    * quality gate): without the explicit coalesce a null margin would
    * fail BOTH the pass and the invert predicate and the row would
    * vanish from both streams, silently un-partitioning the input. */
  def streamingQualityFilter(stream: DataFrame, minMargin: Long = 0L,
                             nBuckets: Int = 256, textCol: String = "text",
                             invert: Boolean = false): DataFrame = {
    val pass = coalesce(
      graft.operators.QualityModels
        .marginExpr(col(textCol), nBuckets) >= minMargin,
      lit(false))
    stream.filter(if (invert) !pass else pass)
  }

  /** Streaming near-dup guard: quarantine stream documents whose MinHash
    * band hashes collide with the STATIC kept corpus — the ingest-time
    * PRE-FILTER of [[graft.operators.Dedup.crossNearDupPairs]]. A band
    * collision is LSH candidacy, not verified similarity: every true
    * near-dup of the corpus that the banding would catch in batch is
    * quarantined (same bands, same hashes — agreement with the batch
    * candidate set is spec-gated), along with banding's false positives;
    * route the quarantine stream to the batch jaccard verify instead of
    * dropping it. Clean means "shares no band bucket with the corpus" —
    * safe to ingest without any batch-side re-check.
    *
    * MEMORY CONTRACT: the corpus's distinct (band, hash) keys are packed
    * to 64-bit longs (band in the top byte, 56-bit md5 prefix below) and
    * either collected into a sorted array (8 B/key, up to
    * `exactKeyLimit` keys) or — past the limit — folded DISTRIBUTEDLY
    * into a Bloom filter whose broadcast payload is
    * O(nKeys · ln(1/fpp)) BITS, independent of text sizes and ~10 bits
    * per distinct corpus text ×bands at the 1% default. The driver never
    * materializes the key universe on the Bloom path. Both probe paths
    * admit false POSITIVES only (packing truncation / Bloom fpp), which
    * quarantine a clean doc — the benign direction; no true collision is
    * ever missed.
    *
    * Stateless like the other guards: each stream row pays one in-JVM
    * signature (the same compiled [[graft.functions.MinHashExpr]] kernel
    * the column side runs, so stream and batch hashes are bit-identical
    * by construction) + `bands` index probes. Docs with fewer than `n`
    * tokens (or null text) have no shingles, hence no bands — always
    * clean. */
  def streamingNearDupGuard(stream: DataFrame, existing: DataFrame,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            n: Int = 3, numHashes: Int = 16,
                            bands: Int = 4,
                            invert: Boolean = false,
                            exactKeyLimit: Long = 4L * 1000 * 1000,
                            bloomFpp: Double = 0.01): DataFrame = {
    val index = corpusBandIndex(existing, idCol, textCol, n, numHashes,
      bands, exactKeyLimit, bloomFpp)
    val bIdx = stream.sparkSession.sparkContext.broadcast(index)
    val idx = stream.schema.fieldIndex(textCol)
    stream.filter { row =>
      val collides = !row.isNullAt(idx) &&
        bandKeysJvm(row.getString(idx), n, numHashes, bands)
          .exists(bIdx.value.mightContain)
      collides == invert
    }
  }

  /** Ingest-time FUZZY-KEY duplicate guard — the q113 symmetric-delete
    * cover ([[graft.operators.Dedup.fuzzyKeyPairs]]) as a stateless
    * stream probe: drop (default) or keep (`invert`) stream rows whose
    * short key (title / normalized name) sits within Levenshtein
    * `maxEdit` of an already-ingested key. Same conservative contract
    * as the band guards: two keys within `maxEdit` PROVABLY share a
    * ≤maxEdit-deletion variant, so quarantining on variant collision is
    * a SUPERSET of true fuzzy dups (a 56-bit hash collision or a
    * shared-variant-but-distant pair quarantines a clean row — benign
    * direction, the batch verify clears it); no true fuzzy dup ever
    * slips through. The corpus side indexes the md5-56 of every variant
    * of every distinct existing key (column kernel); each stream row
    * pays one in-JVM variant expansion + that many probes against the
    * broadcast exact-or-bloom index ([[keyIndex]]) — JVM md5-56 packing
    * is the SAME first-7-digest-bytes form as the column `md5Long`
    * (spec-gated bit-identical). Null/empty keys have no variants —
    * always clean, mirroring the batch operator's filter. */
  def streamingFuzzyKeyGuard(stream: DataFrame, existingKeys: DataFrame,
                             keyCol: String = "key",
                             maxEdit: Int = 1,
                             invert: Boolean = false,
                             exactKeyLimit: Long = 4L * 1000 * 1000,
                             bloomFpp: Double = 0.01): DataFrame = {
    val varCol = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.DeleteVariantsExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(col(keyCol)),
        maxEdit))
    val index = keyIndex(existingKeys
      .where(length(col(keyCol)) > 0)
      .select(explode(varCol).as("_v"))
      .select(graft.operators.Dedup.md5Long(col("_v")).as("_k")),
      exactKeyLimit, bloomFpp)
    val bIdx = stream.sparkSession.sparkContext.broadcast(index)
    val idx = stream.schema.fieldIndex(keyCol)
    stream.filter { row =>
      val collides = !row.isNullAt(idx) && {
        val k = row.getString(idx)
        k.nonEmpty && fuzzyKeysJvm(k, maxEdit)
          .exists(bIdx.value.mightContain)
      }
      collides == invert
    }
  }

  /** JVM md5-56 over each ≤maxEdit-deletion variant — bit-identical to
    * the column side's `md5Long(explode(DeleteVariantsExpr(...)))`
    * (first 7 digest bytes, big-endian; spec-gated). */
  private[graft] def fuzzyKeysJvm(key: String, maxEdit: Int): Seq[Long] = {
    val arr = graft.functions.DeleteVariantsExpr.variants(
      org.apache.spark.unsafe.types.UTF8String.fromString(key), maxEdit)
    val md = bandDigest.get()
    (0 until arr.numElements()).map { i =>
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v
    }
  }

  /** Probe index over the corpus's packed band keys — the broadcast
    * payload of [[streamingNearDupGuard]]. `payloadBytes` is the
    * serialized probe size the memory-contract spec gates on. */
  private[graft] sealed trait BandKeyIndex extends Serializable {
    def mightContain(k: Long): Boolean
    def payloadBytes: Long
  }
  private[graft] final class ExactBandKeys(keys: Array[Long])
      extends BandKeyIndex {
    def mightContain(k: Long): Boolean =
      java.util.Arrays.binarySearch(keys, k) >= 0
    def payloadBytes: Long = 8L * keys.length
  }
  private[graft] final class BloomBandKeys(
      bf: org.apache.spark.util.sketch.BloomFilter) extends BandKeyIndex {
    def mightContain(k: Long): Boolean = bf.mightContainLong(k)
    def payloadBytes: Long = (bf.bitSize() + 7) / 8
  }

  /** Column-side packed band key over a [[graft.operators.Dedup
    * .bandedProjection]] frame: band in the top byte, the md5 band
    * hash's leading 56 bits below — the same packing [[bandKeysJvm]]
    * computes from digest bytes, so column and JVM keys are
    * bit-identical (spec-gated). */
  private[graft] def packedBandKey: org.apache.spark.sql.Column =
    shiftleft(col("_band").cast("long"), 56).bitwiseOR(
      conv(substring(col("_bhash"), 1, 14), 16, 10).cast("long"))

  /** Build the guard's probe index: one distributed distinct over the
    * corpus's packed band keys, then EITHER a bounded collect (sorted
    * long array, exact probes) or a `DataFrameStatFunctions.bloomFilter`
    * fold (per-partition filters merged on the driver — the driver holds
    * bloom BITS, never the key universe). */
  private[graft] def corpusBandIndex(existing: DataFrame, idCol: String,
                                     textCol: String, n: Int,
                                     numHashes: Int, bands: Int,
                                     exactKeyLimit: Long,
                                     bloomFpp: Double): BandKeyIndex = {
    require(bands <= 255, s"bands must fit the key's top byte (got $bands)")
    import graft.operators.Dedup
    keyIndex(Dedup.bandedProjection(
        Dedup.minhashSignatures(existing, idCol, textCol, n, numHashes),
        numHashes, bands)
      .select(packedBandKey.as("_k")),
      exactKeyLimit, bloomFpp)
  }

  /** Exact-or-bloom probe index over a single long key column `_k`: one
    * distributed distinct, then a bounded collect (sorted array, exact
    * probes) or a `stat.bloomFilter` fold past `exactKeyLimit`. Shared
    * by the text band index and the fingerprint guard. */
  private[graft] def keyIndex(keyFrame: DataFrame, exactKeyLimit: Long,
                              bloomFpp: Double): BandKeyIndex = {
    val keys = keyFrame.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nKeys = keys.count()
      if (nKeys <= exactKeyLimit) {
        val arr = keys.collect().map(_.getLong(0))
        java.util.Arrays.sort(arr)
        new ExactBandKeys(arr)
      } else {
        new BloomBandKeys(keys.stat.bloomFilter("_k", nKeys, bloomFpp))
      }
    } finally keys.unpersist()
  }

  /** Maintain a [[graft.operators.Sketches.countMin]] frequency sketch
    * over a stream — the profile a 100 TB ingest keeps instead of a
    * full token frequency table. Exploits the CMS's defining property:
    * cellwise ADDITIVITY. Each micro-batch writes its own bounded
    * (≤ depth·width rows) sketch DELTA under `sketchPath/batch=<id>`;
    * the live sketch is the cellwise sum over all committed deltas
    * ([[readCountMin]]), so maintenance never rewrites history and the
    * merged sketch equals the batch build over the union BY THE MERGE
    * IDENTITY (spec-gated).
    *
    * Exactly-once without the store's marker protocol: the batch delta
    * is deterministic and keyed by batchId, staged under
    * `_staging/b<id>` and RENAMED into place — the rename is the commit
    * point, a replayed batch whose directory exists is a no-op, and a
    * crash mid-stage leaves only staging litter that replay overwrites.
    * Single-writer assumption, as with the store. */
  def streamingCountMin(stream: DataFrame, valueCol: String,
                        sketchPath: String, checkpoint: String,
                        depth: Int = 4, width: Int = 1024)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSketchBatch(batch, batchId, sketchPath, valueCol, depth,
          width)
      }
      .start()

  /** One sketch micro-batch (exposed for replay/crash testing). */
  private[graft] def processSketchBatch(batch: DataFrame, batchId: Long,
                                        sketchPath: String,
                                        valueCol: String, depth: Int,
                                        width: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$sketchPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) return // committed: replayed batch is a no-op
    val stg = new Path(s"$sketchPath/_staging/b$batchId")
    fs.delete(stg, true) // crashed earlier attempt's litter
    graft.operators.Sketches.countMin(batch, col(valueCol), depth, width)
      .coalesce(1) // <= depth*width rows: one file, no small-file spray
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"sketch commit rename failed: $stg -> $dst")
  }

  /** The live maintained sketch: cellwise sum over every committed
    * micro-batch delta — same (row, bucket, cnt) shape as a batch
    * [[graft.operators.Sketches.countMin]], so
    * [[graft.operators.Sketches.countMinEstimate]] probes it
    * unchanged. */
  def readCountMin(spark: org.apache.spark.sql.SparkSession,
                   sketchPath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(sketchPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // before the first commit (or after a crash that left only staging
    // litter) there is nothing visible: the live sketch is EMPTY, not an
    // AnalysisException — a monitor may race the first rename
    val hasCommits = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (!hasCommits) {
      // schema DERIVED from an empty countMin build (no jobs run), so
      // this branch cannot drift from the real sketch layout
      import spark.implicits._
      graft.operators.Sketches.countMin(
        Seq.empty[String].toDF("_v"), col("_v"))
    } else
      spark.read.parquet(sketchPath)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Maintain a [[graft.operators.Sketches.hllRegisters]] distinct-count
    * sketch over a stream — the live cardinality profile beside the
    * frequency profile ([[streamingCountMin]]). Exploits HLL's defining
    * property: registers merge by cellwise MAX, so each micro-batch
    * writes its own bounded (≤ groups·2^p rows) register DELTA under
    * `sketchPath/batch=<id>` behind the staged rename (the commit
    * point: replayed ids no-op, crash litter absorbed), and the live
    * sketch is the per-(group, bucket) max over committed deltas
    * ([[readHll]]) — EQUAL to the batch build over the union by the
    * merge identity (spec-gated). [[graft.operators.Sketches.hllEstimate]]
    * reads it unchanged. Single-writer assumption, as with the store. */
  def streamingHll(stream: DataFrame, groupCol: String, valueCol: String,
                   sketchPath: String, checkpoint: String, p: Int = 8)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processHllBatch(batch, batchId, sketchPath, groupCol, valueCol, p)
      }
      .start()

  /** One HLL micro-batch (exposed for replay/crash testing). */
  private[graft] def processHllBatch(batch: DataFrame, batchId: Long,
                                     sketchPath: String, groupCol: String,
                                     valueCol: String, p: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$sketchPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) return // committed: replayed batch is a no-op
    val stg = new Path(s"$sketchPath/_staging/b$batchId")
    fs.delete(stg, true) // crashed earlier attempt's litter
    graft.operators.Sketches.hllRegisters(batch, groupCol, col(valueCol), p)
      .coalesce(1) // <= groups * 2^p rows: one file
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"hll commit rename failed: $stg -> $dst")
  }

  /** The live maintained HLL: per-(group, bucket) MAX over every
    * committed delta — same (group, bucket, register) shape as a batch
    * [[graft.operators.Sketches.hllRegisters]] build, so
    * [[graft.operators.Sketches.hllEstimate]] probes it unchanged. */
  def readHll(spark: org.apache.spark.sql.SparkSession, sketchPath: String,
              groupCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(sketchPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCommits = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (!hasCommits) {
      // schema derived from an empty build — cannot drift from the real
      // sketch layout (the readCountMin discipline)
      import spark.implicits._
      graft.operators.Sketches.hllRegisters(
        Seq.empty[(String, String)].toDF(groupCol, "_v"), groupCol,
        col("_v"))
    } else
      spark.read.parquet(sketchPath)
        .groupBy(groupCol, "bucket").agg(max("register").as("register"))
  }

  /** Maintain a dataset publish manifest
    * ([[graft.operators.Pipeline.datasetManifest]]) over a document
    * stream — the live "what exactly have we published" audit beside
    * the frequency/cardinality profiles. Exploits the manifest's
    * defining property: every field is a mergeable aggregate (counts
    * and token sums add, id bounds min/max, and the two checksums are
    * SUMS of 56-bit keys mod 2^56 — modular addition merges exactly),
    * so each micro-batch writes its own ≤ |groups|-row manifest DELTA
    * under `manifestPath/batch=<id>` behind the staged rename (replayed
    * ids no-op, crash litter absorbed), and the live manifest is one
    * tiny aggregation over committed deltas ([[readManifest]]) — EQUAL
    * to the batch build over the union of every ingested row
    * (spec-gated identity). Single-writer assumption, as with the
    * store. */
  def streamingManifest(stream: DataFrame, groupCol: String,
                        manifestPath: String, checkpoint: String)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processManifestBatch(batch, batchId, manifestPath, groupCol)
      }
      .start()

  /** One manifest micro-batch (exposed for replay/crash testing). */
  private[graft] def processManifestBatch(batch: DataFrame, batchId: Long,
                                          manifestPath: String,
                                          groupCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$manifestPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) return // committed: replayed batch is a no-op
    val stg = new Path(s"$manifestPath/_staging/b$batchId")
    fs.delete(stg, true) // crashed earlier attempt's litter
    graft.operators.Pipeline.datasetManifest(batch, groupCol)
      .coalesce(1) // <= |groups| rows: one file
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"manifest commit rename failed: $stg -> $dst")
  }

  /** The live maintained manifest: every column merged by its own
    * aggregate over the committed deltas — identical shape to a batch
    * [[graft.operators.Pipeline.datasetManifest]] over the full ingested
    * corpus, and identical VALUES by the merge identities. */
  def readManifest(spark: org.apache.spark.sql.SparkSession,
                   manifestPath: String, groupCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(manifestPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCommits = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (!hasCommits) {
      // schema derived from an empty build — cannot drift from the real
      // manifest layout (the readCountMin discipline)
      import spark.implicits._
      graft.operators.Pipeline.datasetManifest(
        Seq.empty[(Long, String, String)].toDF("doc_id", groupCol, "text"),
        groupCol)
    } else {
      val mod = lit(72057594037927936L).cast("decimal(38,0)") // 2^56
      def ck(c: String): org.apache.spark.sql.Column =
        pmod(sum(col(c).cast("decimal(38,0)")) % mod, mod).cast("long")
      spark.read.parquet(manifestPath)
        .groupBy(groupCol)
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
          min("min_id").as("min_id"), max("max_id").as("max_id"),
          ck("id_checksum").as("id_checksum"),
          ck("content_checksum").as("content_checksum"))
    }
  }

  /** Maintained streaming priority sample — the DLT weighted sample
    * ([[graft.operators.TextAnalysis.prioritySample]]) kept fresh across
    * micro-batches. Each batch commits its OWN top-k priority rows (a
    * bounded ≤ k-row delta) under `batch=<id>` via the staged rename
    * (the commit point: replayed ids no-op, crash litter is absorbed),
    * and the live sample is the top-k of the union of deltas — EXACTLY
    * the batch build over every ingested row, because per-row priorities
    * are stateless hashes and top-k is a mergeable aggregation:
    * topk(A ∪ B) = topk(topk(A) ∪ B) (the spec asserts the identity
    * against the batch twin). The k·batches read-side union stays tiny;
    * compact by rewriting the read-side top-k as a single delta when
    * batch count grows unbounded. */
  def streamingPrioritySample(stream: DataFrame, weightCol: String,
                              samplePath: String, checkpoint: String,
                              k: Int, idCol: String = "doc_id",
                              seed: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processPriorityBatch(batch, batchId, samplePath, k, weightCol,
          idCol, seed)
      }
      .start()

  /** One priority-sample micro-batch (exposed for replay/crash tests). */
  private[graft] def processPriorityBatch(batch: DataFrame, batchId: Long,
                                          samplePath: String, k: Int,
                                          weightCol: String, idCol: String,
                                          seed: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$samplePath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dst)) return // committed: replayed batch is a no-op
    val stg = new Path(s"$samplePath/_staging/b$batchId")
    fs.delete(stg, true)
    graft.operators.TextAnalysis
      .prioritySample(batch, k, weightCol, idCol, seed)
      .coalesce(1) // <= k rows
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"sample commit rename failed: $stg -> $dst")
  }

  /** The live sample: top-k of the committed deltas. Empty (with the
    * correct schema) before the first commit. */
  def readPrioritySample(spark: org.apache.spark.sql.SparkSession,
                         samplePath: String, k: Int,
                         idCol: String = "doc_id"): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(samplePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCommits = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (!hasCommits) {
      // schema DERIVED from an empty prioritySample build (no jobs run)
      import spark.implicits._
      graft.operators.TextAnalysis.prioritySample(
        Seq.empty[(Long, Long)].toDF(idCol, "_w"), k, "_w", idCol)
    } else
      spark.read.parquet(samplePath).drop("batch")
        .orderBy(desc("priority"), col(idCol)).limit(k)
  }

  // ---- delta-store compaction (shared by the row-state maintained
  // artifacts: postings, packing counts, substring index) ----
  //
  // A months-long streaming job commits one `batch=<id>` directory per
  // micro-batch; at cluster scale the artifact root accumulates
  // thousands of small deltas and every read pays the listing + footer
  // cost. Compaction rewrites the committed prefix as ONE
  // `compacted_<M>` generation, marked by an append-only
  // `_compacted/through=<M>` marker file (the atomic commit point —
  // created with overwrite=false, highest marker wins, no
  // delete-then-rename window). Readers resolve: latest marked
  // generation + the batch deltas ABOVE it; writers treat any
  // batchId ≤ M as already-committed even after its directory is
  // pruned, so a replayed micro-batch can never re-commit compacted
  // data. Crash anywhere: an unmarked `compacted_*` directory is
  // invisible litter the next compaction overwrites; a marked
  // generation with unpruned old deltas double-EXISTS but readers
  // never union them (ids ≤ M are excluded), and the next compaction
  // prunes them. Single-writer per artifact root, the store-wide
  // contract (compaction runs in the maintenance window, not
  // concurrently with the stream's commit of a NEW delta).

  private[graft] def compactedThrough(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Long = {
    val dir = new org.apache.hadoop.fs.Path(root, "_compacted")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("through="))
      .flatMap(n => scala.util.Try(n.stripPrefix("through=").toLong)
        .toOption)
      .foldLeft(-1L)(math.max)
  }

  private def committedBatchIds(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("batch=").toLong).toOption)

  /** The directories a reader unions: the latest marked compacted
    * generation (if any) plus every committed delta above it. Empty =
    * nothing ingested yet. */
  private[graft] def deltaSources(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = compactedThrough(fs, root)
    val gen = if (m >= 0) Seq(s"$path/compacted_$m") else Nil
    gen ++ committedBatchIds(fs, root).filter(_ > m).sorted
      .map(i => s"$path/batch=$i")
  }

  /** True when this batch id must NOT be (re-)committed: its delta
    * directory exists, or it is covered by a compacted generation
    * (whose delta directories may already be pruned). */
  private[graft] def alreadyCommitted(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path, batchId: Long): Boolean =
    fs.exists(dst) || batchId <= compactedThrough(fs, root)

  /** Compact an artifact root: rewrite [latest generation + committed
    * deltas] as one `compacted_<M>` generation, mark it, prune the
    * absorbed directories. `merge` pre-aggregates the generation where
    * the artifact supports it (the substring index's min/sum — shrinks
    * the stored generation to one row per key); identity for pure
    * row-state artifacts (postings, packing counts). Returns the new
    * (or unchanged) compacted-through id; -1 when nothing is committed
    * yet. */
  def compactDeltas(spark: org.apache.spark.sql.SparkSession,
                    path: String,
                    merge: DataFrame => DataFrame = identity): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m0 = compactedThrough(fs, root)
    // finish any earlier run's interrupted prune FIRST: a crash between
    // marker creation and prune leaves delta dirs ≤ marker and older
    // compacted_* generations orphaned — readers already exclude them
    // (the marker governs), but without this sweep they'd accumulate
    // forever (the earlier code only deleted ids > the NEW m0 and the
    // immediately previous generation)
    if (m0 >= 0) pruneAbsorbed(fs, path, m0)
    val ids = committedBatchIds(fs, root).filter(_ > m0)
    if (ids.isEmpty) return m0 // nothing new to absorb
    val m = ids.max
    val srcs = deltaSources(spark, path)
    val stg = new org.apache.hadoop.fs.Path(s"$path/_staging/compact_$m")
    fs.delete(stg, true) // a crashed earlier attempt's litter
    merge(spark.read.parquet(srcs: _*).drop("batch"))
      .write.mode("overwrite").parquet(stg.toString)
    val dst = new org.apache.hadoop.fs.Path(s"$path/compacted_$m")
    fs.delete(dst, true) // unmarked litter from a crash after rename
    if (!fs.rename(stg, dst))
      sys.error(s"compaction rename failed: $stg -> $dst")
    // the commit point: append-only marker, highest wins
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_compacted/through=$m")
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    // prune absorbed directories (crash-safe: readers already exclude
    // them via the marker; a partial prune is finished by the NEXT run's
    // opening sweep — pruneAbsorbed covers every delta ≤ marker and every
    // older generation, not just this run's inputs)
    pruneAbsorbed(fs, path, m)
    m
  }

  /** Delete every artifact directory a compaction marker at `through` has
    * absorbed: committed `batch=` deltas with id ≤ `through` and every
    * `compacted_<g>` generation with g < `through`. Idempotent; safe to
    * run any time the marker exists (readers never union absorbed dirs). */
  private def pruneAbsorbed(fs: org.apache.hadoop.fs.FileSystem,
                            path: String, through: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    committedBatchIds(fs, root).filter(_ <= through).foreach(i =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/batch=$i"), true))
    if (fs.exists(root)) fs.listStatus(root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("compacted_"))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("compacted_").toLong).toOption
        .map(g => (g, st.getPath)))
      .filter(_._1 < through)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** [[compactDeltas]] for the maintained substring index: the
    * generation stores the MERGED index (one row per window key), so
    * read-time aggregation shrinks to [new deltas + merged rows]. */
  def compactSubstringIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String): Long =
    compactDeltas(spark, path, df => df.groupBy("k1", "k2")
      .agg(min(col("keep")).as("keep"), sum(col("occ")).as("occ")))

  /** Maintain the TRAINING-SEQUENCE PACKING inputs (q102's manifest)
    * over a document stream — closing the last batch-vs-stream
    * asymmetry: [[graft.operators.Packing.packSequences]]' global
    * running sum is ORDER-dependent and not per-batch mergeable (a
    * late-arriving smaller doc_id shifts every later span), so the
    * streamed state is the per-doc TOKEN COUNT frame — stateless per
    * row, the expensive text pass — committed per batch as a
    * (doc_id, n_subtokens) delta under `batch=<id>` behind the staged
    * rename (replayed ids no-op, crash litter absorbed). The live
    * manifest derives on read ([[readPackingManifest]]) by re-running
    * the two-stage running sum over the committed counts: bit-equal to
    * batch packSequences over every ingested doc (spec-gated), at a
    * read cost bounded by the counts frame (~16 bytes/doc — a
    * billion-doc corpus is one cheap job), never a text re-scan.
    * Single-writer assumption, as with the store. */
  def streamingPackingCounts(stream: DataFrame, countsPath: String,
                             checkpoint: String,
                             counter: org.apache.spark.sql.Column =>
                               org.apache.spark.sql.Column =
                               graft.operators.TextAnalysis.subtokenCount)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processPackingBatch(batch, batchId, countsPath, counter)
      }
      .start()

  /** One packing-counts micro-batch (exposed for replay/crash tests). */
  private[graft] def processPackingBatch(batch: DataFrame, batchId: Long,
                                         countsPath: String,
                                         counter: org.apache.spark.sql
                                           .Column => org.apache.spark.sql
                                           .Column): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$countsPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    // committed (directly or via a compacted generation): replay no-ops
    if (alreadyCommitted(fs, new Path(countsPath), dst, batchId)) return
    val stg = new Path(s"$countsPath/_staging/b$batchId")
    fs.delete(stg, true)
    batch.select(col("doc_id"),
        counter(col("text")).cast("long").as("n_subtokens"))
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"packing commit rename failed: $stg -> $dst")
  }

  /** The live packing manifest over everything ingested so far: the
    * q102 (doc_id, seq_id, tok_from, tok_to, pos_in_seq) rows derived
    * from the committed counts with
    * [[graft.operators.Packing.packSequencesFromCounts]] — identical to
    * a batch [[graft.operators.Packing.packSequences]] over the full
    * ingested prefix. Empty (correct schema) before the first commit. */
  def readPackingManifest(spark: org.apache.spark.sql.SparkSession,
                          countsPath: String, seqLen: Long): DataFrame = {
    val srcs = deltaSources(spark, countsPath)
    import spark.implicits._
    val counts =
      if (srcs.isEmpty) Seq.empty[(Long, Long)].toDF("doc_id", "n_subtokens")
      else spark.read.parquet(srcs: _*).select("doc_id", "n_subtokens")
    graft.operators.Packing.packSequencesFromCounts(counts, seqLen)
  }

  /** Maintained streaming BM25 postings index — the live lexical search
    * index over a document stream, beside the maintained CMS/sample.
    * Each micro-batch commits its documents' postings rows
    * (doc_id, dl, term_key, tf — [[graft.operators.Retrieval.postings]])
    * as a DELTA under `batch=<id>` via the staged rename (the commit
    * point: a replayed id no-ops, crash litter is absorbed), and the
    * live index is the plain UNION of committed deltas
    * ([[readPostings]]) — equal to the batch postings build over every
    * ingested document EXACTLY, because postings rows are per
    * (doc, term) and an append-only stream delivers each document in
    * one batch (the spec asserts the identity; re-INGESTING the same
    * doc_id in a later batch would double-index it, same single-ingest
    * contract as the store). [[graft.operators.Retrieval
    * .bm25OverPostings]] probes the live index unchanged — df, N and
    * avgdl derive from the postings rows themselves, so search
    * freshness is automatic as commits land; no stats refresh step
    * exists to forget. */
  def streamingPostings(stream: DataFrame, postingsPath: String,
                        checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processPostingsBatch(batch, batchId, postingsPath)
      }
      .start()

  /** One postings micro-batch (exposed for replay/crash tests). */
  private[graft] def processPostingsBatch(batch: DataFrame,
                                          batchId: Long,
                                          postingsPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$postingsPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    // committed (directly or via a compacted generation): replay no-ops
    if (alreadyCommitted(fs, new Path(postingsPath), dst, batchId)) return
    val stg = new Path(s"$postingsPath/_staging/b$batchId")
    fs.delete(stg, true) // crashed earlier attempt's litter
    graft.operators.Retrieval.postings(batch)
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"postings commit rename failed: $stg -> $dst")
  }

  /** The live maintained postings index: the union of every committed
    * micro-batch delta — same (doc_id, dl, term_key, tf) shape as a
    * batch [[graft.operators.Retrieval.postings]] build, so
    * [[graft.operators.Retrieval.bm25OverPostings]] searches it
    * unchanged. Empty (with the correct schema) before the first
    * commit. Compaction, when batch count grows unbounded, is a rewrite
    * of the union as one delta — the rows are the state. */
  def readPostings(spark: org.apache.spark.sql.SparkSession,
                   postingsPath: String): DataFrame = {
    val srcs = deltaSources(spark, postingsPath)
    if (srcs.isEmpty) {
      // schema DERIVED from an empty postings build (no jobs run)
      import spark.implicits._
      graft.operators.Retrieval.postings(
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
    } else
      spark.read.parquet(srcs: _*).drop("batch")
  }

  /** Maintained streaming SUBSTRING-DEDUP index — the live counterpart
    * of [[graft.operators.SubstringIndex.buildIndex]] over a document
    * stream, completing the maintained-artifact family (postings, CMS,
    * HLL, manifest, packing counts). Each micro-batch commits its own
    * batch-local index — the per-key (k1, k2, keep, occ) PARTIAL
    * aggregate, which holds the expensive text pass (window hashing) —
    * as a delta under `batch=<id>` behind the staged rename (replayed
    * ids no-op, crash litter absorbed). Because the index aggregation
    * is commutative-associative (keep = min of minima, occ = sum of
    * counts), the live index derives on read
    * ([[readSubstringIndex]]) by ONE re-aggregation over the committed
    * partials — bit-equal to a batch `buildIndex` over every ingested
    * document (spec-gated), at a read cost bounded by the partials
    * (~32 bytes/window-key), never a text re-scan. Dedup of the
    * ingested corpus then runs straight off the merged index via
    * [[graft.operators.SubstringIndex.dedupeWithIndex]]. Single-writer
    * assumption, as with the store; same single-ingest contract as
    * postings (re-ingesting a doc_id would double-count its windows).
    */
  def streamingSubstringIndex(stream: DataFrame, indexPath: String,
                              checkpoint: String,
                              window: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSubstringBatch(batch, batchId, indexPath, window)
      }
      .start()

  /** One substring-index micro-batch (exposed for replay/crash tests). */
  private[graft] def processSubstringBatch(batch: DataFrame, batchId: Long,
                                           indexPath: String,
                                           window: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$indexPath/batch=$batchId")
    val fs = dst.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    // committed (directly or via a compacted generation): replay no-ops
    if (alreadyCommitted(fs, new Path(indexPath), dst, batchId)) return
    val stg = new Path(s"$indexPath/_staging/b$batchId")
    fs.delete(stg, true) // crashed earlier attempt's litter
    graft.operators.SubstringIndex.buildIndex(batch, window)
      .write.mode("overwrite").parquet(stg.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(stg, dst))
      sys.error(s"substring-index commit rename failed: $stg -> $dst")
  }

  /** The live substring index: committed per-batch partials merged by
    * the index's own associative aggregation (keep = least of the
    * batch minima, occ = summed counts) — equal to
    * [[graft.operators.SubstringIndex.buildIndex]] over the full
    * ingested prefix EXACTLY. Empty (correct schema) before the first
    * commit. */
  def readSubstringIndex(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, window: Int): DataFrame = {
    val srcs = deltaSources(spark, indexPath)
    if (srcs.isEmpty) {
      // schema DERIVED from an empty index build (no jobs run)
      import spark.implicits._
      graft.operators.SubstringIndex.buildIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), window)
    } else
      spark.read.parquet(srcs: _*).drop("batch")
        .groupBy("k1", "k2")
        .agg(min(col("keep")).as("keep"), sum(col("occ")).as("occ"))
  }

  /** Ingest-time duplicate guard for MEDIA payloads — the modality
    * counterpart of [[streamingNearDupGuard]]: drop (default) or keep
    * (`invert`) stream rows whose 56-bit perceptual fingerprint lands
    * within the batch banding's reach of an already-ingested corpus.
    * `existingHashes` is any `(_id, simhash)` frame ([[graft.operators
    * .Multimodal.dHashes]], [[graft.operators.Audio.fingerprints]],
    * [[graft.operators.Video.fingerprints]]); `hashFn` is the matching
    * per-payload fingerprint (the SAME function the column side maps, so
    * stream and batch hashes are bit-identical by construction).
    *
    * Pigeonhole contract, same as the batch join: Hamming ≤ maxHamming
    * forces ≥ 1 of the maxHamming+1 bands equal, so a band collision is
    * a conservative SUPERSET of true near-dups — a popular band may
    * quarantine a clean payload (benign direction); no true near-dup is
    * ever missed. Undecodable payloads have no fingerprint — always
    * clean, mirroring the batch paths' drop semantics.
    *
    * Stateless: each stream row pays one in-JVM decode+fingerprint and
    * maxHamming+1 index probes against a broadcast exact-or-bloom key
    * set ([[keyIndex]] — bounded driver memory past `exactKeyLimit`). */
  def streamingFingerprintGuard(stream: DataFrame,
                                existingHashes: DataFrame,
                                payloadCol: String = "payload",
                                hashFn: Array[Byte] => java.lang.Long,
                                maxHamming: Int = 3,
                                invert: Boolean = false,
                                exactKeyLimit: Long = 4L * 1000 * 1000,
                                bloomFpp: Double = 0.01): DataFrame = {
    import graft.operators.Dedup
    val spec = Dedup.hammingBandSpec(maxHamming)
    require(spec.size <= 255,
      s"maxHamming + 1 bands must fit the key's top byte (got ${spec.size})")
    val keyCols = spec.zipWithIndex.map { case ((offset, width), b) =>
      shiftleft(lit(b.toLong), 56).bitwiseOR(
        shiftright(col("simhash"), offset)
          .bitwiseAND(lit((1L << width) - 1)))
    }
    val index = keyIndex(
      existingHashes.select(explode(array(keyCols: _*)).as("_k")),
      exactKeyLimit, bloomFpp)
    val bIdx = stream.sparkSession.sparkContext.broadcast(index)
    val idx = stream.schema.fieldIndex(payloadCol)
    val bandSpec = spec.toArray
    stream.filter { row =>
      val h =
        if (row.isNullAt(idx)) null
        else hashFn(row.getAs[Array[Byte]](idx))
      val collides = h != null && bandSpec.indices.exists { b =>
        val (offset, width) = bandSpec(b)
        bIdx.value.mightContain(
          (b.toLong << 56) | ((h >> offset) & ((1L << width) - 1)))
      }
      collides == invert
    }
  }

  /** JVM twin of the column-side band hashing ([[graft.operators
    * .Dedup.bandedProjection]] over [[graft.functions.MinHashExpr]]
    * signatures): the SAME compiled kernel computes the signature, and
    * the packed key replays md5(comma-joined minima) exactly
    * ([[packedBandKey]]) — empty for docs with no shingles. */
  // per-thread digest: the guard runs per ROW on the ingest hot path —
  // a JCA provider lookup + allocation per row would dominate the probe
  // (the MinHashExpr.digest pattern)
  private val bandDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private[graft] def bandKeysJvm(text: String, n: Int, numHashes: Int,
                                 bands: Int): Seq[Long] = {
    val sig = graft.functions.MinHashExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      n, numHashes).getArray(0)
    if (sig.numElements() == 0) Seq.empty
    else {
      val r = numHashes / bands
      val md = bandDigest.get()
      (0 until bands).map { b =>
        val joined = (b * r until (b + 1) * r)
          .map(j => sig.getLong(j).toString).mkString(",")
        md.reset()
        val d = md.digest(joined
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var j = 0
        while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        (b.toLong << 56) | v
      }
    }
  }

  /** Streaming decontamination guard: drop stream documents sharing any
    * token n-gram with a STATIC held-out set (the batch
    * [[graft.operators.TextAnalysis.decontaminate]] as an ingest-time
    * filter). The held-out grams collapse ONCE to the same md5-derived
    * 56-bit keys the batch operator ships and ride a broadcast variable;
    * each stream row pays one tokenize + (tokens−n+1) hash-set probes
    * inside a typed filter.
    *
    * This is the engine's one deliberate non-codegen hot path: Structured
    * Streaming offers no stream-native way to express "doc passes iff NO
    * exploded gram matches" without either a state store (explode →
    * re-aggregate, which adds watermark latency) or an unsupported
    * stream-stream anti-join — a stateless broadcast-set probe is the
    * shape that keeps the guard output-mode-agnostic and latency-free.
    * Row-for-row agreement with the batch operator is gated in
    * StreamingSpec. `invert = true` emits the QUARANTINE stream
    * (contaminated docs only) instead.
    *
    * The distinct gram-key set collects to the DRIVER (unlike the batch
    * twin, which has a shuffled anti-join, a stream has no fallback
    * shape — see the paragraph above), so the eval-suite-≪-corpus
    * assumption is enforced, not assumed: more than `maxKeys` distinct
    * grams fails FAST with a sizing message instead of quietly OOMing
    * the driver mid-stream. The default (2^26 ≈ 67M keys ≈ 1 GiB as a
    * broadcast long-set) covers any realistic eval suite; raise it
    * deliberately, with driver memory to match, when a bigger held-out
    * set is genuinely intended. */
  def streamingDecontaminate(stream: DataFrame, test: DataFrame, n: Int = 4,
                             textCol: String = "text",
                             invert: Boolean = false,
                             maxKeys: Long = 1L << 26): DataFrame = {
    import graft.operators.TextAnalysis
    val distinctKeys = test
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("_g"))
      .select(TextAnalysis.gramHash(col("_g")).as("_gk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKeys = distinctKeys.count()
    require(nKeys <= maxKeys,
      s"streamingDecontaminate: held-out set has $nKeys distinct $n-gram " +
        s"keys > maxKeys=$maxKeys — this guard broadcasts the whole key " +
        "set from the driver; shrink the held-out set, raise n, or raise " +
        "maxKeys (with driver memory to match)")
    // persisted across the sizing count and this collect — the guard must
    // not pay the explode+hash+distinct shuffle twice at stream start
    val keys: Set[Long] =
      distinctKeys.collect().map(_.getLong(0)).toSet
    distinctKeys.unpersist(false)
    val bKeys = stream.sparkSession.sparkContext.broadcast(keys)
    val idx = stream.schema.fieldIndex(textCol)
    stream.filter { row =>
      val contaminated = !row.isNullAt(idx) &&
        gramKeysJvm(row.getString(idx), n).exists(bKeys.value.contains)
      contaminated == invert
    }
  }

  /** The ingest-time form of [[graft.operators.Pipeline.curate]]'s
    * gates — one call chains the full stateless hygiene funnel over a
    * document stream, in the batch funnel's exact order: language gate
    * ([[graft.operators.TextAnalysis.predLangExpr]], a pure column
    * predicate), quality gate ([[streamingQualityFilter]]), exact-dup
    * novelty against the INDEXED kept corpus (56-bit text keys through
    * the shared exact-or-bloom [[keyIndex]] — conservative in the bloom
    * regime: a false positive drops a clean doc, never keeps a dup),
    * and eval-suite decontamination ([[streamingDecontaminate]]).
    * Returns the CLEAN stream; every check is stateless per row.
    *
    * Contract differences vs the batch funnel, by construction:
    * INTRA-stream duplicates pass (a stateless guard cannot see an
    * identical doc earlier in the same stream — the batch dedup at the
    * store boundary owns that, same as the near-dup guard's contract),
    * and novelty keys are the 56-bit md5 prefix rather than the batch
    * funnel's full 128-bit hex (a prefix collision quarantines a clean
    * doc — the benign direction; odds ≈ n²/2⁵⁷). The spec pins
    * agreement with the batch stage decisions on indexed-corpus
    * duplicates and everything downstream. */
  def streamingCurateGuard(stream: DataFrame, existing: DataFrame,
                           test: DataFrame, lang: String = "en",
                           gramN: Int = 4, textCol: String = "text",
                           exactKeyLimit: Long = 4L * 1000 * 1000,
                           bloomFpp: Double = 0.01,
                           maxKeys: Long = 1L << 26): DataFrame = {
    import graft.operators.TextAnalysis
    val langOk = stream.filter(coalesce(
      TextAnalysis.predLangExpr(col(textCol)) === lang, lit(false)))
    val qualOk = streamingQualityFilter(langOk, 0L, 256, textCol)
    val index = keyIndex(
      existing.select(
        graft.operators.Dedup.md5Long(col(textCol)).as("_k")),
      exactKeyLimit, bloomFpp)
    val bIdx = qualOk.sparkSession.sparkContext.broadcast(index)
    val idx = qualOk.schema.fieldIndex(textCol)
    val novel = qualOk.filter { row =>
      // null text cannot reach here (the language gate drops it), but
      // stay defensive: a null is not novel evidence either way -> drop
      !row.isNullAt(idx) &&
        !bIdx.value.mightContain(textKeyJvm(row.getString(idx)))
    }
    streamingDecontaminate(novel, test, gramN, textCol, invert = false,
      maxKeys = maxKeys)
  }

  /** JVM twin of [[graft.operators.Dedup.md5Long]] over a raw text
    * value (NO trim/tokenize — the whole string's md5 top-7 bytes),
    * bit-identical to the column side so stream and batch novelty keys
    * cannot drift. */
  private[graft] def textKeyJvm(text: String): Long = {
    val md = bandDigest.get()
    md.reset()
    val d = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v
  }

  /** JVM twin of the column-side gram hashing
    * ([[graft.operators.TextAnalysis.ngrams]] + md5-prefix key), kept
    * BIT-IDENTICAL so streaming and batch decontamination agree on every
    * row: Spark's `trim` strips the space char only (not Java's
    * whitespace-≤U+0020 rule) and its `split` keeps leading empties
    * (Pattern.split with limit −1). */
  private[graft] def gramKeysJvm(text: String, n: Int): Iterator[Long] = {
    var s = text
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s = s.substring(a, b)
    val toks = s.split("\\s+", -1)
    if (toks.length < n) Iterator.empty
    else {
      val md = bandDigest.get() // per-thread; per-row lookup+alloc is hot
      (0 to toks.length - n).iterator.map { i =>
        md.reset()
        val d = md.digest(
          toks.slice(i, i + n).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 14 hex chars = the top 7 bytes' hex, i.e. 56 bits
        var v = 0L
        var j = 0
        while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        v
      }
    }
  }

  /** Watermarked per-hour event statistics — the canonical streaming agg
    * shape (readStream → watermark → windowed groupBy → writeStream).
    * `events` must carry a TimestampType `ts` column. */
  def eventStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        avg(col("value")).as("avg_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("avg_value"))
}
