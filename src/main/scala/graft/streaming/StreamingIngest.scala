package graft.streaming

import graft.api.TemporalVectorDB
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
  * Delivery semantics: foreachBatch is at-least-once; `addVersions` is an
  * append, so a naively retried micro-batch would duplicate (content_id,
  * seq) rows. [[start]] therefore records a per-batch commit marker under
  * `<store>/_streaming_commits/<batchId>` (underscore-prefixed — invisible
  * to parquet readers) and skips any batch whose marker already exists,
  * making recovery-replay idempotent. The remaining window is a crash
  * BETWEEN the data append and the marker write (that one batch can
  * duplicate on restart) — closing it fully requires a transactional table
  * format; plain parquet has no atomic multi-file commit.
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

  /** One micro-batch: append unless this batchId's commit marker already
    * exists (idempotent replay). Exposed for direct testing. */
  def processBatch(db: TemporalVectorDB, batch: DataFrame,
                   batchId: Long): Unit = {
    val commits = new org.apache.hadoop.fs.Path(db.path, "_streaming_commits")
    val fs = commits.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(commits, batchId.toString)
    if (!fs.exists(marker) && !batch.isEmpty) {
      db.addVersions(batch)
      fs.mkdirs(commits)
      fs.create(marker, true).close()
    }
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
    * not the stream length; at scale add a `GroupStateTimeout` eviction and
    * re-seed evicted contents from the store's max-seq (cold-start path).
    * The emitted Dataset appends to the versions table via any sink. */
  def statefulIngest(
      stream: Dataset[(String, java.sql.Timestamp, Array[Float])],
      cfg: VersionStore.Config = VersionStore.Config(),
      initial: Option[Dataset[(String, IngestState)]] = None)
      : Dataset[VersionRecord] = {
    import stream.sparkSession.implicits._
    val grouped = stream.groupByKey(_._1)
    val func =
        (contentId: String,
         rows: Iterator[(String, java.sql.Timestamp, Array[Float])],
         state: GroupState[IngestState]) => {
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
          out.iterator
        }

    initial match {
      case None => grouped.flatMapGroupsWithState[IngestState, VersionRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
      case Some(init) =>
        grouped.flatMapGroupsWithState[IngestState, VersionRecord](
          OutputMode.Append, GroupStateTimeout.NoTimeout,
          init.groupByKey(_._1).mapValues(_._2))(func)
    }
  }

  /** [[statefulIngest]] seeded from an existing versions store: initial
    * per-content state is (max seq, reconstructed latest embedding), so
    * streamed versions CONTINUE existing timelines — seqs don't restart and
    * the first streamed delta diffs against the stored latest state (the
    * reference's add-to-existing-timeline semantics,
    * temporal_database.py:107-135, in streaming form). One reconstruction
    * job at stream start; no store reads afterwards. */
  def statefulIngestFrom(
      stream: Dataset[(String, java.sql.Timestamp, Array[Float])],
      db: TemporalVectorDB): Dataset[VersionRecord] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val latest = db.versions.groupBy("content_id")
      .agg(max("seq").as("seq"))
    val seed = graft.operators.Reconstruction
      .reconstruct(db.versions, latest)
      .select(col("content_id"), col("seq"), col("embedding"))
      .as[(String, Int, Array[Float])]
      .map { case (c, s, e) => (c, IngestState(s, e)) }
    statefulIngest(stream, db.cfg, Some(seed))
  }

  /** Streaming exact deduplication: drop rows whose dedup key was already
    * seen within the watermark horizon — the streaming counterpart of the
    * batch exact-dedup operator, with bounded state (keys expire with the
    * watermark). `df` must carry a TimestampType `ts` column. */
  def streamingDedup(df: DataFrame, keyCols: Seq[String],
                     watermarkDelay: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

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
