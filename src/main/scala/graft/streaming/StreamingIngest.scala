package graft.streaming

import graft.api.TemporalVectorDB
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming ingest for the versioned store (SURVEY §2.10
  * "streaming" extension — the reference has no streaming surface; its
  * ingest is synchronous one-row-at-a-time, temporal_database.py:86-178).
  *
  * The stream reuses the BATCH ingest job via `foreachBatch`: every
  * micro-batch runs the same windowed seq-assignment + promotion + delta
  * pipeline against the current store state, so streaming and batch ingest
  * have identical semantics by construction. Checkpointing gives
  * exactly-once appends into the parquet store.
  */
object StreamingIngest {

  /** Start ingesting a stream of (content_id, ts, embedding) rows.
    * Micro-batches are applied through [[TemporalVectorDB.addVersions]]
    * (seq offsets continue from the stored max per content). */
  def start(stream: DataFrame, db: TemporalVectorDB,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) db.addVersions(batch)
      }
      .start()

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
