package graft

import graft.operators.Multimodal
import graft.queries.DedupQueries
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** Ingest-guard + maintained-sketch cost datapoints (dev tool, not a
  * declared query): prices the streaming fingerprint guard (index build
  * from an existing media corpus, broadcast payload size, per-row
  * decode+probe throughput) and the maintained count-min pipeline
  * (per-batch delta write through the staged-rename commit, live-sketch
  * merge read) at the bench scale factor. One JSON line, the
  * BenchStream pattern. */
object BenchGuards {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- fingerprint guard over the image fixture corpus ---
    val media = DedupQueries.mediaFrame(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nMedia = media.count() // decode-free count; materializes payloads
    // guard against HALF the corpus: the other half streams through and
    // splits into colliding (same fixture family) vs clean rows
    val existing = Multimodal.dHashes(
        media.where(pmod(col("media_id"), lit(2)) === 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    existing.count()
    // only the NON-indexed half streams through (the other half would
    // trivially collide with its own hash and distort the kept counts)
    val streamed = media.where(pmod(col("media_id"), lit(2)) === 1)
    val hashFn: Array[Byte] => java.lang.Long = Multimodal.dHash56(_)
    // index build (the per-deployment one-time cost)
    val t0 = System.nanoTime()
    val guarded = StreamingIngest.streamingFingerprintGuard(
      streamed, existing, hashFn = hashFn)
    // the guard builds its index eagerly inside the call; force the
    // filtered scan too so probe throughput is measured end to end
    val kept = guarded.count()
    val guardSec = (System.nanoTime() - t0) / 1e9
    // a second pass isolates steady-state probe cost (index built above
    // is NOT reused — the API is stateless — so rebuild + probe again
    // and report both)
    val t1 = System.nanoTime()
    val kept2 = StreamingIngest.streamingFingerprintGuard(
      streamed, existing, hashFn = hashFn).count()
    val guardSec2 = (System.nanoTime() - t1) / 1e9

    // --- maintained count-min over document tokens ---
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-cms")
      .toFile; dir.delete()
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nToks = toks.count()
    val half = toks.sample(withReplacement = false, 0.5, seed = 1)
    val t2 = System.nanoTime()
    StreamingIngest.processSketchBatch(half, 0L,
      dir.getAbsolutePath, "w", 4, 1024)
    StreamingIngest.processSketchBatch(toks.exceptAll(half), 1L,
      dir.getAbsolutePath, "w", 4, 1024)
    val deltaSec = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val cells = StreamingIngest
      .readCountMin(spark, dir.getAbsolutePath).count()
    val mergeSec = (System.nanoTime() - t3) / 1e9

    println(s"""{"metric":"guards","unit":"sec","n_media":$nMedia,"guard_cold":$guardSec,"guard_rebuild":$guardSec2,"guard_kept":$kept,"guard_kept2":$kept2,"n_tokens":$nToks,"cms_two_deltas":$deltaSec,"cms_merge_read":$mergeSec,"cms_cells":$cells,"sf":"$sfDir"}""")
    spark.stop()
  }
}
