package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery for the durable epoch-committed stores
  * ([[SubstringDedupStore]], [[FingerprintStore]], [[FuzzyKeyStore]],
  * [[SemanticDedupStore]]) — ONE implementation of the store-wide
  * contract so its crash-safety reasoning lives in one place:
  *
  *  - artifacts are written FIRST (idempotent overwrites), then the
  *    epoch's commit marker is created atomically with overwrite=false
  *    — unmarked litter is invisible to readers and a replayed commit
  *    onto a marked epoch fails loudly at the marker create;
  *  - readers resolve at the highest MARKED epoch;
  *  - delta-epoch artifact chains resolve LATEST-EPOCH-WINS per key
  *    from the governing snapshot (valid whenever rows are only added
  *    or relabeled, never deleted — each store documents why);
  *  - pruning only ever removes directories BELOW the latest snapshot,
  *    which readers never resolve, so an interrupted prune is finished
  *    by the next compaction's sweep.
  */
private[graft] object EpochStoreKit {

  def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- fault-injection boundaries (test-only) -----------------------
  //
  // Every MUTATING filesystem operation a store performs (artifact
  // write, marker create, token write, prune delete) announces itself
  // here before executing. Production cost is one empty-map check; the
  // fault-sweep spec registers a hook under a store root and throws at
  // the k-th boundary, turning "the crash windows we thought of" into
  // an exhaustive kill-at-every-boundary sweep. Hooks are keyed by root
  // prefix so concurrent suites cannot trip each other.
  private val faultHooks =
    new java.util.concurrent.ConcurrentHashMap[String, String => Unit]()

  private[graft] def installFaultHook(rootPrefix: String,
                                      hook: String => Unit): Unit =
    faultHooks.put(rootPrefix, hook)

  private[graft] def clearFaultHook(rootPrefix: String): Unit =
    faultHooks.remove(rootPrefix)

  /** Announce a mutating operation on `path` — fires any hook whose
    * registered root the path CONTAINS (containment, not prefix: paths
    * sourced from `fs.listStatus` carry a `file:` scheme that a
    * scheme-less registered root would never prefix-match — which would
    * silently exempt every prune delete from the sweep). Called BEFORE
    * the mutation, so a throwing hook simulates a crash that prevented
    * it. */
  private[graft] def boundary(path: String): Unit =
    if (!faultHooks.isEmpty) {
      val it = faultHooks.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (path.contains(en.getKey)) en.getValue.apply(path)
      }
    }

  /** True when a fault hook overlaps `root` (the hook's key is inside
    * the root or vice versa) — the fault sweeps enumerate write
    * boundaries by ORDER, so facades that overlap member operations
    * concurrently in production fall back to the serial order while a
    * sweep is driving them. */
  private[graft] def hasHookFor(root: String): Boolean =
    !faultHooks.isEmpty && {
      val it = faultHooks.keySet().iterator()
      var found = false
      while (it.hasNext && !found) {
        val k = it.next()
        found = k.contains(root) || root.contains(k)
      }
      found
    }

  /** Overwrite-mode parquet write with a fault boundary — ALL store
    * artifact writes go through here so the sweep sees them. */
  def writeParquet(df: DataFrame, path: String): Unit = {
    boundary(path)
    df.write.mode("overwrite").parquet(path)
  }

  // ---- idempotence tokens (the streaming bridge) --------------------
  //
  // append(batch, token) must be an exactly-once operation under
  // Structured Streaming's replay contract: foreachBatch re-delivers
  // the last batch after a restart, so the sink needs a durable record
  // of "this batch already committed". The token file (content = the
  // epoch it committed) is written AFTER the epoch's artifacts and
  // BEFORE its commit marker:
  //   - crash before the token: no record, litter invisible — the
  //     replay recomputes everything (inputs unchanged: the epoch never
  //     committed);
  //   - crash between token and marker: the replay finds the token
  //     naming epoch+1 — artifacts are fully written but uncommitted;
  //     recompute-and-commit converges (same inputs, idempotent
  //     overwrites);
  //   - crash after the marker: the replay finds the token naming a
  //     committed epoch — a no-op.

  def tokenPath(root: String, token: String): Path = {
    val safe = sanitizeToken(token)
    // sanitization alone is not injective ("a/b" and "a_b" collide, and a
    // collision makes replayCheck treat a NEW append as a committed replay
    // and silently drop the batch) — suffix a digest of the raw token so
    // distinct tokens can never share a file
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
    new Path(s"$root/_tokens/$safe-$digest")
  }

  private def sanitizeToken(token: String): String =
    token.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c
      else '_')

  /** The pre-digest token path (stores written before the '-digest'
    * suffix): [[replayCheck]] falls back to it so a replayed
    * exactly-once append on an UPGRADED store still finds its committed
    * token instead of re-attempting and wedging on the disjoint-id
    * guard. New tokens always write the digest-suffixed path. */
  private def legacyTokenPath(root: String, token: String): Path =
    new Path(s"$root/_tokens/${sanitizeToken(token)}")

  def writeToken(fs: FileSystem, path: Path, epoch: Long): Unit = {
    boundary(path.toString)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    out.write(epoch.toString.getBytes("UTF-8"))
    out.close()
  }

  def readToken(fs: FileSystem, path: Path): Option[Long] =
    readText(fs, path, 32).map(_.toLong)

  /** Idempotent small-text write (marker files that carry content,
    * e.g. [[CurationDB]]'s per-member epoch record): overwrites, fires
    * the fault boundary. Replayed writers rewrite identical bytes. */
  def writeText(fs: FileSystem, path: Path, text: String): Unit = {
    boundary(path.toString)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  def readText(fs: FileSystem, path: Path,
               maxBytes: Int = 4096): Option[String] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        // loop to EOF: a single read() is not guaranteed to fill on
        // HDFS/object-store streams, and a short read here would silently
        // truncate an epoch number into a DIFFERENT valid value
        val buf = new Array[Byte](maxBytes)
        var off = 0
        var k = in.read(buf, off, maxBytes - off)
        while (k > 0) {
          off += k
          k = if (off < maxBytes) in.read(buf, off, maxBytes - off) else -1
        }
        Some(new String(buf, 0, off, "UTF-8").trim).filter(_.nonEmpty)
      } finally in.close()
    }

  /** The shared replay protocol for token-carrying appends: returns
    * `Some(epoch)` when `token` already committed (the caller no-ops),
    * `None` when the append must (re-)run — after checking that a torn
    * token (recorded but uncommitted) names exactly the next epoch. */
  def replayCheck(fs: FileSystem, root: String, token: String,
                  currentEpoch: Long): Option[Long] =
    readToken(fs, tokenPath(root, token))
      .orElse(readToken(fs, legacyTokenPath(root, token))) match {
      case Some(n) if n <= currentEpoch => Some(n)
      case Some(n) =>
        require(n == currentEpoch + 1,
          s"token '$token' at $root recorded epoch $n but the store " +
            s"is at $currentEpoch — the token file is corrupt or the " +
            "store was rolled back under it")
        None
      case None => None
    }

  /** Highest numeric child of `dir` (commit/snapshot marker dirs), or
    * -1 when the directory does not exist / has no numeric child. */
  def maxMarked(fs: FileSystem, dir: Path): Long =
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(-1L)(math.max)

  /** Create an empty marker file atomically (overwrite=false): the
    * commit point. A second writer replaying the same epoch fails HERE,
    * after which its (identical-input) artifact overwrites have harmed
    * nothing. */
  def commitMarker(fs: FileSystem, marker: Path): Unit = {
    boundary(marker.toString)
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false)
    out.close()
  }

  /** Idempotent marker create (snapshot marks, compact sentinels):
    * unlike [[commitMarker]], an existing file is fine — re-marking
    * after a torn window must converge, not fail. */
  def markFile(fs: FileSystem, path: Path): Unit = {
    boundary(path.toString)
    fs.mkdirs(path.getParent)
    if (!fs.exists(path)) fs.create(path, false).close()
  }

  /** Plain union of `kind`'s epoch directories `from..to` — the
    * resolution for artifacts whose epochs are DISJOINT row slices
    * (appended data, new-key index deltas). */
  def unionEpochs(spark: SparkSession, root: String, kind: String,
                  from: Long, to: Long,
                  outCols: Seq[String]): DataFrame =
    spark.read.option("basePath", s"$root/$kind")
      .parquet((from to to).map(n => s"$root/$kind/epoch=$n"): _*)
      .select(outCols.map(col): _*)

  /** LATEST-EPOCH-WINS resolution of a delta-epoch artifact chain:
    * epoch `from` must be a full snapshot; later epochs carry only new
    * or changed rows per `keyCols`. Single-epoch reads skip the window. */
  def resolveLatestWins(spark: SparkSession, root: String, kind: String,
                        from: Long, to: Long, keyCols: Seq[String],
                        outCols: Seq[String]): DataFrame = {
    val df = spark.read.option("basePath", s"$root/$kind")
      .parquet((from to to).map(n => s"$root/$kind/epoch=$n"): _*)
    if (from == to) df.select(outCols.map(col): _*)
    else df
      .withColumn("_rk", row_number().over(Window
        .partitionBy(keyCols.map(col): _*).orderBy(col("epoch").desc)))
      .where(col("_rk") === 1)
      .select(outCols.map(col): _*)
  }

  /** [[resolveLatestWins]] restricted to the rows whose key appears in
    * `keys` (a small frame carrying exactly `keyCols`, broadcast) — the
    * append-path resolution: filtering on the window's own partition
    * keys BEFORE the window preserves every surviving per-key group, so
    * the result equals filtering after full resolution (spec-gated via
    * the stores' append ≡ from-scratch gates) at a key-set-sized window
    * instead of an artifact-sized shuffle. */
  def resolveLatestWinsForKeys(spark: SparkSession, root: String,
                               kind: String, from: Long, to: Long,
                               keyCols: Seq[String], outCols: Seq[String],
                               keys: DataFrame): DataFrame = {
    val df = spark.read.option("basePath", s"$root/$kind")
      .parquet((from to to).map(n => s"$root/$kind/epoch=$n"): _*)
      .join(guardedBroadcast(spark, keys), keyCols, "left_semi")
    if (from == to) df.select(outCols.map(col): _*)
    else df
      .withColumn("_rk", row_number().over(Window
        .partitionBy(keyCols.map(col): _*).orderBy(col("epoch").desc)))
      .where(col("_rk") === 1)
      .select(outCols.map(col): _*)
  }

  /** Broadcast `keys` only while its PLAN-STATISTICS size estimate
    * (driver-side, zero extra jobs) stays under
    * `spark.graft.keys.broadcastMaxBytes` (default 256 MB). Past the
    * budget the plain frame is returned and the join shuffles both
    * sides — slower but bounded, where an unconditional broadcast of a
    * flood batch's key set (or a touched-doc key set that scales with
    * touched TEXT, not batch size) would OOM the driver. The join
    * RESULT is identical either way. */
  private[graft] def guardedBroadcast(spark: SparkSession,
                                      keys: DataFrame): DataFrame = {
    val maxBytes = spark.conf
      .getOption("spark.graft.keys.broadcastMaxBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val est = keys.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) broadcast(keys) else keys
  }

  /** Delete `kind/epoch=N` directories with N below `snap`. Readers
    * never resolve below the latest snapshot, so this is safe to
    * (re-)run any time — compaction uses it both as its prune step and
    * as the recovery sweep for an interrupted prune. */
  def pruneEpochDirsBelow(fs: FileSystem, root: String, kind: String,
                          snap: Long): Unit = {
    val dir = new Path(s"$root/$kind")
    if (fs.exists(dir)) fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("epoch="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("epoch=").toLong).toOption
        .map(v => (v, st.getPath)))
      .filter(_._1 < snap)
      .foreach { case (_, p) => boundary(p.toString); fs.delete(p, true) }
  }

  /** Delete numeric marker files below `snap` in a marker directory. */
  def pruneMarkersBelow(fs: FileSystem, dir: Path, snap: Long): Unit =
    if (fs.exists(dir)) fs.listStatus(dir)
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption
        .map(v => (v, st.getPath)))
      .filter(_._1 < snap)
      .foreach { case (_, p) => boundary(p.toString); fs.delete(p, true) }
}
