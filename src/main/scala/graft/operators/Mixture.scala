package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Epoch assembly for multi-source training mixes: explicit-weight
  * mixture planning WITH UPSAMPLING, and deterministic global shuffle
  * order. Complements [[QualityModels.sourceMixtureSample]] (q63),
  * which derives temperature weights and can only DOWNSAMPLE (a
  * keep-test cannot emit copies > 1) — here the weights are the
  * caller's contract (the mixing-law numbers a lab actually trains
  * with) and a small high-value source repeats as many times as its
  * share demands.
  *
  * Everything is exact integer arithmetic on md5-derived keys (the
  * repo-wide q63/q82 keyed-draw discipline): deterministic,
  * append-stable, partition-invariant, engine-replayable. */
object Mixture {

  /** Per-document copy counts for one training epoch: source `s` gets
    * `target_s = budget * ppm_s / 1e6` tokens; every doc of `s` repeats
    * `target_s div T_s` times (T_s = source token total), and the docs
    * in the md5-order prefix covering the remainder `target_s mod T_s`
    * get one extra copy (greedy cover: the prefix takes docs while the
    * tokens BEFORE them are short of the remainder, overshooting by at
    * most one document). Sources without a weight are excluded; rows
    * with copies = 0 are dropped. Output: doc_id, source, n_tokens,
    * copies.
    *
    * Scale shape: the only order-dependent step is the per-source
    * running sum in md5 order, computed in the q46/q54 two-stage form —
    * in-bucket windows over `(source, key-range bucket)` plus a
    * bucket-offset window over the tiny per-bucket totals frame — so no
    * single task ever sorts a whole source (a source at 100 TB is
    * terabytes; a (source, bucket) cell is 1/4096 of it). */
  def epochPlan(docs: DataFrame, weightsPpm: Map[String, Long],
                tokenBudget: Long,
                counter: Column => Column = TextAnalysis.subtokenCount,
                buckets: Int = 4096): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    require(weightsPpm.nonEmpty, "need at least one source weight")
    require(weightsPpm.values.forall(w => w > 0 && w <= 1000000L),
      s"weights are ppm in (0, 1e6]: $weightsPpm")
    require(weightsPpm.values.sum <= 1000000L,
      s"weights sum past 1e6 ppm: ${weightsPpm.values.sum}")
    require(buckets > 0, s"buckets must be positive: $buckets")
    // the broadcast offsets frame is bounded by |sources| x buckets rows
    // (3 longs each); `buckets` only trades window-partition size
    // against that bound — the OUTPUT is bucket-invariant (offsets are
    // exact regardless of how the prefix sum is staged), so lower it
    // freely for thousand-source mixes
    val spark = docs.sparkSession
    import spark.implicits._
    val targets = broadcast(weightsPpm.toSeq.map { case (s, ppm) =>
      (s, tokenBudget * ppm / 1000000L)
    }.toDF("source", "_target"))
    val cellW = math.max(1L, (1L << 56) / buckets)
    // the _key/_b/_n temps cannot collide with caller columns: this
    // select narrows to exactly (doc_id, source, _n) first
    val d = docs
      .select(col("doc_id"), col("source"), counter(col("text")).as("_n"))
      .where(col("_n") > 0)
      .join(targets, "source") // inner join: unweighted sources drop here
      .withColumn("_key", Dedup.md5Long(
        concat(col("doc_id").cast("string"), lit(":epoch"))))
      .withColumn("_b", expr(s"_key div ${cellW}L"))
    // two-stage running sum of tokens BEFORE each doc in (md5, id) order
    val wIn = Window.partitionBy("source", "_b").orderBy("_key", "doc_id")
    val inBucket = d.withColumn("_cumb",
      coalesce(sum("_n").over(
        wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val bTotals = d.groupBy("source", "_b").agg(sum("_n").as("_bt"))
    val wOff = Window.partitionBy("source").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bTotals
      .withColumn("_off", coalesce(sum("_bt").over(wOff), lit(0L)))
      .drop("_bt")
    val tot = d.groupBy("source").agg(sum("_n").as("_tot"))
    inBucket
      .join(broadcast(offsets), Seq("source", "_b"))
      .join(broadcast(tot), "source")
      .withColumn("_before", col("_off") + col("_cumb"))
      .withColumn("copies",
        expr("_target div _tot") +
          when(col("_before") < expr("_target % _tot"), 1L).otherwise(0L))
      .where(col("copies") >= 1)
      .select(col("doc_id"), col("source"), col("_n").as("n_tokens"),
        col("copies"))
  }

  /** Deterministic global shuffle order: dense positions 1..N by the
    * md5 key of `idCol` (salted) — the "shuffle 100 TB of training
    * sequences" step, where `orderBy(rand())` is neither reproducible
    * nor resumable. Rides [[SuffixArray.globalDenseRank]] (range
    * partition + per-partition pass + offsets — no single-task global
    * window); (key, id) is unique, so the dense rank IS a permutation.
    * Same salt + same corpus = same order on any engine or partitioning;
    * change the salt to draw a fresh epoch permutation.
    *
    * Pass only the columns you need: the ranking pass is a
    * `mapPartitions`, which BLOCKS column pruning — every column of
    * `df` rides the range-partition shuffle. Rank the (id) projection
    * and join positions back if the payload is wide. */
  def shuffledOrder(df: DataFrame, idCol: String, salt: String = "shuf",
                    out: String = "pos"): DataFrame = {
    // mirror globalDenseRank's _pid/_lrk guard: withColumn would silently
    // overwrite a caller's _key and the final drop would lose it
    require(!df.columns.contains("_key"),
      "shuffledOrder: input must not contain a _key column")
    SuffixArray.globalDenseRank(
      df.withColumn("_key", Dedup.md5Long(
        concat(col(idCol).cast("string"), lit(":" + salt)))),
      Seq("_key", idCol), out)
      .drop("_key")
  }

  /** Contiguous-range epoch shard assignment over the deterministic
    * global shuffle order: all `df` columns + `pos` (1..N, the
    * [[shuffledOrder]] permutation), `shard` (0..shards-1 — shard s
    * holds the positions p-1 ∈ [⌈sN/S⌉, ⌈(s+1)N/S⌉), so sizes differ by
    * at most one) and `pos_in_shard` (0-based within the shard) — the
    * exact-integer split a dataloader mounts one rank per shard.
    * Pure function of (corpus, salt, shards): engine-replayable
    * (q112's oracle), append of new ids changes only ranks ≥ theirs.
    * Overflow bound: (N-1)·shards must fit a long — fine for any real
    * (corpus, shard-count) pair; guarded. Same pruning caveat as
    * [[shuffledOrder]]: rank an (id) projection and join back if the
    * payload is wide. */
  def epochShardAssignment(df: DataFrame, idCol: String, shards: Int,
                           salt: String = "shuf"): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val n = df.count()
    require(n > 0, "epochShardAssignment: empty input")
    require(shards.toLong <= Long.MaxValue / math.max(1L, n),
      s"(n=$n) * (shards=$shards) overflows the shard arithmetic")
    shuffledOrder(df, idCol, salt)
      .withColumn("shard", expr(s"((pos - 1) * $shards) div ${n}L"))
      .withColumn("pos_in_shard",
        expr(s"(pos - 1) - ((shard * ${n}L + ${shards - 1}) div $shards)"))
  }

  /** Materialize one training epoch as `shards` deterministic shard
    * directories under `outDir` (`shard=s/` parquet, rows sorted by the
    * global shuffle position) and return the per-shard AUDIT MANIFEST:
    * (shard, n_docs, min_pos, max_pos, id_checksum, order_checksum) —
    * id_checksum the order-invariant membership sum (the
    * [[Pipeline.datasetManifest]] discipline), order_checksum binding
    * each id to its exact position (sum of md5(pos ‖ ":" ‖ id) keys mod
    * 2^56), so ANY membership or ordering drift between two epoch
    * builds changes a checksum. Re-running over the same corpus + salt
    * reproduces identical manifests (spec-gated).
    *
    * Scale shape: the ranking pass is the [[shuffledOrder]] range
    * partition; the write repartitions by shard (one hash exchange) and
    * sorts within partitions, so each shard directory's row order is
    * the global order restricted to the shard; the manifest is one
    * hash aggregation of (shard, pos, id) longs — text never shuffles
    * twice. */
  def writeEpochShards(df: DataFrame, outDir: String, shards: Int,
                       idCol: String = "doc_id",
                       salt: String = "shuf"): DataFrame = {
    val assigned = epochShardAssignment(df, idCol, shards, salt)
    assigned
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    shardManifest(assigned, idCol)
  }

  /** The per-shard audit manifest of an assigned epoch frame — factored
    * so [[writeEpochShards]] (derives it from what it wrote) and
    * [[readEpochShards]] (re-derives it from what it READ) share the
    * exact aggregation, making drift detection a value comparison. */
  private def shardManifest(assigned: DataFrame, idCol: String)
      : DataFrame = {
    val mod = lit(72057594037927936L) // 2^56
    def ck(c: Column): Column =
      pmod(sum(c.cast("decimal(38,0)")) % mod.cast("decimal(38,0)"),
        mod.cast("decimal(38,0)")).cast("long")
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      min("pos").as("min_pos"), max("pos").as("max_pos"),
      ck(Dedup.md5Long(col(idCol).cast("string"))).as("id_checksum"),
      ck(Dedup.md5Long(concat(col("pos").cast("string"), lit(":"),
        col(idCol).cast("string")))).as("order_checksum"))
  }

  /** Read an epoch materialized by [[writeEpochShards]] back and VERIFY
    * it against its audit manifest BEFORE serving — the round-trip the
    * publish manifest closes for corpora, closed for the dataloader
    * artifact: per shard, the stored rows' recomputed (n_docs, min_pos,
    * max_pos, id_checksum, order_checksum) must equal the manifest's;
    * any membership drift, ordering drift (the order checksum binds
    * each id to its exact global position), missing shard, or stray
    * shard fails LOUDLY with the offending shard ids. Returns the full
    * epoch frame (payload + pos/shard/pos_in_shard); the global
    * training order is `orderBy(pos)` and a rank's slice is
    * `where(shard === r)` ordered by pos_in_shard — both spec-gated
    * equal to the assignment [[writeEpochShards]] derived from.
    * Verification is ONE aggregation over the shard directories (the
    * manifest side is shards-sized); the data itself is not re-sorted
    * or re-shuffled. */
  def readEpochShards(spark: org.apache.spark.sql.SparkSession,
                      dir: String, manifest: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val rows = spark.read.parquet(dir)
    val got = shardManifest(rows, idCol)
    val cols = Seq("n_docs", "min_pos", "max_pos", "id_checksum",
      "order_checksum")
    val exp = manifest.select(col("shard") +:
      cols.map(c => col(c).as(s"_e_$c")): _*)
    val bad = got.join(exp, Seq("shard"), "full_outer")
      .where(cols.map(c => !(col(c) <=> col(s"_e_$c")))
        .reduce(_ || _))
      .select("shard").collect().map(_.get(0)).toSeq
    require(bad.isEmpty,
      s"readEpochShards: shard(s) ${bad.mkString(",")} at $dir drifted " +
        "from the audit manifest — membership or order differs from " +
        "what writeEpochShards committed")
    rows
  }
}
