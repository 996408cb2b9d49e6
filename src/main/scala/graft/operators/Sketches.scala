package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic distributed sketches. Spark's built-in approximations
  * (`approx_count_distinct` HLL++, `percentile_approx`) are
  * implementation-defined — no external engine can replay them, so they
  * can't pass a hash-compare gate and two engines profiling the same
  * corpus disagree. The sketches here trade a little efficiency for
  * DETERMINISM: md5-derived hashes and closed-form estimators, identical
  * in any engine that can md5 (the same portability discipline as the
  * engine's trainers).
  */
object Sketches {

  /** KMV (bottom-k / k-minimum-values) distinct-count estimate per group
    * — the classic mergeable distinct sketch (Bar-Yossef et al. 2002):
    * hash every value to a uniform 56-bit integer, keep each group's k
    * smallest DISTINCT hashes; with h_k the k-th smallest,
    * estimate = (k−1) · 2⁵⁶ / h_k (relative stderr ≈ 1/√(k−2)).
    * Groups with fewer than k distinct values report the EXACT count
    * (the sketch saw every value).
    *
    * Scale shape: the corpus shuffle is the (group, hash) distinct —
    * 16-byte rows with map-side partial dedup; the k-min selection is
    * the salted two-phase rank over ≤ distinct rows. Nothing else ever
    * moves, and the output is one row per group. At 100 TB this replaces
    * an exact COUNT(DISTINCT text) whose full-width shuffle is the cost
    * (the hash shuffle ships 16 B regardless of value width).
    *
    * Output: (group, n_kept, estimate) — estimate is exact-in-double
    * arithmetic on integers, so any engine replays it bit-for-bit. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashes = df.select(col(groupCol), Dedup.md5Long(value).as("hv"))
      .distinct()
    val kept = TopK.perKeySalted(hashes, groupCol, Seq(col("hv")), k)
    kept.groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max("hv").as("_hk"))
      .withColumn("estimate",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(72057594037927936.0) /
            col("_hk").cast("double")))
      .select(col(groupCol), col("n_kept"), col("estimate"))
  }

  /** HyperLogLog registers per group (Flajolet et al. 2007),
    * deterministic: every value hashes to the shared 56-bit md5 key; the
    * top `p` bits pick one of m = 2ᵖ registers, and each register keeps
    * the MAX of rank = (leading zeros of the remaining 56−p bits) + 1.
    * Unlike Spark's own `approx_count_distinct` (HLL++, implementation-
    * defined), these registers replay in any engine that can md5.
    *
    * Scale shape: ONE aggregation keyed by (group, bucket) with map-side
    * max combine — each partition collapses to ≤ m rows per group before
    * anything shuffles, and the output is bounded by m rows per group
    * regardless of corpus size. Merge across corpora/batches =
    * unionByName + the same max (the standard HLL merge, which the spec
    * asserts exactly). Output: (group, bucket, register), occupied
    * buckets only. */
  def hllRegisters(df: DataFrame, groupCol: String, value: Column,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val rem = 56 - p
    val hv = Dedup.md5Long(value)
    // rank via the binary-string bit length — identical in DuckDB
    // (bin() emits no leading zeros in either engine; low = 0 has no set
    // bit and takes the max rank rem+1)
    df.where(value.isNotNull)
      .select(col(groupCol), shiftright(hv, rem).as("bucket"),
        pmod(hv, lit(1L << rem)).as("_low"))
      .select(col(groupCol), col("bucket"),
        when(col("_low") === 0L, lit(rem + 1))
          .otherwise(lit(rem + 1) - length(bin(col("_low"))))
          .as("_rank"))
      .groupBy(groupCol, "bucket")
      .agg(max("_rank").as("register"))
  }

  /** Raw-estimator readout of [[hllRegisters]]: per group, the occupied-
    * register count, the EXACT integer indicator sum S = Σⱼ 2^(rem+1−Mⱼ)
    * (empty registers contribute 2^(rem+1); S < m·2^(rem+1) ≤ 2⁶⁵⁻ᵖ fits
    * a long), and estimate = α_m · m² · 2^(rem+1) / S. Every float op is
    * a product/quotient of exactly-representable values in BOTH engines,
    * so the estimate hashes identically — which is why this is the RAW
    * estimator only: the small-range correction needs ln(), whose last
    * ulp is libm-specific, and that regime (n ≲ 2.5·m) is [[kmvDistinct]]'s
    * domain anyway. `p` must match the build call. */
  def hllEstimate(registers: DataFrame, groupCol: String,
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val rem = 56 - p
    val scale = 1L << (rem + 1)
    registers.groupBy(groupCol)
      .agg(count(lit(1)).as("n_occupied"),
        sum(expr(s"shiftright(${scale}L, register)")).as("_s_occ"))
      .withColumn("s_scaled",
        col("_s_occ") + (lit(m.toLong) - col("n_occupied")) * lit(scale))
      .withColumn("estimate",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          lit((m.toLong * m).toDouble) * lit(scale.toDouble) /
          col("s_scaled").cast("double"))
      .select(col(groupCol), col("n_occupied"), col("s_scaled"),
        col("estimate"))
  }

  /** The shared md5/affine position family of [[countMin]] and
    * [[bloomBits]]: n positions of the 56-bit key `hv` modulo `modulus`.
    * Build and probe MUST stay bit-identical — this helper makes that
    * invariant structural instead of copy-pasted. */
  private def hashPositions(hv: Column, n: Int, modulus: Int): Seq[Column] =
    (0 until n).map(j =>
      pmod(lit(Dedup.hashA(j)) * hv + lit(Dedup.hashB(j)),
        lit(Dedup.P)) % modulus)

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
    * `width` buckets of EXACT long counts; the estimate for any value is
    * the minimum of its `depth` bucket counts — always ≥ the true count,
    * within εN of it with high probability (ε ≈ e/width). Chosen over
    * Spark's own `stat.countMinSketch` because this one is DETERMINISTIC
    * and engine-replayable: the value hashes through the same md5-based
    * 56-bit key and (a·h + b) mod P affine family the MinHash chain uses,
    * so a SQL oracle rebuilds the identical sketch (q76). The
    * conservative-update variant is deliberately absent — its counts
    * depend on arrival order, which no distributed/replayable contract
    * can honor.
    *
    * Scale shape: ONE aggregation keyed by (row, bucket) — map-side
    * partial combine collapses each partition to ≤ depth·width rows
    * before anything shuffles, and the output is bounded by depth·width
    * REGARDLESS of corpus size (the whole point of a sketch at 100 TB:
    * the frequency table of a trillion tokens travels as ≤ 4096 rows).
    * Merge across corpora = unionByName + the same groupBy-sum, exactly
    * counts' additivity. Output: (row, bucket, cnt), non-empty buckets
    * only. */
  def countMin(df: DataFrame, value: Column, depth: Int = 4,
               width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1 and width >= 2 (got $depth, $width)")
    // NULL values carry no occurrences (md5 of NULL is NULL, which
    // would otherwise poison a bucket key and break the >=-true-count
    // guarantee on the probe side) — dropped on BOTH build and probe
    df.where(value.isNotNull)
      .select(pmod(Dedup.md5Long(value), lit(Dedup.P)).as("_hv"))
      .select(posexplode(array(hashPositions(col("_hv"), depth,
        width): _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a [[countMin]] sketch: for each DISTINCT value of
    * `valueCol` in `items`, the minimum over the sketch's rows of that
    * value's bucket count (an absent bucket reads 0). The sketch is
    * broadcast — it is ≤ depth·width rows by construction — so probing
    * costs no shuffle beyond the final per-value min, and `items` can be
    * a corpus-scale frame. `depth`/`width` must match the build call.
    * Output: (valueCol, est_cnt). */
  def countMinEstimate(sketch: DataFrame, items: DataFrame,
                       valueCol: String, depth: Int = 4,
                       width: Int = 1024): DataFrame = {
    val probes = items.select(col(valueCol)).distinct()
      .where(col(valueCol).isNotNull) // the build never counted NULLs
      .withColumn("_hv", pmod(Dedup.md5Long(col(valueCol)), lit(Dedup.P)))
      .select(col(valueCol), posexplode(array(hashPositions(col("_hv"),
        depth, width): _*)).as(Seq("row", "bucket")))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Deterministic Bloom filter as a FRAME: the distinct bit positions
    * set by hashing every value through `k` functions of the same
    * md5/affine family as [[countMin]] (position_j = ((a_j·h + b_j)
    * mod P) mod mBits). Unlike `DataFrameStatFunctions.bloomFilter`
    * (implementation-defined seeds, opaque bytes), this filter is
    * engine-replayable: any engine that can md5 builds the IDENTICAL
    * bit set, so membership answers — including the false positives —
    * hash-compare across engines (q78).
    *
    * Scale shape: one exploded scan + a distinct bounded by mBits rows;
    * merge across corpora = union + distinct (bitwise OR). Output:
    * single column (bit: long), sorted nothing — a set. */
  def bloomBits(df: DataFrame, value: Column, mBits: Int,
                k: Int = 4): DataFrame = {
    require(mBits >= 2 && k >= 1, s"need mBits >= 2, k >= 1 (got $mBits, $k)")
    // NULLs never enter the filter (see countMin) — dropped both sides
    df.where(value.isNotNull)
      .select(pmod(Dedup.md5Long(value), lit(Dedup.P)).as("_hv"))
      .select(explode(array(hashPositions(col("_hv"), k, mBits): _*))
        .as("bit"))
      .distinct()
  }

  /** Probe a [[bloomBits]] filter: for each DISTINCT value of `valueCol`
    * in `items`, true iff ALL k bit positions are set (the Bloom
    * contract: no false negatives; false positives at the classic
    * (1−e^{−kn/m})^k rate, and DETERMINISTIC — the same values
    * false-positive in every engine). The filter is broadcast (≤ mBits
    * rows by construction); `mBits`/`k` must match the build call.
    * Output: (valueCol, might_contain). */
  def bloomMightContain(bloom: DataFrame, items: DataFrame,
                        valueCol: String, mBits: Int,
                        k: Int = 4): DataFrame = {
    val probes = items.select(col(valueCol)).distinct()
      .where(col(valueCol).isNotNull) // NULL was never inserted
      .withColumn("_hv", pmod(Dedup.md5Long(col(valueCol)), lit(Dedup.P)))
      .select(col(valueCol), explode(array(hashPositions(col("_hv"), k,
        mBits): _*)).as("bit"))
    probes.join(broadcast(bloom.select(col("bit"), lit(1).as("_set"))),
        Seq("bit"), "left")
      .groupBy(valueCol)
      .agg((count(col("_set")) === lit(k.toLong)).as("might_contain"))
  }

  /** Fixed-boundary histogram per group: `nBuckets` equal-width buckets
    * over [lo, hi), EXACT long counts, out-of-range values clamped into
    * the edge buckets. The deterministic replacement for a t-digest /
    * `percentile_approx` profile: boundaries are closed-form, counts are
    * exact, so any engine replays it bit-for-bit.
    *
    * Scale shape: ONE aggregation keyed by (group, bucket) — map-side
    * partial combine collapses each partition to ≤ nGroups·nBuckets rows
    * before anything shuffles; the output is bounded by the same product
    * regardless of corpus size. Output: (group, bucket, lo_edge, hi_edge,
    * cnt), only non-empty buckets. */
  def histogram(df: DataFrame, groupCol: String, value: Column,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo,
      s"need nBuckets > 0 and hi > lo (got $nBuckets, [$lo, $hi))")
    // identical expression ORDER to the oracle replay: (v-lo)/(hi-lo)*nB
    val b = least(lit(nBuckets - 1), greatest(lit(0),
        floor((value.cast("double") - lit(lo)) / lit(hi - lo)
          * lit(nBuckets.toDouble))))
      .cast("int")
    df.select(col(groupCol), b.as("bucket"))
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("lo_edge", lit(lo) + lit(hi - lo) * col("bucket")
        / lit(nBuckets.toDouble))
      .withColumn("hi_edge", lit(lo) + lit(hi - lo) * (col("bucket") + 1)
        / lit(nBuckets.toDouble))
      .select(col(groupCol), col("bucket"), col("lo_edge"), col("hi_edge"),
        col("cnt"))
  }

  /** Quantiles read off a [[histogram]]: for each requested quantile q,
    * the first bucket whose cumulative count reaches ceil(q · total),
    * reported as that bucket's UPPER edge (the conservative "q of values
    * are ≤ this" bound; error ≤ one bucket width by construction).
    *
    * Determinism recipe: q rides as a 1e-6-quantized long and the rank
    * target is computed in INTEGER arithmetic — (q_q·total + 999999)
    * div 1e6 — so no engine's double rounding can shift a target across
    * a count boundary. Everything after the histogram's one aggregation
    * runs on ≤ nGroups·nBuckets rows (the window and quantile probe are
    * driver-scale, not corpus-scale). Output: (group, q, bucket,
    * value_le, cum, total). */
  def histogramQuantiles(df: DataFrame, groupCol: String, value: Column,
                         lo: Double, hi: Double, nBuckets: Int,
                         qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val h = histogram(df, groupCol, value, lo, hi, nBuckets)
    val cum = h
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(groupCol).orderBy("bucket")))
      .withColumn("total", sum("cnt").over(Window.partitionBy(groupCol)))
    val qdf = qs.map(q => math.floor(q * 1e6 + 0.5).toLong).toDF("q_q")
    cum.crossJoin(broadcast(qdf))
      .where(col("cum") >= expr("(q_q * total + 999999L) div 1000000L"))
      .groupBy(col(groupCol), col("q_q"))
      .agg(min("bucket").as("bucket"), first("total").as("total"))
      .withColumn("q", col("q_q").cast("double") / lit(1000000.0))
      .withColumn("value_le", lit(lo) + lit(hi - lo) * (col("bucket") + 1)
        / lit(nBuckets.toDouble))
      .join(cum.select(col(groupCol), col("bucket"), col("cum")),
        Seq(groupCol, "bucket"))
      .select(col(groupCol), col("q"), col("bucket"), col("value_le"),
        col("cum"), col("total"))
  }
}
