package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Distributed suffix-array construction over the tokenized corpus —
  * the EXACT substring-dedup machinery of Lee et al. 2022 ("Deduplicating
  * Training Data Makes Language Models Better"), whose single-node tool
  * builds a suffix array of the whole corpus; here the classic
  * prefix-doubling construction (Manber & Myers 1990) is re-expressed
  * set-wise so every step is a corpus-sized DataFrame shuffle instead of
  * an in-memory sort:
  *
  *  - suffixes are (doc_id, pos) rows; level-k rank r_k is a dense rank
  *    over the pair (r_{k-1}[pos], r_{k-1}[pos+2^(k-1)]) — after
  *    ceil(log2(maxDocLen)) levels two suffixes share a rank iff they are
  *    identical token sequences (doc boundaries never merge: a suffix
  *    ends at its document's end, the classic distinct-separator
  *    concatenation without materializing one giant array);
  *  - the global dense rank is NOT a single-partition window (the
  *    classic driver-melting trap): [[globalDenseRank]] range-partitions
  *    by the key, dense-ranks each partition in one sequential pass, and
  *    shifts by per-partition offsets — every step distributes;
  *  - per-suffix longest-repeat = max LCP with its two neighbors in
  *    suffix order (the standard sorted-order lemma, valid for ANY total
  *    order on tokens), and the LCP of two suffixes is computed by the
  *    rank-pyramid walk: descend k = K-1..0 adding 2^k whenever the
  *    level-k ranks at the advanced positions agree — O(log maxLen)
  *    set-wise join rounds for ALL adjacent pairs at once, never a
  *    per-pair loop.
  *
  * Cost shape at 100 TB: O(N log L) total work and O(log L) shuffle
  * rounds of the token frame (N tokens, L = max doc length) — the known
  * price of distributed suffix sorting (Flick & Aluru, SC'15). The
  * rolling-hash spans in [[TextAnalysis.spanDedupStats]] remain the
  * cheap one-pass screen (exact for >= window repeats at step 1, q81);
  * this operator gives the exact LENGTH of the longest repeat at ANY
  * size, the quantity Lee et al. threshold on.
  *
  * The reference engine has no substring machinery (its dedup surface is
  * vector-level; see reference storage_engine.py) — this is part of the
  * training-data-pipeline tier built on the same corpus tables.
  */
object SuffixArray {

  /** Scalable global dense rank by `keys`: range-partition + one
    * sequential per-partition pass + per-partition offsets, instead of a
    * single-partition global window. Equal keys land in one range
    * partition (RangePartitioner assigns by key comparison only), so the
    * local pass sees every tie group whole and rank values are a pure
    * function of the data — partition boundaries only move the offsets.
    *
    * The ranked frame is lazily persisted and the offsets pass doubles
    * as its materializer (one job per rank, not two); the PREVIOUS
    * level's persisted frame is released via `drop` once this one is
    * live. The returned frame rides a broadcast join of the
    * (<= #partitions)-row offset table — no extra shuffle, output stays
    * range-sorted. */
  def globalDenseRank(df: DataFrame, keys: Seq[String],
                      out: String): DataFrame =
    globalDenseRankCk(df, keys, out, None)._1

  /** [[globalDenseRank]] returning (result, internal checkpoint handle);
    * `drop` is the PREVIOUS level's handle, released once this level's
    * checkpoint has materialized. */
  private def globalDenseRankCk(df: DataFrame, keys: Seq[String],
                                out: String, drop: Option[DataFrame])
      : (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    require(!df.columns.contains("_pid") && !df.columns.contains("_lrk"),
      "globalDenseRank: input must not contain _pid/_lrk")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val schema2 = sorted.schema.add("_pid", IntegerType).add("_lrk", LongType)
    val keyIdx = keys.map(sorted.schema.fieldIndex)
    val ranked = sorted.mapPartitions { it =>
      // per-partition sequential dense rank: the one genuinely
      // imperative step (each row compares to its predecessor in the
      // partition's sort order)
      val pid = TaskContext.getPartitionId()
      var rank = 0L
      var prev: Seq[Any] = null
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (prev == null || k != prev) { rank += 1L; prev = k }
        Row.fromSeq(r.toSeq :+ pid :+ rank)
      }
    }(Encoders.row(schema2)).transform(Ckpt.eager)
    // eager checkpoint: truncates lineage every level — a lazy persist
    // here lets any cache miss cascade a recompute through EVERY prior
    // level (measured exponential; see round-9 notes)
    drop.foreach(_.unpersist(false))
    val maxes = ranked.groupBy("_pid").agg(max("_lrk").as("_mx"))
      .collect().sortBy(_.getInt(0))
    var acc = 0L
    val offs = maxes.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq
    import spark.implicits._
    val offDf = broadcast(offs.toDF("_pid", "_off"))
    val res = ranked.join(offDf, "_pid")
      .withColumn(out, col("_lrk") + col("_off"))
      .drop("_pid", "_lrk", "_off")
    (res, ranked, acc)
  }

  /** Doubling-level dense rank over the INTEGER pair (rCol, nxCol) where
    * rCol is the previous level's rank in [1, maxRank]: partitions by
    * the closed-form bucket (r-1)*P/maxRank — NO range-partitioner
    * sampling pass, so each level is ONE job over the corpus instead of
    * sampling + shuffle (at 100 TB that removes a full extra scan per
    * doubling level). Equal r values share a bucket, so tie groups stay
    * whole (the same guarantee range partitioning gives; the same
    * caveat too — one giant tie group is one partition's work).
    * Per-bucket distinct counts ride an accumulator out of the
    * checkpoint job; bucket offsets then come for free on the driver.
    * Returns (result, checkpoint handle, total distinct). */
  private def rankIntPairs(df: DataFrame, rCol: String, nxCol: String,
                           out: String, maxRank: Long,
                           drop: Option[DataFrame])
      : (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(maxRank >= 1, s"maxRank must be >= 1, got $maxRank")
    // double-precision bucket: exact enough for uniformity, immune to
    // the (r-1)*parts long overflow when maxRank is a hash-space bound
    val withPart = df.withColumn("_part",
      least(greatest(floor((col(rCol) - 1).cast("double") * parts /
        maxRank.toDouble).cast("int"), lit(0)), lit(parts - 1)))
    val shuffled = withPart.repartition(parts, col("_part"))
      .sortWithinPartitions(col("_part"), col(rCol), col(nxCol))
    val schema2 = shuffled.schema.add("_lrk", LongType)
    val pIdx = shuffled.schema.fieldIndex("_part")
    val rIdx = shuffled.schema.fieldIndex(rCol)
    val nIdx = shuffled.schema.fieldIndex(nxCol)
    val segCounts = spark.sparkContext
      .collectionAccumulator[(Int, Long)](s"graft.sfx.$out")
    val ranked = shuffled.mapPartitions { it =>
      // one sequential pass: local dense rank per _part segment
      // (segments are contiguous after the sort; a bucket never splits
      // across partitions), flushing each segment's distinct count into
      // the accumulator — retried tasks only count once per Spark's
      // action-accumulator guarantee, and duplicates would carry
      // identical values anyway (deduped by key on the driver)
      var curPart = Int.MinValue
      var rank = 0L
      var pr = Long.MinValue
      var pn = Long.MinValue
      var dirty = false
      val base = it.map { r =>
        val p = r.getInt(pIdx)
        val rv = r.getLong(rIdx)
        val nv = r.getLong(nIdx)
        if (p != curPart) {
          if (dirty) segCounts.add((curPart, rank))
          curPart = p; rank = 0L; pr = Long.MinValue; pn = Long.MinValue
          dirty = true
        }
        if (rv != pr || nv != pn) { rank += 1L; pr = rv; pn = nv }
        Row.fromSeq(r.toSeq :+ rank)
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = base.hasNext
          if (!h && dirty) { segCounts.add((curPart, rank)); dirty = false }
          h
        }
        def next(): Row = base.next()
      }
    }(Encoders.row(schema2)).transform(Ckpt.eager)
    drop.foreach(_.unpersist(false))
    import scala.jdk.CollectionConverters._
    val segs = segCounts.value.asScala.toMap // dedup by bucket
    val sortedSegs = segs.toSeq.sortBy(_._1)
    var acc = 0L
    val offs = sortedSegs.map { case (p, n) =>
      val o = (p, acc); acc += n; o
    }
    import spark.implicits._
    val offDf = broadcast(offs.toDF("_part", "_off"))
    val res = ranked.join(offDf, "_part")
      .withColumn(out, col("_lrk") + col("_off"))
      .drop("_part", "_lrk", "_off")
    (res, ranked, acc)
  }

  /** Distributed prefix carry — for every row, max(`valCol`) over rows
    * with `ordCol` <= this row's (nulls in valCol carry through): the
    * classic segmented-scan, NOT a global window. `ordCol` must be an
    * integer in [1, maxOrd]; rows bucket by the closed-form range
    * formula, one sequential pass carries within each bucket segment,
    * and the cross-bucket prefix maxima (<= #partitions values, via
    * accumulator) broadcast back as bucket baselines. One job. */
  def prefixCarryMax(df: DataFrame, ordCol: String, valCol: String,
                     maxOrd: Long, out: String): DataFrame = {
    val spark = df.sparkSession
    require(maxOrd >= 1, s"maxOrd must be >= 1, got $maxOrd")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withPart = df.withColumn("_part",
      least(greatest(floor((col(ordCol) - 1).cast("double") * parts /
        maxOrd.toDouble).cast("int"), lit(0)), lit(parts - 1)))
    val shuffled = withPart.repartition(parts, col("_part"))
      .sortWithinPartitions(col("_part"), col(ordCol))
    val schema2 = shuffled.schema.add("_carry", LongType)
    val pIdx = shuffled.schema.fieldIndex("_part")
    val vIdx = shuffled.schema.fieldIndex(valCol)
    val bucketMax = spark.sparkContext
      .collectionAccumulator[(Int, Long)](s"graft.carry.$out")
    val carried = shuffled.mapPartitions { it =>
      var curPart = Int.MinValue
      var run = Long.MinValue
      var dirty = false
      val base = it.map { r =>
        val p = r.getInt(pIdx)
        if (p != curPart) {
          if (dirty && run != Long.MinValue) bucketMax.add((curPart, run))
          curPart = p; run = Long.MinValue; dirty = true
        }
        if (!r.isNullAt(vIdx)) run = math.max(run, r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ (if (run == Long.MinValue) null else run))
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = base.hasNext
          if (!h && dirty) {
            if (run != Long.MinValue) bucketMax.add((curPart, run))
            dirty = false
          }
          h
        }
        def next(): Row = base.next()
      }
    }(Encoders.row(schema2)).transform(Ckpt.eager)
    import scala.jdk.CollectionConverters._
    val maxes = bucketMax.value.asScala.toMap
    // baseline for bucket b = max over buckets < b
    val baselines = (0 until parts).scanLeft(Long.MinValue) { (acc, b) =>
      math.max(acc, maxes.getOrElse(b, Long.MinValue))
    }
    import spark.implicits._
    val blDf = broadcast((0 until parts)
      .map(b => (b, baselines(b)))
      .filter(_._2 != Long.MinValue).toDF("_part", "_bl"))
    carried.join(blDf, Seq("_part"), "left")
      .withColumn(out, greatest(coalesce(col("_carry"), lit(Long.MinValue)),
        coalesce(col("_bl"), lit(Long.MinValue))))
      .withColumn(out, when(col(out) === Long.MinValue, lit(null))
        .otherwise(col(out)))
      .drop("_part", "_carry", "_bl")
  }

  /** Tokenized suffix frame with ALL doubling-level ranks:
    * (doc_id, pos, len_rem, r0, r1, .., r`levels`) — r0 ranks single
    * tokens, r_k ranks 2^k-token prefixes (clipped at doc end; two
    * suffixes share r_k iff their first min(2^k, len) tokens agree AND
    * the shorter is not a strict prefix of the longer — i.e. standard
    * doubling with a 0 sentinel past doc end). With 2^levels >= the max
    * document token count, r_levels groups exactly the identical
    * suffixes. Returned frame is eagerly checkpointed; docs with
    * whitespace-only text contribute no suffixes. */
  def suffixRanks(docs: DataFrame, levels: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  verifyTermHashes: Boolean = false): DataFrame = {
    require(levels >= 1 && levels <= 24, s"levels out of range: $levels")
    val toks = docs
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("_tk"))
      .select(col("doc_id"), size(col("_tk")).cast("long").as("_n"),
        posexplode(col("_tk")).as(Seq("_p", "_term")))
      .select(col("doc_id"), col("_p").cast("long").as("pos"),
        (col("_n") - col("_p")).as("len_rem"), col("_term"))
    // level 0 needs no ranking pass at all: the output is invariant to
    // the token base order (a suffix's max-LCP is intrinsic — see the
    // object doc), so the 56-bit term hash IS a valid r0 — equality-
    // preserving and totally ordered. Honest collision accounting: the
    // PAIRWISE odds are ~2^-57, but the aggregate birthday bound over V
    // distinct terms is ~V^2/2^57 — negligible at fixture scale, yet at
    // ~10^8-10^9 distinct terms (a 100 TB corpus) a collision becomes
    // EXPECTED, silently merging two tokens and breaking the exactness
    // guarantee. `verifyTermHashes` buys certainty for one extra
    // aggregation over the token frame: count(distinct term) must equal
    // count(distinct hash) or the build fails loudly (the remedy is a
    // true dense rank over terms via [[globalDenseRank]]).
    if (verifyTermHashes) {
      val r = toks.select(Dedup.md5Long(col("_term")).as("_h"),
          col("_term"))
        .agg(countDistinct(col("_term")).as("_t"),
          countDistinct(col("_h")).as("_hd")).collect().head
      require(r.getLong(0) == r.getLong(1),
        s"term-hash collision: ${r.getLong(0)} distinct terms map to " +
          s"${r.getLong(1)} distinct 56-bit hashes — rerun with a true " +
          "dense rank over terms (globalDenseRank) instead of r0 hashing")
    }
    var cur = toks.withColumn("r0", Dedup.md5Long(col("_term")) + 1)
      .drop("_term")
    var prevCk: Option[DataFrame] = None
    var maxRank = 1L << 56
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    for (k <- 1 to levels) {
      val d = 1 << (k - 1)
      val paired = cur.withColumn("_nx",
        coalesce(lead(col(s"r${k - 1}"), d).over(byPos), lit(0L)))
      val (rk, ck, n) = rankIntPairs(paired, s"r${k - 1}", "_nx",
        s"r$k", maxRank, prevCk)
      cur = rk.drop("_nx")
      prevCk = Some(ck)
      maxRank = n
    }
    val out = cur.transform(Ckpt.eager)
    prevCk.foreach(_.unpersist(false))
    out
  }

  /** Rank-pyramid LCP walk: `pairs` carries
    * (da, pa, la, db, pb, lb, + any passthrough columns); descends
    * k = lv-1..0 adding 2^k whenever the level-k ranks at the advanced
    * positions agree (left-join miss past doc end = mismatch), then
    * caps by both suffix lengths. Returns `pairs` + `lcp`. */
  private def walkLcp(wide: DataFrame, pairs: DataFrame,
                      lv: Int): DataFrame = {
    var p = pairs.withColumn("acc", lit(0L))
    for (k <- (lv - 1) to 0 by -1) {
      val d = 1L << k
      val ra = wide.select(col("doc_id").as("_dA"), col("pos").as("_pA"),
        col(s"r$k").as("_ra"))
      val rb = wide.select(col("doc_id").as("_dB"), col("pos").as("_pB"),
        col(s"r$k").as("_rb"))
      p = p
        .join(ra, col("_dA") === col("da") &&
          col("_pA") === col("pa") + col("acc"), "left")
        .join(rb, col("_dB") === col("db") &&
          col("_pB") === col("pb") + col("acc"), "left")
        .withColumn("acc", col("acc") +
          when(col("_ra").isNotNull && col("_ra") === col("_rb"), d)
            .otherwise(lit(0L)))
        .drop("_dA", "_pA", "_ra", "_dB", "_pB", "_rb")
    }
    p.withColumn("lcp", least(col("acc"), col("la"), col("lb")))
      .drop("acc")
  }

  /** Per-document longest corpus-repeated token span, EXACT at any
    * length: (doc_id, lrs_len, lrs_pos) where lrs_len is the largest m
    * such that the m tokens starting at lrs_pos also occur somewhere
    * else in the corpus (any doc, overlapping self-occurrences included
    * — Lee et al.'s substring-repeat semantics) and lrs_pos is the
    * smallest such start. Docs with no repeated token at all (or no
    * tokens) report (0, 0). */
  def longestRepeatedSpans(docs: DataFrame, levels: Int = 0,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    substringDedupStats(docs, 16, levels, idCol, textCol)
      .select("doc_id", "lrs_len", "lrs_pos")

  /** The full exact-substring-dedup accounting (Lee et al. 2022
    * ExactSubstr, per doc): [[longestRepeatedSpans]]'s (lrs_len,
    * lrs_pos) plus `n_tokens`, `n_covered` (positions lying inside SOME
    * >= `minLen`-token span that occurs at least twice in the corpus)
    * and `covered_frac` — the exact-length refinement of the
    * rolling-hash screens ([[TextAnalysis.spanDedupStats]] q57/q81):
    * those flag aligned fixed windows, this measures true coverage at
    * any alignment and length. Coverage is one per-doc running-max
    * window over the per-suffix LCPs (a position t is covered iff some
    * start s <= t has lcp(s) reaching past t).
    *
    * `levels` must satisfy 2^levels >= max tokens per doc (validated;
    * pass 0 to size it automatically from the corpus). */
  def substringDedupStats(docs: DataFrame, minLen: Int = 16,
                          levels: Int = 0,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val lv = if (levels > 0) levels
    else {
      // auto mode pays one corpus scan to size the doubling depth
      val row = docs.where(length(trim(col(textCol))) > 0)
        .select(max(size(TextAnalysis.tokens(col(textCol)))).as("_m"))
        .collect()
      val maxLen =
        if (row.isEmpty || row.head.isNullAt(0)) 0 else row.head.getInt(0)
      if (maxLen == 0)
        return ids.withColumn("lrs_len", lit(0L))
          .withColumn("lrs_pos", lit(0L))
          .withColumn("n_tokens", lit(0L))
          .withColumn("n_covered", lit(0L))
          .withColumn("covered_frac", lit(0.0))
          .orderBy("doc_id")
      math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1, maxLen - 1)))
    }
    val wide = suffixRanks(docs, lv, idCol, textCol)
    // pinned mode validates against the already-checkpointed rank table
    // (one tiny job) instead of a separate tokenize pass over the corpus
    if (levels > 0) {
      val m = wide.select(max("len_rem")).collect()
      val maxLen = if (m.isEmpty || m.head.isNullAt(0)) 0L
        else m.head.getLong(0)
      require((1L << lv) >= maxLen,
        s"levels=$lv cannot separate suffixes of length $maxLen")
    }
    val gCol = s"r$lv"

    // identical-suffix groups: any member of a group of size >= 2 has its
    // WHOLE remaining text repeated (lcp = len_rem, the cap). One
    // representative per group carries the cross-group LCP walk — all
    // members are identical, so LCP(rep_g, rep_{g+1}) is the group value.
    val cnts = wide.groupBy(col(gCol).as("g")).agg(count(lit(1)).as("cnt"))
    val reps = wide
      .withColumn("_rn", row_number().over(
        Window.partitionBy(gCol).orderBy("doc_id", "pos")))
      .where(col("_rn") === 1)
      .select(col(gCol).as("g"), col("doc_id"), col("pos"), col("len_rem"))

    // rank-pyramid LCP walk for ALL adjacent group pairs at once:
    // descend k, add 2^k when the level-k ranks at the advanced
    // positions agree (position past doc end: left-join miss = mismatch)
    // one lazy 2·levels-join plan: every join's build side is the
    // checkpointed rank table (short lineage), so no per-step
    // materialization is needed — the walk is a single job at action time
    val pairs0 = reps.select(col("g"), col("doc_id").as("da"),
        col("pos").as("pa"), col("len_rem").as("la"))
      .join(reps.select((col("g") - 1).as("g"), col("doc_id").as("db"),
        col("pos").as("pb"), col("len_rem").as("lb")), Seq("g"))
    val lcpn = walkLcp(wide, pairs0, lv).select("g", "lcp")

    // per-suffix longest repeat = max(within-group full length, LCP with
    // the next group, LCP with the previous group); per-doc max + least
    // achieving start
    val sfx = wide.select(col("doc_id"), col("pos"), col("len_rem"),
        col(gCol).as("g"))
      .join(cnts, Seq("g"))
      .join(lcpn.select(col("g"), col("lcp").as("_nx")), Seq("g"), "left")
      .join(lcpn.select((col("g") + 1).as("g"), col("lcp").as("_pv")),
        Seq("g"), "left")
      .select(col("doc_id"), col("pos"),
        greatest(when(col("cnt") > 1, col("len_rem")).otherwise(lit(0L)),
          coalesce(col("_nx"), lit(0L)),
          coalesce(col("_pv"), lit(0L))).as("lcp"))
    // coverage: a position t is covered iff the running max of
    // (pos + lcp) over qualifying starts s <= t reaches past t — one
    // doc-partitioned window, then ONE aggregation for everything
    // (max + arg-max via min_by over the (-lcp, pos) struct + counts)
    val covW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov = sfx.withColumn("_rend",
      max(when(col("lcp") >= minLen, col("pos") + col("lcp"))
        .otherwise(lit(-1L))).over(covW))
    val per = cov.groupBy("doc_id").agg(
      max("lcp").as("lrs_len"),
      min_by(col("pos"),
        struct((-col("lcp")).as("a"), col("pos").as("b"))).as("lrs_pos"),
      count(lit(1)).as("n_tokens"),
      sum(when(col("_rend") > col("pos"), 1L).otherwise(0L))
        .as("n_covered"))
    ids.join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lrs_len"), lit(0L)).as("lrs_len"),
        coalesce(col("lrs_pos"), lit(0L)).as("lrs_pos"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("covered_frac", fracCol)
  }

  private def fracCol =
    when(col("n_tokens") > 0,
      floor(col("n_covered").cast("double") /
        col("n_tokens").cast("double") * 10000.0 + 0.5)
        .cast("double") / 10000.0)
      .otherwise(lit(0.0))

  /** Per-TRAIN-doc EXACT substring overlap with an eval corpus — the
    * exact-length member of the decontamination triad (beside the
    * n-gram probe, [[TextAnalysis.decontaminate]] q53, and the semantic
    * probe, [[Dedup.semanticContaminated]] q91): for every train doc,
    * `max_shared` = length of the longest token span that also occurs
    * ANYWHERE in the eval corpus, plus >= `minLen` coverage accounting
    * (`n_covered`, `covered_frac` — positions inside some eval-shared
    * span). Lee et al. 2022 §4.2 runs exactly this check before
    * reporting eval numbers.
    *
    * Shape: ONE suffix pipeline over the tagged union (eval docs ride
    * negative keys −id−1; train ids must be >= 0). A train suffix in an
    * eval-containing rank group shares its whole remaining text;
    * otherwise its best eval partner is the NEAREST eval group above or
    * below in suffix order (the sorted-order lemma restricted to the
    * eval subset), found by two [[prefixCarryMax]] segmented scans over
    * the dense group ids — no global window — and resolved by one
    * shared rank-pyramid walk. */
  def evalOverlapStats(train: DataFrame, evalDocs: DataFrame,
                       minLen: Int = 16, levels: Int = 0,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val spark = train.sparkSession
    import spark.implicits._
    // both corpora must carry ids >= 0 or the -id-1 eval namespacing is
    // not disjoint and suffixes silently land in the wrong corpus; the
    // guard rides the scan (raise_error is map-side, no extra job)
    def nonNeg(side: String) = {
      val id = col(idCol).cast("long")
      when(id < 0, raise_error(concat(lit(
        s"evalOverlapStats: $side doc_id must be >= 0, got "), id)))
        .otherwise(id)
    }
    val tr = train.select(nonNeg("train").as("doc_id"),
      col(textCol).cast("string").as("text"))
    val ev = evalDocs.select((-nonNeg("eval") - 1).as("doc_id"),
      col(textCol).cast("string").as("text"))
    val union = tr.unionByName(ev)
    val ids = tr.select("doc_id")
    val lv = if (levels > 0) levels
    else {
      val row = union.where(length(trim(col("text"))) > 0)
        .select(max(size(TextAnalysis.tokens(col("text")))).as("_m"))
        .collect()
      val maxLen =
        if (row.isEmpty || row.head.isNullAt(0)) 0 else row.head.getInt(0)
      if (maxLen == 0)
        return ids.withColumn("n_tokens", lit(0L))
          .withColumn("max_shared", lit(0L))
          .withColumn("n_covered", lit(0L))
          .withColumn("covered_frac", lit(0.0))
          .orderBy("doc_id")
      math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1, maxLen - 1)))
    }
    val wide = suffixRanks(union, lv, "doc_id", "text")
    if (levels > 0) {
      val m = wide.select(max("len_rem")).collect()
      val maxLen = if (m.isEmpty || m.head.isNullAt(0)) 0L
        else m.head.getLong(0)
      require((1L << lv) >= maxLen,
        s"levels=$lv cannot separate suffixes of length $maxLen")
    }
    val gCol = s"r$lv"

    // group facts: eval membership + representative; checkpointed (the
    // carries, the walk pairs and the suffix join all read it)
    val grp = wide.groupBy(col(gCol).as("g"))
      .agg(max(when(col("doc_id") < 0, 1L).otherwise(0L)).as("has_eval"))
      .transform(Ckpt.eager)
    val reps = wide
      .withColumn("_rn", row_number().over(
        Window.partitionBy(gCol).orderBy("doc_id", "pos")))
      .where(col("_rn") === 1)
      .select(col(gCol).as("g"), col("doc_id"), col("pos"), col("len_rem"))
    val maxGRow = grp.select(max("g")).collect()
    val maxG = if (maxGRow.isEmpty || maxGRow.head.isNullAt(0)) 0L
    else maxGRow.head.getLong(0)
    if (maxG == 0L)
      return ids.withColumn("n_tokens", lit(0L))
        .withColumn("max_shared", lit(0L))
        .withColumn("n_covered", lit(0L))
        .withColumn("covered_frac", lit(0.0))
        .orderBy("doc_id")

    // nearest eval group below / above via two segmented prefix scans
    val down = prefixCarryMax(
      grp.withColumn("_ev", when(col("has_eval") === 1L, col("g"))),
      "g", "_ev", maxG, "last_eval").drop("_ev")
    val up0 = prefixCarryMax(
      down.withColumn("_ord", lit(maxG) + 1L - col("g"))
        .withColumn("_rv",
          when(col("has_eval") === 1L, lit(maxG) + 1L - col("g"))),
      "_ord", "_rv", maxG, "_nr")
    val grpFull = up0
      .withColumn("next_eval",
        when(col("_nr").isNotNull, lit(maxG) + 1L - col("_nr")))
      .drop("_ord", "_rv", "_nr")

    // walk pairs: train-only groups vs their two nearest eval groups
    val cand = grpFull.where(col("has_eval") === 0L)
      .select(col("g"), explode(array(col("last_eval"), col("next_eval")))
        .as("pg"))
      .where(col("pg").isNotNull)
    val pairs = cand
      .join(reps.select(col("g"), col("doc_id").as("da"),
        col("pos").as("pa"), col("len_rem").as("la")), Seq("g"))
      .join(reps.select(col("g").as("pg"), col("doc_id").as("db"),
        col("pos").as("pb"), col("len_rem").as("lb")), Seq("pg"))
    val sharedG = walkLcp(wide, pairs, lv)
      .groupBy("g").agg(max("lcp").as("_sh"))

    // per-TRAIN-suffix shared length, coverage, per-doc rollup
    val sfx = wide.where(col("doc_id") >= 0)
      .select(col("doc_id"), col("pos"), col("len_rem"), col(gCol).as("g"))
      .join(grpFull.select("g", "has_eval"), Seq("g"))
      .join(sharedG, Seq("g"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("has_eval") === 1L, col("len_rem"))
          .otherwise(coalesce(col("_sh"), lit(0L))).as("shared"))
    val covW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov = sfx.withColumn("_rend",
      max(when(col("shared") >= minLen, col("pos") + col("shared"))
        .otherwise(lit(-1L))).over(covW))
    val per = cov.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      max("shared").as("max_shared"),
      sum(when(col("_rend") > col("pos"), 1L).otherwise(0L))
        .as("n_covered"))
    ids.join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("covered_frac", fracCol)
  }

  /** SURGICAL eval decontamination — the acting half of
    * [[evalOverlapStats]] (q96b measures, this excises):
    * every `window`-token span of a TRAIN document, at EVERY alignment,
    * that also occurs ANYWHERE in the eval corpus is removed from the
    * train text. Dropping whole contaminated documents (the q53/q90
    * rule) forfeits all their clean text; this keeps it — the Lee et
    * al. 2022 §4.2 remedy applied as a transform rather than a filter.
    *
    * Mechanics: the [[substringDeduped]] window-key trick on the tagged
    * union (eval rides −id−1) — O(1) window equality via two
    * overlapping 2^k-block doubling ranks, so only floor(log2 W) levels
    * are built; train windows semi-join the DISTINCT eval window-key
    * set. NO canonical veto applies (unlike within-corpus dedup):
    * eval-shared content must survive NOWHERE in train, so every
    * covered position drops. Coverage and rebuild group by doc_id —
    * one doc-hash exchange after the key join. Output: (doc_id, text,
    * n_tokens_before, n_tokens_after) for every train doc. Same
    * token-space rebuild caveat as [[substringDeduped]]: re-joining
    * kept tokens can create NEW adjacencies; a second pass is a no-op
    * on natural leak shapes (spec-gated) but not a universal
    * identity. */
  def evalDecontaminatedText(train: DataFrame, evalDocs: DataFrame,
                             window: Int = 16,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    require(window >= 1 && window <= (1 << 24),
      s"window out of range: $window")
    def nonNeg(side: String) = {
      val id = col(idCol).cast("long")
      when(id < 0, raise_error(concat(lit(
        s"evalDecontaminatedText: $side doc_id must be >= 0, got "), id)))
        .otherwise(id)
    }
    val tr = train.select(nonNeg("train").as("doc_id"),
      col(textCol).cast("string").as("text"))
    val ev = evalDocs.select((-nonNeg("eval") - 1).as("doc_id"),
      col(textCol).cast("string").as("text"))
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    val shift = window - (1 << kLev)
    val wide = suffixRanks(tr.unionByName(ev), math.max(1, kLev),
      "doc_id", "text")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val win = wide.select(col("doc_id"), col("pos"), col("len_rem"),
        col(s"r$kLev").as("_k1"))
      .withColumn("_k2",
        if (shift == 0) col("_k1")
        else lead(col("_k1"), shift).over(byPos))
      .where(col("len_rem") >= window)
    val evalKeys = win.where(col("doc_id") < 0)
      .select("_k1", "_k2").distinct()
    val dirty = win.where(col("doc_id") >= 0)
      .join(evalKeys, Seq("_k1", "_k2"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(true).as("_d"))
    val toks = tr
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), posexplode(col("_tk")).as(Seq("_p", "_term")))
      .select(col("doc_id"), col("_p").cast("long").as("pos"), col("_term"))
    val covW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = lit(window.toLong)
    val cov = toks.join(dirty, Seq("doc_id", "pos"), "left")
      .withColumn("_rr", max(when(col("_d"), col("pos") + w)
        .otherwise(lit(-1L))).over(covW))
      .withColumn("_kp", !(col("_rr") > col("pos")))
    val reb = cov.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens_before"),
      sum(when(col("_kp"), 1L).otherwise(0L)).as("n_tokens_after"),
      concat_ws(" ", transform(
        array_sort(collect_list(
          when(col("_kp"), struct(col("pos"), col("_term"))))),
        x => x("_term"))).as("text"))
    tr.select("doc_id")
      .join(reb, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_tokens_before"), lit(0L)).as("n_tokens_before"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"))
  }

  /** EXACT duplicated-span REMOVAL — the acting half of Lee et al. 2022
    * that [[substringDedupStats]] only measures, on suffix-rank truth
    * instead of [[TextAnalysis.spanDeduped]]'s aligned-tile rolling-hash
    * approximation: every `window`-token span, at EVERY alignment, that
    * occurs >= 2 times corpus-wide keeps exactly its canonical
    * occurrence (least (doc_id, pos)) and loses the rest.
    *
    * Window equality is decided by the classic O(1) substring-equality
    * trick on doubling ranks: with k = floor(log2 W), spans of length W
    * at p and q are identical iff (r_k[p], r_k[p + W - 2^k]) agree —
    * two overlapping 2^k-blocks cover all W positions — so only
    * floor(log2 W) doubling levels are built (~4 for W=16, NOT the full
    * log(maxDocLen) pyramid: window-length separation never needs
    * whole-suffix separation) and the grouped key is two longs, never W
    * shuffled tokens.
    *
    * Removal rule, per token position t of doc d: t is dropped iff some
    * duplicate NON-canonical window starts at s <= t with s + W > t AND
    * no CANONICAL duplicate window covers t. The canonical veto makes
    * the keep-one guarantee structural: a canonical window's W
    * positions are all covered by it, hence all kept, hence CONTIGUOUS
    * in the rebuilt text — every duplicated span content provably
    * survives at exactly its first corpus occurrence. (Without the
    * veto, overlapping duplicates — e.g. periodic text — erase each
    * other's canonical copies and duplicated content vanishes
    * entirely.) Rebuilding re-joins kept tokens with single spaces
    * (the [[TextAnalysis.spanDeduped]] token-space contract), which in
    * adversarial corpora can create NEW adjacencies that duplicate
    * other text — a second pass is a no-op on copy/boilerplate/periodic
    * structure (spec-gated) but not a universal identity, the same
    * caveat as Lee et al.'s own tool.
    *
    * Scale shape: both coverage carries and the rebuild group by
    * doc_id, so after the one window-key aggregation the whole tail of
    * the job runs in a single doc-hash exchange. Output: (doc_id, text,
    * n_tokens_before, n_tokens_after); docs with nothing removed pass
    * through in token space, whitespace-only docs rebuild to "". */
  def substringDeduped(docs: DataFrame, window: Int = 16,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(window >= 1 && window <= (1 << 24),
      s"window out of range: $window")
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    val shift = window - (1 << kLev)
    val wide = suffixRanks(docs, math.max(1, kLev), idCol, textCol)
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val win = wide.select(col("doc_id"), col("pos"), col("len_rem"),
        col(s"r$kLev").as("_k1"))
      .withColumn("_k2",
        if (shift == 0) col("_k1")
        else lead(col("_k1"), shift).over(byPos))
      .where(col("len_rem") >= window)
    // duplicate window groups + canonical pick: ONE keyed aggregation
    // (map-side partial combine; no per-key window sort), then the
    // corpus-sized join back touches only duplicate keys
    val canon = win.groupBy("_k1", "_k2")
      .agg(min(struct(col("doc_id"), col("pos"))).as("_keep"),
        count(lit(1)).as("_occ"))
      .where(col("_occ") >= 2)
    val flags = win.join(canon, Seq("_k1", "_k2"))
      .select(col("doc_id"), col("pos"),
        (col("doc_id") === col("_keep.doc_id") &&
          col("pos") === col("_keep.pos")).as("_canon"))
    rebuildWithVeto(docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text")), flags, window)
  }

  /** Shared removal/rebuild tail of [[substringDeduped]] (also driven by
    * [[SubstringIndex.appendDeduped]]'s content-key flags): `docsIdText`
    * is the (doc_id LONG, text STRING) frame to rebuild; `flags` carries
    * one row per duplicate-group window occurrence (doc_id, pos, _canon).
    * Applies the canonical-veto removal rule per token position (see the
    * [[substringDeduped]] doc), rebuilds text in token space, and reports
    * before/after token counts; docs with no flagged window pass through
    * in token space, whitespace-only docs rebuild to "". Both coverage
    * carries and the rebuild group by doc_id — one doc-hash exchange. */
  private[graft] def rebuildWithVeto(docsIdText: DataFrame, flags: DataFrame,
                                     window: Int): DataFrame = {
    val toks = docsIdText
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), posexplode(col("_tk")).as(Seq("_p", "_term")))
      .select(col("doc_id"), col("_p").cast("long").as("pos"), col("_term"))
    val covW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = lit(window.toLong)
    val cov = toks.join(flags, Seq("doc_id", "pos"), "left")
      .withColumn("_rr", max(when(col("_canon") === false, col("pos") + w)
        .otherwise(lit(-1L))).over(covW))
      .withColumn("_rc", max(when(col("_canon") === true, col("pos") + w)
        .otherwise(lit(-1L))).over(covW))
      .withColumn("_kp",
        !(col("_rr") > col("pos") && !(col("_rc") > col("pos"))))
    val reb = cov.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens_before"),
      sum(when(col("_kp"), 1L).otherwise(0L)).as("n_tokens_after"),
      concat_ws(" ", transform(
        array_sort(collect_list(
          when(col("_kp"), struct(col("pos"), col("_term"))))),
        x => x("_term"))).as("text"))
    docsIdText.select("doc_id")
      .join(reb, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_tokens_before"), lit(0L)).as("n_tokens_before"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"))
  }
}
