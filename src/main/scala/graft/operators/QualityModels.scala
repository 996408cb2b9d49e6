package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Model-shaped quality scoring and corpus-mixing operators — the
  * "cheap classifier" tier of an LLM data pipeline (the fastText-style
  * quality filter, the CCNet-style LM-perplexity filter, and the
  * temperature-weighted source mixer that decides how much of each source
  * makes the training cut).
  *
  * Every operator is deterministic end-to-end: feature hashes are
  * md5-derived, weights are integers, float accumulation either happens in
  * exact integer arithmetic (hashing-trick margins) or is quantized to
  * 1e-6 longs before any order-nondeterministic aggregation (log-prob
  * sums) — the same recipe that makes the ANN trainers oracle-replayable.
  */
object QualityModels {

  // shared canonical tokenizer (see [[TextAnalysis.tokens]]) — the oracle
  // SQL replays its exact semantics
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** The md5-derived µ-weight of one token under `nBuckets` hashed
    * features — THE weight formula, shared by the batch scorer, the
    * weighted variant's derivation in specs, and the streaming
    * [[marginExpr]] (one definition, so batch and streaming margins
    * cannot drift apart). */
  private def weightQ(token: Column, nBuckets: Int): Column = {
    val bkt = pmod(Dedup.md5Long(token), lit(nBuckets.toLong))
    pmod(Dedup.md5Long(concat(lit("w"), bkt.cast("string"))),
      lit(2000001L)) - lit(1000000L)
  }

  /** Hashing-trick linear classifier inference (the fastText-filter
    * shape): every token hashes into one of `nBuckets` feature buckets,
    * the bucket's integer weight (µ-units, 1e-6) accumulates into an EXACT
    * long margin, and the document score is sigmoid(mean token weight).
    * Map-only plus ONE map-side-combinable doc-keyed aggregation — no
    * joins, no driver state; at 100 TB the scan is the cost.
    *
    * Weights here are derived deterministically from the bucket id
    * (md5("w<bucket>") reduced to (-1e6, 1e6] µ-units) — the stand-in for
    * a trained model's quantized weights, letting an external oracle
    * replay inference bit-for-bit. [[hashedLinearScoreWeighted]] takes
    * real weights. Output: (doc_id, n_tokens, margin_q, score, label). */
  def hashedLinearScore(docs: DataFrame, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0)
    scoreMargins(
      docs.select(col("doc_id"), explode(toks(col("text"))).as("_term"))
        .select(col("doc_id"), weightQ(col("_term"), nBuckets).as("_wq")))
  }

  /** Same inference with CALLER-SUPPLIED µ-unit weights (index =
    * bucket id). The weight vector rides as a literal array into codegen —
    * right up to ~10⁵ buckets; past that, broadcast-join a (bucket,
    * weight) frame instead (same plan shape, one broadcast exchange). */
  def hashedLinearScoreWeighted(docs: DataFrame,
                                weightsMicro: Array[Long]): DataFrame = {
    require(weightsMicro.nonEmpty)
    val bkt = pmod(Dedup.md5Long(col("_term")),
      lit(weightsMicro.length.toLong))
    val wq = element_at(typedLit(weightsMicro.toSeq), (bkt + 1).cast("int"))
    scoreMargins(
      docs.select(col("doc_id"), explode(toks(col("text"))).as("_term"))
        .select(col("doc_id"), wq.as("_wq")))
  }

  /** The [[hashedLinearScore]] margin as a PURE column expression: a
    * per-row fold over the token array (exact long addition — order
    * can't matter, so fold ≡ the batch explode+agg bit-for-bit). Zero
    * shuffle, zero state: this is the form a STREAMING quality guard
    * filters on ([[graft.streaming.StreamingIngest.streamingQualityFilter]]),
    * and the batch twin keeps it honest in PipelineOpsSpec. */
  def marginExpr(text: Column, nBuckets: Int = 256): Column = {
    require(nBuckets > 0)
    aggregate(transform(toks(text), t => weightQ(t, nBuckets)),
      lit(0L), (acc, w) => acc + w)
  }

  private def scoreMargins(perToken: DataFrame): DataFrame =
    perToken.groupBy("doc_id")
      .agg(sum("_wq").as("margin_q"), count(lit(1)).as("n_tokens"))
      .withColumn("_z",
        col("margin_q").cast("double") / lit(1000000.0) / col("n_tokens"))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("_z"))))
      .withColumn("label",
        when(col("margin_q") >= 0, lit(1)).otherwise(lit(0)))
      .select("doc_id", "n_tokens", "margin_q", "score", "label")

  /** Add-one-smoothed bigram language-model scoring (the CCNet
    * perplexity-filter shape): train bigram/unigram counts on `train`,
    * score every `score` document by its mean bigram log-probability
    * ln((C(w1 w2)+1) / (C(w1)+V)). Grams travel as md5-derived 56-bit
    * keys from the explode on (the same hashed-gram discipline as
    * decontamination/repetition — the dominant shuffles carry ~16 B rows);
    * the count tables join by gram key (hash joins on bounded-cardinality
    * keys; Spark broadcasts them when small). Per-bigram log-probs
    * quantize to 1e-6 longs before the doc-keyed sum, so partial-agg
    * order cannot move the result. Output: (doc_id, n_bigrams,
    * avg_logprob) for docs with >= 1 bigram. */
  def bigramLmScore(train: DataFrame, score: DataFrame): DataFrame = {
    def bigramsFromToks(toksDf: DataFrame): DataFrame =
      toksDf.where(size(col("_toks")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("_toks")) - 1),
          i => struct(
            Dedup.md5Long(concat(element_at(col("_toks"), i), lit(" "),
              element_at(col("_toks"), i + 1))).as("bk"),
            Dedup.md5Long(element_at(col("_toks"), i)).as("uk"))))
          .as("_g"))
        .select(col("doc_id"), col("_g.bk").as("bk"), col("_g.uk").as("uk"))
    // tokenize train ONCE: both count tables (bigram + unigram) derive
    // from the persisted token projection — without it each call pays
    // two full text scans + regex passes over train (packShards'
    // lifetime pattern: result checkpoint-backed, temp freed on return)
    val trainToks = train
      .select(col("doc_id"), toks(col("text")).as("_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = bigramsFromToks(trainToks).groupBy("bk")
      .agg(count(lit(1)).as("c2"))
    val c1 = trainToks.select(explode(col("_toks")).as("_term"))
      .select(Dedup.md5Long(col("_term")).as("uk"))
      .groupBy("uk").agg(count(lit(1)).as("c1"))
    // 1-row vocab-size frame rides in as a broadcast (the scalar-subquery
    // plan shape — a nested-loop join whose build side is one row)
    val v = c1.agg(count(lit(1)).as("v"))
    val lp = log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + col("v")))
    val out = bigramsFromToks(
        score.select(col("doc_id"), toks(col("text")).as("_toks")))
      .join(c2, Seq("bk"), "left")
      .join(c1, Seq("uk"), "left")
      .crossJoin(broadcast(v))
      .withColumn("_lpq", floor(lp * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(sum("_lpq").as("_sum_q"), count(lit(1)).as("n_bigrams"))
      .withColumn("avg_logprob",
        col("_sum_q").cast("double") / lit(1000000.0) / col("n_bigrams"))
      .select("doc_id", "n_bigrams", "avg_logprob")
      .transform(Ckpt.eager)
    trainToks.unpersist(false)
    out
  }

  /** Temperature-weighted source mixing under a global token budget (the
    * sampling-weights step of a multi-source training mix): source `s`
    * with `T_s` subtokens gets share ∝ T_s^(1/2) (temperature 0.5 —
    * upweights small sources like multilingual sampling does), hence a
    * deterministic keep-rate r_s = min(1, share_s · budget / T_s), applied
    * with the md5-keyed keep test (reproducible across engines,
    * partitionings and sessions — the [[TextAnalysis.stratifiedSample]]
    * mechanism with salt "mix").
    *
    * The per-source stats frame is tiny (sources are FEW); its Σ T^τ
    * denominator folds over a SORTED source list so double-summation
    * order is pinned. Corpus rows take one broadcast join + a map-side
    * threshold — no corpus shuffle. Output: kept (doc_id, source, rate). */
  def sourceMixtureSample(docs: DataFrame, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0)
    val stats = docs.groupBy("source")
      .agg(sum(TextAnalysis.subtokenCount(col("text"))).as("toks_s"))
      .withColumn("_w", sqrt(col("toks_s").cast("double")))
    // Σ over sources in source-name order: fold of a sorted struct array,
    // deterministic in any engine. Computed as an unpartitioned window
    // over the STATS frame (sources are few — single-task by design, and
    // it keeps this a single plan branch: a separate .agg() would
    // duplicate the corpus-scan subtree, re-running the regex pass)
    val rates = stats
      .withColumn("_all",
        collect_list(struct(col("source"), col("_w"))).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy().rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("_denom", aggregate(array_sort(col("_all")),
        lit(0.0), (acc, x) => acc + x("_w")))
      .withColumn("rate_q",
        least(lit(1000000L),
          floor(col("_w") / col("_denom") * lit(tokenBudget.toDouble) /
            col("toks_s") * lit(1000000.0)).cast("long")))
      .select(col("source"), col("rate_q"))
    val keep = pmod(Dedup.md5Long(
        concat(col("doc_id").cast("string"), lit(":mix"))),
      lit(1000000L)) < col("rate_q")
    docs.join(broadcast(rates), Seq("source"))
      .where(keep)
      .select(col("doc_id"), col("source"),
        (col("rate_q").cast("double") / lit(1000000.0)).as("rate"))
  }
}
