package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Text-analysis operators for large-scale training-data pipelines (builder
  * north star; SURVEY §2.10 Q18 family): token counting, quality scoring,
  * n-gram-heuristic language ID, document fingerprinting.
  *
  * Everything is built from codegen'd string/array expressions — no UDFs —
  * so a 100 TB `documents` scan stays a single embarrassingly-parallel
  * map stage with full column pruning (only `text` and the id column are
  * read when that is all the query needs).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Ratio of [a-z] chars (inputs are lowercase corpora). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")).cast("double") /
      length(text).cast("double")

  /** Count of tokens from a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*))).cast("long")

  val EnMarkers = Seq("the", "and", "of", "to")
  val DeMarkers = Seq("der", "und", "die", "das")
  val FrMarkers = Seq("le", "la", "et", "les")
  val EsMarkers = Seq("el", "los", "que", "y")

  /** Stopword set for quality scoring. */
  val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** BPE-ish subword-unit pattern: letter runs, digit runs, or single
    * non-space symbols — a portable approximation of byte-pair pretoken
    * splitting (identical semantics in Java regex and RE2). */
  val SubtokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Approximate "BPE token" count via [[SubtokenPattern]]. */
  def subtokenCount(text: Column): Column =
    regexp_count(text, lit(SubtokenPattern)).cast("long")

  /** doc_id, n_tokens, n_subtokens, text_len, alpha_ratio. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      subtokenCount(col("text")).as("n_subtokens"),
      length(col("text")).cast("long").as("text_len"),
      alphaRatio(col("text")).as("alpha_ratio"))

  /** Quality score in [0,1]:
    * 0.3·min(1, chars/500) + 0.4·alpha_ratio + 0.3·stopword_ratio.
    * A deterministic heuristic in the spirit of C4/Gopher-style filters. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stop = markerCount(toks, Stopwords).cast("double")
    val lenScore = least(lit(1.0), length(col("text")).cast("double") / 500.0)
    docs.select(col("doc_id"),
      round(lit(0.3) * lenScore + lit(0.4) * alphaRatio(col("text"))
        + lit(0.3) * (stop / nTok), 4).as("quality"))
  }

  /** n-gram/marker-heuristic language ID. Ties resolve in a fixed order
    * (zh > en > de > fr > es) so the prediction is deterministic. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val en = markerCount(toks, EnMarkers)
    val de = markerCount(toks, DeMarkers)
    val fr = markerCount(toks, FrMarkers)
    val es = markerCount(toks, EsMarkers)
    val nonAscii = length(regexp_replace(col("text"), "[\\x00-\\x7f]", ""))
    docs.select(col("doc_id"), en.as("en_cnt"), de.as("de_cnt"),
      fr.as("fr_cnt"), es.as("es_cnt"), nonAscii.as("_non_ascii"))
      .withColumn("pred_lang",
        when(col("_non_ascii") > 0, "zh")
          .when(col("en_cnt") >= col("de_cnt") &&
            col("en_cnt") >= col("fr_cnt") &&
            col("en_cnt") >= col("es_cnt"), "en")
          .when(col("de_cnt") >= col("fr_cnt") &&
            col("de_cnt") >= col("es_cnt"), "de")
          .when(col("fr_cnt") >= col("es_cnt"), "fr")
          .otherwise("es"))
      .drop("_non_ascii")
  }

  /** Pack documents into training shards by token budget: each doc gets
    * the shard whose budget window contains the tokens BEFORE it in
    * doc_id order (greedy sequential packing — the standard pre-tokenizer
    * step that turns a corpus into ~budget-sized work units).
    *
    * Scale shape: a GLOBAL running sum is the classic single-task window
    * trap (`Window.orderBy` with no partition serializes the corpus), so
    * this computes it in two bounded stages — per-bucket running sums
    * (window PARTITIONED by a doc_id bucket) plus broadcast per-bucket
    * offsets. The only unpartitioned window runs over the bucket-totals
    * frame: N/bucketSize rows (a 1B-doc corpus at the default is ~244k
    * rows on the driver-adjacent path — fine), never the corpus. */
  def packShards(docs: DataFrame, tokenBudget: Long,
                 bucketSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tokenBudget > 0 && bucketSize > 0)
    // persisted: the regexp-heavy token-count scan feeds BOTH the
    // windowed branch and the totals aggregate — without this the
    // dominant cost (the regex pass over all text) runs twice; the
    // persisted projection is (doc_id, count, bucket) longs only,
    // ~1000× smaller than the text it derives from
    val d = docs.select(col("doc_id"),
        subtokenCount(col("text")).as("n_subtokens"))
      .withColumn("_b",
        expr(s"CAST(doc_id AS BIGINT) div $bucketSize"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wIn = Window.partitionBy("_b").orderBy("doc_id")
    val inBucket = d.withColumn("_cumb", sum("n_subtokens").over(wIn))
    val totals = d.groupBy("_b").agg(sum("n_subtokens").as("_bt"))
    val wOff = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum("_bt").over(wOff), lit(0L)))
      .drop("_bt")
    // materialize the (small, 4-long-column) result so the temporary
    // token-count cache can be freed NOW — without this the returned
    // plan references the persisted frame and repeated packShards calls
    // accumulate cached blocks for the session. Same lifetime contract
    // as [[Dedup.connectedComponents]]: the result is checkpoint-backed;
    // long-lived sessions Bridge.unpersistCheckpoint it once consumed.
    val out = inBucket.join(broadcast(offsets), Seq("_b"))
      .withColumn("cum_subtokens", col("_off") + col("_cumb"))
      .withColumn("shard_id",
        expr(s"(cum_subtokens - n_subtokens) div $tokenBudget"))
      .select("doc_id", "n_subtokens", "cum_subtokens", "shard_id")
      .localCheckpoint(true)
    d.unpersist(false)
    out
  }

  /** Split each document into overlapping ~chunkSize-token windows (the
    * context-window chunking step before embedding/tokenizer jobs):
    * starts 1, 1+step, 1+2·step, … (step = chunkSize − overlap), last
    * chunk may be short. Map-only: sequence + slice expressions, one
    * output row per chunk. Emits the chunk's md5 (not the text) so
    * downstream dedup/verification is cheap; swap the projection for the
    * text itself when materializing. */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap($overlap) < chunkSize($chunkSize)")
    val step = chunkSize - overlap
    val toks = tokens(col("text"))
    val chunks = transform(
      sequence(lit(1), size(toks), lit(step)),
      st => struct(
        md5(concat_ws(" ", slice(toks, st, lit(chunkSize))).cast("binary"))
          .as("chunk_hash"),
        least(lit(chunkSize), size(toks) - st + 1).cast("long")
          .as("n_chunk_tokens")))
    docs.where(size(toks) > 0)
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_id", "_c")))
      .select(col("doc_id"), col("chunk_id"),
        col("_c.chunk_hash").as("chunk_hash"),
        col("_c.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Deterministic hash sampling: keep a row iff
    * md5(key:seed) mod 1e6 < rate·1e6 — reproducible across runs,
    * engines, and partitionings (no RNG state), map-only, and stable
    * under corpus growth (a kept id stays kept). The seed folds into the
    * hashed key so different samples of the same corpus are independent. */
  def hashSample(docs: DataFrame, keyCol: String, rate: Double,
                 seed: Int = 0): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    docs.where(hashBucket(col(keyCol), seed) < math.round(rate * 1e6))
  }

  /** Per-stratum deterministic sampling (downsample dominant strata,
    * keep rare ones whole — e.g. lang -> rate): same keep rule as
    * [[hashSample]] with the rate chosen by the stratum column;
    * unlisted strata use `defaultRate`. */
  def stratifiedSample(docs: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 1.0,
                       seed: Int = 0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]"))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 1e6))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(math.round(r * 1e6)))
          .otherwise(acc)
    }
    docs.where(hashBucket(col(keyCol), seed) < threshold)
  }

  /** md5-derived bucket in [0, 1e6) — the shared keep-test hash. */
  private def hashBucket(key: Column, seed: Int): Column =
    pmod(conv(substring(md5(
        concat(key.cast("string"), lit(s":$seed")).cast("binary")), 1, 14),
      16, 10).cast("long"), lit(1000000L))

  /** Position-weighted rolling fingerprint of the token stream: an
    * order-sensitive document hash, Σ_i (md5hash(tok_i) mod P)·(i+1) mod P
    * with P = 1e9+7. md5-derived token hashes make the value reproducible in
    * any engine; reducing mod P inside the fold keeps the accumulator below
    * 2·P regardless of document length (a raw running sum would wrap 2^63
    * around 4300 tokens while DuckDB's list_sum promotes to HUGEINT —
    * engine/oracle divergence on long docs). Each term h·(i+1) stays below
    * 2^63 for any realistic token count (h < 2^30). */
  def fingerprint(text: Column): Column = {
    val P = 1000000007L
    val weighted = transform(tokens(text), (t, i) =>
      pmod(conv(substring(md5(t.cast("binary")), 1, 14), 16, 10).cast("long"),
        lit(P)) * (i.cast("long") + 1))
    aggregate(weighted, lit(0L), (a, x) => pmod(a + x, lit(P)))
  }
}
