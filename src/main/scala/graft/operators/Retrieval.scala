package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Keyword (BM25) retrieval and rank fusion — the lexical half of a
  * training-data search stack (the reference's engine is vector-only;
  * a corpus user doing contamination forensics or quality audits needs
  * "find the documents containing these terms, ranked" next to ANN, and
  * hybrid BM25+vector fusion is the standard retrieval-quality baseline).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the text is tokenized ONCE into a postings frame keyed by an
  *    md5-derived 56-bit term key — terms never shuffle as strings, and
  *    the only corpus-sized shuffle is the (doc, term) partial-aggregated
  *    groupBy (map-side combine collapses repeated terms per doc before
  *    anything moves);
  *  - query terms broadcast; postings are semi-filtered to query terms
  *    BEFORE any scoring work, so per-search cost is proportional to the
  *    posting lists of the queried terms, not the corpus (document
  *    frequencies are likewise counted only for queried terms);
  *  - per-term score contributions quantize to exact 1e-6 longs before the
  *    per-(query, doc) sum, so aggregation order cannot change results
  *    (same determinism recipe as the quantized ANN trainers), and the
  *    final rank is the salted two-phase top-k.
  *
  * A term present in more than half the corpus gets a small (but still
  * positive — Lucene's +1 smoothing) idf rather than a negative one, so
  * stopword-heavy queries degrade gracefully instead of penalizing
  * matches.
  */
object Retrieval {

  // the engine's ONE canonical tokenizer — every oracle replays its exact
  // semantics, so retrieval must share it rather than re-implement it
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** Tokenized postings: one row per (doc_id, term_key) with the term
    * frequency and the document token length — (doc_id, dl, term_key, tf).
    * Term keys are [[Dedup.md5Long]] 56-bit hashes (collision odds over a
    * q-term vocabulary ≈ q²/2⁵⁷ — negligible, and the oracle replays the
    * identical keys). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks(col("text")).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("_term"))
      .groupBy(col("doc_id"), col("dl"),
        Dedup.md5Long(col("_term")).as("term_key"))
      .agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings: one row per token occurrence —
    * (doc_id, term_key, pos), pos 0-based. The index shape phrase and
    * proximity queries need ([[phraseSearch]]); rows are 24 B regardless
    * of token width, the same travel-as-keys discipline as [[postings]]. */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "_term")))
      .select(col("doc_id"), Dedup.md5Long(col("_term")).as("term_key"),
        col("pos").cast("long").as("pos"))

  /** Exact phrase search over [[positionalPostings]]: top-`k` documents
    * per phrase by occurrence count. `phrases` is a small
    * (phrase_id, ptext) frame.
    *
    * The classic positional-list merge, done set-wise: each phrase slot i
    * joins the postings on its term key, every match votes for the
    * aligned start position pos − i, and a start that collects ALL n
    * slots is one occurrence (per (doc, start) a slot can match at most
    * once, so the votes are distinct by construction — repeated phrase
    * tokens included). No per-pair self-join chain, no window over the
    * corpus: one selective equi-join (only the phrase terms' posting
    * lists ever move — the phrase-term frame broadcasts), ONE aggregation
    * keyed by (phrase, doc, start), then the salted two-phase rank.
    * Output: (phrase_id, doc_id, n_occurrences, rank). */
  def phraseSearch(post: DataFrame, phrases: DataFrame, k: Int,
                   broadcastPhrases: Boolean = true): DataFrame = {
    val pterms = phrases.select(col("phrase_id"),
        posexplode(toks(col("ptext"))).as(Seq("slot", "_t")))
      .select(col("phrase_id"), col("slot").cast("long").as("slot"),
        Dedup.md5Long(col("_t")).as("term_key"))
    val plen = pterms.groupBy("phrase_id")
      .agg(count(lit(1)).as("n_terms"))
    val pt = if (broadcastPhrases) broadcast(pterms) else pterms
    val pl = if (broadcastPhrases) broadcast(plen) else plen
    val occ = post.join(pt, "term_key")
      .select(col("phrase_id"), col("doc_id"),
        (col("pos") - col("slot")).as("_start"))
      .groupBy("phrase_id", "doc_id", "_start")
      .agg(count(lit(1)).as("_slots"))
      .join(pl, "phrase_id")
      .where(col("_slots") === col("n_terms"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
    TopK.perKeySalted(occ, "phrase_id",
      Seq(col("n_occurrences").desc, col("doc_id")), k)
  }

  /** Proximity search over [[positionalPostings]]: top-`k` documents per
    * query by the number of position pairs where the query's two terms
    * occur within `window` tokens of each other (|pa − pb| ≤ window).
    * `queries` is a small (query_id, term_a, term_b) frame. Distinct
    * terms count every ordered (pa, pb) pair; a query with
    * term_a = term_b counts each unordered pair of DISTINCT positions
    * once (self-pairs at distance 0 excluded).
    *
    * The position-range join is done with the pigeonhole bucket trick
    * rather than a per-doc cross product: positions bucket by
    * ⌊pos/window⌋, the a-side emits each occurrence into its own bucket
    * and both neighbors, and the b-side equi-joins on (query, doc,
    * bucket) — any pair within `window` has buckets differing by at most
    * 1, so the expanded equi-join is EXACT after the |pa − pb| ≤ window
    * filter, while only bucket-mates ever pair (per-doc work is
    * Σ bucket-occupancy², never positions² — the same banding discipline
    * as the Hamming joins). Output: (query_id, doc_id, n_pairs, rank). */
  def proximitySearch(post: DataFrame, queries: DataFrame, window: Int,
                      k: Int, broadcastQueries: Boolean = true)
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    def side(termCol: String, posName: String) = {
      val terms = queries.select(col("query_id"),
        Dedup.md5Long(col(termCol)).as("term_key"),
        (col("term_a") === col("term_b")).as("_same"))
      val t = if (broadcastQueries) broadcast(terms) else terms
      post.join(t, "term_key")
        .select(col("query_id"), col("doc_id"), col("_same"),
          col("pos").as(posName))
    }
    val a = side("term_a", "pa")
      .select(col("query_id"), col("doc_id"), col("_same"), col("pa"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("_nb"))
      .select(col("query_id"), col("doc_id"), col("_same"), col("pa"),
        (floor(col("pa") / window) + col("_nb")).as("_bkt"))
    val b = side("term_b", "pb").drop("_same")
      .withColumn("_bkt", floor(col("pb") / window))
    // pair contract: distinct terms count every ordered (pa, pb) within
    // the window (each distinct-term co-occurrence once); an EQUAL term
    // pair counts each unordered pair of DISTINCT positions once
    // (pa < pb) — without the guard it would count self-pairs (pa = pb,
    // distance 0) and both orderings, inflating n_pairs.
    val occ = a.join(b, Seq("query_id", "doc_id", "_bkt"))
      .where(abs(col("pa") - col("pb")) <= window &&
        (!col("_same") || col("pa") < col("pb")))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_pairs"))
    TopK.perKeySalted(occ, "query_id",
      Seq(col("n_pairs").desc, col("doc_id")), k)
  }

  /** BM25 top-`k` per query, one-shot form: builds the postings frame,
    * searches it, frees it. `queries` is a small (query_id, qtext) frame
    * (it broadcasts; repeated terms within one query count once — the
    * standard short-query form). Output: (query_id, rank, doc_id, score),
    * score quantized to 1e-6 (exact integer summation → deterministic
    * across engines and partitionings).
    *
    * One corpus-text scan; the postings build is the only corpus-sized
    * shuffle. For a repeated-search deployment build [[postings]] ONCE
    * (persist it — bucketed by `term_key` if the store supports it — and
    * [[bm25OverPostings]] each query batch against it; the build
    * amortizes to zero). k1/b are the Robertson defaults. */
  def bm25(docs: DataFrame, queries: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           maxDfFrac: Double = 1.0, requireAll: Boolean = false)
      : DataFrame = {
    val post = postings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked =
      bm25OverPostings(post, queries, k, k1, b, maxDfFrac, requireAll)
        .transform(Ckpt.eager)
    post.unpersist(false)
    ranked
  }

  /** BM25 search against a PREBUILT [[postings]] frame — the maintained-
    * index path (lazy; the caller owns the postings' lifetime). Corpus
    * stats and document frequencies derive from the postings themselves,
    * so a persisted postings table is fully self-contained.
    *
    * `maxDfFrac < 1` drops query terms whose document frequency exceeds
    * that fraction of the corpus — the stopword guard at web scale: a
    * term in half the corpus contributes almost no idf but its posting
    * list is half the table, and THAT list is the one skewed shuffle a
    * hot query could pay. One predicate on the tiny per-term df frame
    * removes it before any posting list is touched.
    *
    * `requireAll = true` keeps only documents matching EVERY (surviving)
    * query term — conjunctive (AND) retrieval. Implemented as a filter
    * on the per-(query, doc) aggregation: the matched-term count must
    * equal the query's surviving-term count (counted AFTER the df cap,
    * so a capped stopword doesn't make conjunctive queries unmatchable).
    * No extra shuffle — both counts ride the aggregations that already
    * exist.
    *
    * `broadcastQueries = false` drops the broadcast hints on the
    * query-term frames — the offline-evaluation regime where the query
    * batch itself is corpus-sized (millions of queries don't fit a
    * broadcast; the term-keyed joins become shuffled hash joins on the
    * same 8-byte keys). Results are identical either way (spec-gated,
    * the [[TextAnalysis.decontaminate]] broadcast≡shuffle discipline). */
  def bm25OverPostings(post: DataFrame, queries: DataFrame, k: Int,
                       k1: Double = 1.2, b: Double = 0.75,
                       maxDfFrac: Double = 1.0,
                       requireAll: Boolean = false,
                       broadcastQueries: Boolean = true): DataFrame = {
    val bc: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    // per-query distinct terms, and the distinct overall key set
    val qt = queries
      .select(col("query_id"), explode(toks(col("qtext"))).as("_qterm"))
      .select(col("query_id"), Dedup.md5Long(col("_qterm")).as("term_key"))
      .distinct()
    val qkeys = qt.select("term_key").distinct()
    // corpus stats (1 row): N docs, total token length -> avgdl; rides in
    // as a 1-row broadcast (the scalar-subquery plan shape)
    val stats = post.groupBy("doc_id").agg(first("dl").as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("tot"))
    // postings restricted to queried terms; df counted on the restriction
    // (post has exactly one row per (doc, term), so count(*) = df)
    val cand = post.join(bc(qkeys), Seq("term_key"))
    val dfAll = cand.groupBy("term_key").agg(count(lit(1)).as("df"))
    val dfreq =
      if (maxDfFrac >= 1.0) dfAll
      else dfAll.crossJoin(broadcast(stats.select("n")))
        .where(col("df") <= lit(maxDfFrac) * col("n"))
        .drop("n")
    val k1b = k1 * (1 - b) // 0.3 at defaults
    val k1bb = k1 * b // 0.9
    val scored = cand
      .join(bc(qt), Seq("term_key"))
      .join(bc(dfreq), Seq("term_key"))
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl", col("tot").cast("double") / col("n").cast("double"))
      .withColumn("_idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("_contrib",
        col("_idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + (lit(k1b) + lit(k1bb) * col("dl") / col("_avgdl"))))
      .withColumn("_cq",
        floor(col("_contrib") * lit(1000000.0) + lit(0.5)).cast("long"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum("_cq").as("score_q"), count(lit(1)).as("_matched"))
    val filtered =
      if (!requireAll) perDoc
      else {
        // surviving term count per query = all query terms minus only
        // the DF-CAPPED ones. Out-of-vocabulary terms (absent from the
        // postings entirely) still COUNT: no document can match them, so
        // a conjunctive query containing one returns empty — true AND
        // semantics. (Counting from dfreq instead would silently drop
        // OOV terms and return spurious matches.) Capped terms live in
        // dfAll but not dfreq — a tiny anti-join.
        val capped = dfAll.select("term_key")
          .join(dfreq.select("term_key"), Seq("term_key"), "left_anti")
        val qsize = qt.join(bc(capped), Seq("term_key"), "left_anti")
          .groupBy("query_id").agg(count(lit(1)).as("_qterms"))
        perDoc.join(bc(qsize), Seq("query_id"))
          .where(col("_matched") === col("_qterms"))
      }
    TopK.perKeySalted(filtered, "query_id",
        Seq(desc("score_q"), col("doc_id")), k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("score_q").cast("double") / lit(1000000.0)).as("score"))
  }

  /** TF-IDF cosine retrieval — the classic vector-space model beside
    * BM25 (Salton & Buckley 1988): documents and queries as sparse
    * tf·idf vectors, ranked by cosine. Kept first-class because its
    * scoring is length-NORMALIZED by the full document vector (BM25 only
    * penalizes length inside the saturation term), which is the standard
    * baseline for near-duplicate-aware retrieval audits.
    *
    * One-shot form: builds the postings, searches, frees. For a
    * repeated-search deployment build [[postings]] once and call
    * [[tfidfOverPostings]] (persisting the postings; the df and norm
    * aggregations are index-build-class costs that amortize with it). */
  def tfidfSearch(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val post = postings(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = tfidfOverPostings(post, queries, k).transform(Ckpt.eager)
    post.unpersist(false)
    ranked
  }

  /** TF-IDF cosine top-`k` per query against a [[postings]] frame.
    *
    * Determinism recipe (every aggregation is EXACT integer arithmetic,
    * so results are partition- and engine-invariant):
    *  - idf quantizes to the 1e-3 grid FIRST: idfq = ⌊ln((N+1)/(df+1))
    *    ·1000 + 0.5⌋ (df = 0 for out-of-vocabulary query terms);
    *  - doc weight wq = tf·idfq and norm² = Σ wq² are exact longs (fits
    *    while Σ(tf·idfq)² < 2⁶³ per doc — at the 1e-3 grid that admits
    *    any document with < ~100 simultaneously rare AND hot terms;
    *    vocabulary-scale corpora are nowhere near it);
    *  - per-(query, doc) dot = Σ tf·idfq² sums exactly; the ONE float
    *    step is the final cosine dot/(√norm²·√qnorm²) — IEEE sqrt/div
    *    over exact integer inputs, identical in any engine — then the
    *    1e-6 score quantization that feeds the salted rank.
    *
    * Scale shape: df and norms aggregate the postings ONCE each
    * (index-build-class, amortized when the caller persists them with
    * the postings); per-search work after that is proportional to the
    * QUERIED terms' posting lists (the [[bm25OverPostings]] contract) —
    * the norm join-back is keyed by doc_id on the already-restricted
    * candidate set. Zero-norm docs (every term in every doc) and
    * zero-norm queries return no rows rather than a 0/0.
    * Output: (query_id, rank, doc_id, score). */
  def tfidfOverPostings(post: DataFrame, queries: DataFrame, k: Int,
                        broadcastQueries: Boolean = true): DataFrame = {
    val bc: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    // corpus size (1-row broadcast: the scalar-subquery plan shape)
    val stats = post.select("doc_id").distinct()
      .agg(count(lit(1)).as("n"))
    def idfq(dfCol: Column, nCol: Column): Column =
      floor(log((nCol.cast("double") + lit(1.0)) /
        (dfCol.cast("double") + lit(1.0))) * lit(1000.0) + lit(0.5))
        .cast("long")
    // full-vocabulary idf (post has one row per (doc, term) -> count = df)
    val idf = post.groupBy("term_key").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term_key"), idfq(col("df"), col("n")).as("idfq"))
    // per-doc vector norms over the FULL vocabulary (exact long Σ wq²)
    val norms = post.join(idf, "term_key")
      .select(col("doc_id"), (col("tf") * col("idfq")).as("_wq"))
      .groupBy("doc_id")
      .agg(sum(col("_wq") * col("_wq")).as("_nsq"))
    // query vectors: distinct terms at tf = 1; OOV terms take the df=0
    // idf and still count toward the query norm (they can match nothing)
    val qt = queries
      .select(col("query_id"), explode(toks(col("qtext"))).as("_qterm"))
      .select(col("query_id"), Dedup.md5Long(col("_qterm")).as("term_key"))
      .distinct()
    val qw = qt.join(idf, Seq("term_key"), "left")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term_key"),
        coalesce(col("idfq"), idfq(lit(0L), col("n"))).as("qidfq"))
    val qnorm = qw.groupBy("query_id")
      .agg(sum(col("qidfq") * col("qidfq")).as("_qnsq"))
    // restricted postings -> exact integer dot: Σ tf·idfq² per (q, doc)
    val dot = post.join(bc(qw), Seq("term_key"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("qidfq") * col("qidfq")).as("_dot"))
    val scored = dot
      .join(norms, "doc_id")
      .join(bc(qnorm), "query_id")
      .where(col("_nsq") > 0L && col("_qnsq") > 0L)
      .withColumn("_score_q",
        floor(col("_dot").cast("double") /
          (sqrt(col("_nsq").cast("double")) *
            sqrt(col("_qnsq").cast("double"))) *
          lit(1000000.0) + lit(0.5)).cast("long"))
    TopK.perKeySalted(scored, "query_id",
        Seq(desc("_score_q"), col("doc_id")), k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("_score_q").cast("double") / lit(1000000.0)).as("score"))
  }

  /** Maintained BM25 postings index: the corpus tokenize + (doc, term)
    * shuffle — the one corpus-sized cost of [[bm25]] — paid ONCE at
    * [[PostingsIndex.build]] and amortized across every later search.
    * Persisted as a catalog table BUCKETED BY `term_key` (the
    * [[BucketedStore]] discipline): the bucketing metadata tells Catalyst
    * the rows are already hash-distributed on the key, so the per-term
    * document-frequency aggregation and — in the non-broadcast query
    * regime — the term-keyed join both skip their exchanges. A new
    * session searches with zero tokenization and zero corpus reads
    * (corpus stats derive from the postings themselves; the q49
    * zero-store-read discipline, spec-gated with the corpus moved away).
    *
    * [[PostingsIndex.append]] ingests NEW documents incrementally: only
    * the new docs tokenize, and their postings land in the same bucket
    * layout. Caller contract: a doc_id is ingested at most once across
    * build + appends (re-appending a doc would double its postings —
    * dedup upstream, where the engine's dedup family already lives). */
  final class PostingsIndex(spark: org.apache.spark.sql.SparkSession,
                            table: String, buckets: Int = 32) {

    /** Tokenize `docs` and (over)write the bucketed postings table.
      * Clears any stale catalog entry AND leftover managed-table
      * directory first: the in-memory catalog forgets tables across
      * sessions but the warehouse directory survives, and saveAsTable
      * refuses to adopt an existing location. */
    def build(docs: DataFrame): Unit = {
      drop()
      val loc = new org.apache.hadoop.fs.Path(
        org.apache.spark.sql.graftbridge.Bridge
          .defaultTablePath(spark, table))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      write(postings(docs), overwrite = true)
    }

    /** Tokenize ONLY `newDocs` and add their postings to the table,
      * preserving the bucket layout (same bucketBy spec → Spark appends
      * new bucket files, never rewrites existing ones). */
    def append(newDocs: DataFrame): Unit =
      write(postings(newDocs), overwrite = false)

    private def write(post: DataFrame, overwrite: Boolean): Unit =
      post.write.mode(if (overwrite) "overwrite" else "append")
        .bucketBy(buckets, "term_key")
        .sortBy("term_key")
        .format("parquet")
        .saveAsTable(table)

    /** The persisted postings frame (lazy catalog read). */
    def postingsTable: DataFrame = spark.table(table)

    /** [[bm25OverPostings]] against the persisted table. */
    def search(queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDfFrac: Double = 1.0, requireAll: Boolean = false,
               broadcastQueries: Boolean = true): DataFrame =
      bm25OverPostings(postingsTable, queries, k, k1, b, maxDfFrac,
        requireAll, broadcastQueries)

    def exists: Boolean = spark.catalog.tableExists(table)
    def drop(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  /** Reciprocal-rank fusion over any number of per-query rankings (each a
    * (query_id, doc_id, rank) frame — BM25, ANN, whatever): fused score
    * Σ 1/(c + rank), quantized to exact 1e-9 longs via integer division
    * (1e9 div (c+rank)) so the cross-list sum is order-insensitive. A doc
    * missing from a list contributes nothing for it. Output: (query_id,
    * rank, doc_id, rrf) — the standard hybrid-search merge (c = 60 per
    * Cormack et al.). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000000L div ($c + cast(rank as bigint))").as("_rq")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum("_rq").as("rrf_q"))
    TopK.perKeySalted(fused, "query_id",
        Seq(desc("rrf_q"), col("doc_id")), k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("rrf_q").cast("double") / lit(1000000000.0)).as("rrf"))
  }
}
