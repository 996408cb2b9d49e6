package graft.queries

import graft.operators.{Ckpt, Clustering, Mixture, QualityModels, Retrieval, SimilaritySearch, Sketches}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 widening of the training-pipeline surface: lexical (BM25) and
  * hybrid retrieval, model-shaped quality scoring (hashed linear
  * classifier, bigram-LM perplexity), full-corpus distributed k-means,
  * and temperature-weighted source mixing — q58..q63, each with a DuckDB
  * oracle that replays the engine's integer/quantized arithmetic
  * end-to-end (the same determinism discipline as the ANN trainers). */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q58: BM25 keyword retrieval — three fixed queries (one with the
    // rare discriminative term 'dup') over the documents corpus.
    "q58_bm25" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((0L, "dup merge scan"), (1L, "spark window agg"),
        (2L, "vector join fast")).toDF("query_id", "qtext")
      Retrieval.bm25(par(Tables.documents(s, d)), qs, 10)
        .orderBy("query_id", "rank")
    }),

    // Q93: TF-IDF cosine retrieval — the classic vector-space ranking
    // beside q58's BM25: full-document-norm cosine over quantized-idf
    // sparse vectors, same query set, top-10 per query.
    "q93_tfidf" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((0L, "dup merge scan"), (1L, "spark window agg"),
        (2L, "vector join fast")).toDF("query_id", "qtext")
      Retrieval.tfidfSearch(par(Tables.documents(s, d)), qs, 10)
        .orderBy("query_id", "rank")
    }),

    // Q87: exact phrase search over positional postings — set-wise
    // positional-list merge (slot-aligned start votes, one aggregation),
    // top-10 docs per phrase by occurrence count. Phrase 3 repeats a
    // token ("table table") to witness the repeated-slot handling.
    "q87_phrase_search" -> ((s, d) => {
      import s.implicits._
      val phrases = Seq((1L, "table hash"), (2L, "slow hash batch"),
        (3L, "table table")).toDF("phrase_id", "ptext")
      val post = Retrieval.positionalPostings(par(Tables.documents(s, d)))
      Retrieval.phraseSearch(post, phrases, 10)
        .select(col("phrase_id"), col("rank"), col("doc_id"),
          col("n_occurrences"))
        .orderBy("phrase_id", "rank")
    }),

    // Q88: proximity search — docs where a term pair co-occurs within 3
    // tokens, scored by qualifying position pairs. The range join runs
    // as a pigeonhole bucket equi-join (Σ bucket², never positions²).
    "q88_proximity_search" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((1L, "table", "hash"), (2L, "spark", "window"),
        (3L, "vector", "join")).toDF("query_id", "term_a", "term_b")
      val post = Retrieval.positionalPostings(par(Tables.documents(s, d)))
      Retrieval.proximitySearch(post, qs, window = 3, k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_pairs"))
        .orderBy("query_id", "rank")
    }),

    // Q59: hybrid retrieval — BM25 more-like-this (query = docs 0..2) and
    // exact vector kNN (query = embeddings 0..2) fused by reciprocal-rank
    // fusion. Both rankings at k=20, fused top-10.
    "q59_hybrid_rrf" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val qdocs = docs.where(col("doc_id") < 3)
        .select(col("doc_id").cast("long").as("query_id"),
          col("text").as("qtext"))
      val lex = Retrieval.bm25(docs, qdocs, 20)
        .select("query_id", "doc_id", "rank")
      // NO par() here, matching the exact-kNN siblings (q15/q40): the
      // broadcast-side cross join gives each corpus partition the whole
      // query set, so single-source-partition parallelism only matters
      // when the corpus scan itself is the bottleneck — measured at
      // bench scale the repartition costs ~0.9s and buys nothing
      val emb = Tables.embeddings(s, d)
      val vq = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      val vec = SimilaritySearch.topK(vq, corpus, 20)
        .select(col("query_id"), col("id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, vec), 10)
        .orderBy("query_id", "rank")
    }),

    // Q60: hashing-trick linear classifier inference (the fastText-filter
    // shape) with md5-derived integer weights — exact long margins.
    "q60_quality_classifier" -> ((s, d) =>
      QualityModels.hashedLinearScore(par(Tables.documents(s, d)))
        .withColumn("score", r4(col("score")))
        .orderBy("doc_id")),

    // Q61: add-one bigram LM scoring — counts trained on the
    // doc_id % 97 != 0 slice (the q53 split), every doc scored by mean
    // bigram log-prob (quantized-long summation).
    "q61_lm_score" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val train = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
      QualityModels.bigramLmScore(train, docs)
        .withColumn("avg_logprob", r4(col("avg_logprob")))
        .orderBy("doc_id")
    }),

    // Q62: distributed full-corpus spherical k-means (8 cells, 3 Lloyd
    // rounds) over the embeddings table — the corpus-scale IVF trainer.
    "q62_kmeans" -> ((s, d) =>
      Clustering.kmeansAssign(par(Tables.embeddings(s, d)),
          nCells = 8, iters = 3)
        .select(col("vec_id"), col("cell"), r4(col("sim")).as("sim"))
        .orderBy("vec_id")),

    // Q79: embedding outlier audit — the q62 clustering, then each
    // cell's bottom-5 by centroid cosine (salted two-phase rank): the
    // least-prototypical members a curation pass reviews or drops
    // (the flip side of SemDeDup's prune-the-redundant).
    "q79_embedding_outliers" -> ((s, d) =>
      Clustering.cellOutliers(par(Tables.embeddings(s, d)),
          nCells = 8, iters = 3, perCell = 5)
        .select(col("vec_id"), col("cell"), r4(col("sim")).as("sim"),
          col("rank"))
        .orderBy("cell", "rank")),

    // Q94: cluster-balanced (diversity) sampling — the q62 clustering,
    // then up to 5 members per cell by the deterministic md5 ppm draw:
    // every semantic region gets a bounded budget share (the selection
    // counterpart of SemDeDup's within-region pruning).
    "q94_cluster_sample" -> ((s, d) =>
      Clustering.clusterBalancedSample(par(Tables.embeddings(s, d)),
          nCells = 8, iters = 3, perCell = 5)
        .select(col("vec_id"), col("cell"), r4(col("sim")).as("sim"),
          col("draw"), col("rank"))
        .orderBy("cell", "rank")),

    // Q63: temperature-0.5 source mixing under a 20k-subtoken budget —
    // deterministic md5-keyed keep test per source rate.
    "q63_source_mixture" -> ((s, d) =>
      QualityModels.sourceMixtureSample(par(Tables.documents(s, d)),
          tokenBudget = 20000L)
        .withColumn("rate", r4(col("rate")))
        .orderBy("doc_id")),

    // Q104: explicit-weight epoch plan WITH UPSAMPLING — the mixing-law
    // step q63's keep-test cannot express (copies > 1): 4 weighted
    // sources, 200k-token epoch; small sources repeat target div total
    // times, the md5-prefix covering the remainder gets one extra copy.
    "q104_epoch_plan" -> ((s, d) =>
      Mixture.epochPlan(par(Tables.documents(s, d)),
          weightsPpm = Map("src0" -> 400000L, "src1" -> 300000L,
            "src2" -> 200000L, "src3" -> 100000L),
          tokenBudget = 200000L)
        .orderBy("doc_id")),

    // Q105: deterministic global shuffle order — dense 1..N positions
    // by salted md5 key (globalDenseRank: range partition +
    // per-partition pass, no single-task window), the reproducible
    // stand-in for orderBy(rand()) over training sequences.
    "q105_shuffled_order" -> ((s, d) =>
      // ids-only projection: the rank pass is a mapPartitions (no column
      // pruning through it), so text must not ride the range shuffle
      Mixture.shuffledOrder(
          par(Tables.documents(s, d)).select("doc_id"), "doc_id")
        .select("doc_id", "pos")
        .orderBy("doc_id")),

    // Q112: epoch SHARD assignment — contiguous ranges of the q105
    // shuffle order split into 8 near-equal shards with exact integer
    // boundaries (shard s holds pos-1 in [ceil(sN/8), ceil((s+1)N/8)));
    // the artifact a dataloader mounts one rank per shard.
    // writeEpochShards materializes the directories + audit manifest
    // (spec-gated byte-identical across re-runs); the declared query
    // hashes the assignment itself.
    "q112_epoch_shards" -> ((s, d) =>
      Mixture.epochShardAssignment(
          par(Tables.documents(s, d)).select("doc_id"), "doc_id",
          shards = 8)
        .select("doc_id", "pos", "shard", "pos_in_shard")
        .orderBy("doc_id")),

    // Q82: deterministic 80/10/10 split assignment — the md5-keyed ppm
    // draw (the q63 keyed-rate discipline), so any engine reproduces
    // the identical train/val/test membership (randomSplit cannot: its
    // sampling depends on partition layout).
    "q82_split_assignment" -> ((s, d) =>
      graft.operators.TextAnalysis.assignSplit(
          par(Tables.documents(s, d)), "doc_id",
          Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),

    // Q106: per-split publish manifest — counts, id bounds, and two
    // ORDER-INVARIANT checksums (sums of 56-bit md5 keys mod 2^56):
    // id_checksum catches membership drift, content_checksum binds each
    // id to its exact bytes. The reproducibility audit a publish step
    // emits beside the data.
    "q106_dataset_manifest" -> ((s, d) =>
      graft.operators.Pipeline.datasetManifest(
          graft.operators.TextAnalysis.assignSplit(
            par(Tables.documents(s, d)), "doc_id",
            Seq(("train", 800000L), ("val", 100000L), ("test", 100000L))),
          groupCol = "split")
        .orderBy("split")),

    // Q107: record-level corpus diff — documents vs a deterministically
    // perturbed republish (every %37 doc edited, every %53 doc removed,
    // every %61 doc re-added under a shifted id): one row per drifted
    // id with added/removed/changed status, unchanged rows dropped.
    "q107_corpus_diff" -> ((s, d) => {
      val before = par(Tables.documents(s, d))
      val edited = before.withColumn("text",
        when(pmod(col("doc_id"), lit(37)) === 0,
          concat(col("text"), lit(" x"))).otherwise(col("text")))
      val after = edited.where(pmod(col("doc_id"), lit(53)) =!= 0)
        .unionByName(before.where(pmod(col("doc_id"), lit(61)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000000L))
      graft.operators.Pipeline.corpusDiff(before, after)
        .orderBy("doc_id")
    }),

    // Q90: the END-TO-END curation funnel — langid gate → classifier
    // margin gate → exact dedup → eval-suite decontamination → split
    // draw, composed from the stage operators q21/q60/q18/q53/q82 prove
    // one by one. The oracle replays the WHOLE funnel in SQL, so the
    // surviving manifest (doc_id, split, n_tokens) hash-matches only if
    // every stage decision AND their composition order agree bit-for-bit.
    "q90_curation_pipeline" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val eval = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val cand = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
      graft.operators.Pipeline.curate(cand, eval).orderBy("doc_id")
    }),

    // Q92: the q90 funnel read as ACCOUNTING — one row per stage with
    // the documents (and tokens) removed there, plus 'kept'; attribution
    // is first-stage-wins, so the rows partition the candidate slice.
    "q92_curation_funnel" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val eval = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val cand = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
      graft.operators.Pipeline.funnelStats(cand, eval).orderBy("stage")
    }),

    // Q64: KMV (bottom-k) distinct-count sketch — approximate distinct
    // texts per language with a DETERMINISTIC estimator any engine
    // replays (unlike HLL++), k = 64.
    "q64_kmv_distinct" -> ((s, d) =>
      Sketches.kmvDistinct(par(Tables.documents(s, d)), "lang",
          col("text"), k = 64)
        .withColumn("estimate", r4(col("estimate")))
        .orderBy("lang")),

    // Q86: HyperLogLog distinct-token profile per language — the
    // register sketch beside q64's KMV (HLL is the merge-anywhere shape
    // a 100 TB profile ships: 256 registers per group, map-side max).
    // Exact integer indicator sum + an ln-free raw estimate replayed
    // bit-for-bit, with the true distinct count beside it.
    "q86_hll_distinct" -> ((s, d) => {
      // localCheckpoint: the token explode feeds the registers AND the
      // exact-distinct audit column
      val toks = par(Tables.documents(s, d))
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .transform(Ckpt.eager)
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(toks, "lang", col("w")), "lang")
      val exact = toks.groupBy("lang")
        .agg(count_distinct(col("w")).as("exact_distinct"))
      est.join(exact, "lang")
        .withColumn("estimate", r4(col("estimate")))
        .orderBy("lang")
    }),

    // Q76: count-min heavy-hitter audit — build the (4 × 1024)-cell CMS
    // over every token occurrence in the corpus, then point-query it for
    // the 20 most frequent tokens and report estimate beside truth (the
    // one-pass mergeable frequency table a 100 TB profile ships instead
    // of a full token groupBy; est_cnt ≥ true_cnt always, and the oracle
    // rebuilds the identical sketch from the same md5/affine hashes).
    "q76_cms_heavy_hitters" -> ((s, d) => {
      // localCheckpoint: toks feeds the sketch build AND the true-count
      // agg, and top is referenced twice — without pinning, the corpus
      // scan + explode re-runs per subtree
      val toks = par(Tables.documents(s, d))
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .transform(Ckpt.eager)
      val sketch = Sketches.countMin(toks, col("w"))
      val top = toks.groupBy("w").agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("w")).limit(20)
        .transform(Ckpt.eager)
      Sketches.countMinEstimate(sketch, top, "w")
        .join(top, Seq("w"))
        .select(col("w").as("token"), col("true_cnt"), col("est_cnt"))
        .orderBy("token")
    }),

    // Q78: deterministic Bloom membership — build the bit-set filter
    // over a quarter of the corpus (doc_id % 4 = 0), probe EVERY doc.
    // mBits = 512 / k = 3 is sized to force false positives, which are
    // part of the contract here: the md5/affine hashes make the FP SET
    // deterministic, so the oracle reproduces every answer bit-for-bit
    // (spark.stat.bloomFilter's opaque seeds never could).
    "q78_bloom_membership" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val bloom = Sketches.bloomBits(
        docs.where(pmod(col("doc_id"), lit(4)) === 0), col("text"),
        mBits = 512, k = 3)
      Sketches.bloomMightContain(bloom, docs, "text", mBits = 512, k = 3)
        .join(docs.select("doc_id", "text"), Seq("text"))
        .select(col("doc_id"), col("might_contain"))
        .orderBy("doc_id")
    }),

    // Q67: deterministic histogram-quantile profile — text-length
    // quantiles per language via fixed 8-px buckets + exact counts +
    // integer rank targets (the t-digest replacement an oracle CAN
    // replay; percentile_approx never could).
    "q67_hist_quantiles" -> ((s, d) =>
      Sketches.histogramQuantiles(par(Tables.documents(s, d)), "lang",
          length(col("text")), 0.0, 2048.0, 256,
          Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("lang", "q")),

    // Q80: adaptive per-source quality gate (the CCNet-style per-domain
    // cut): score every doc with the hashed classifier (exact long
    // margins, the q60 chain), derive each source's P25 margin from the
    // deterministic histogram-quantile sketch (bounded agg — no
    // corpus-scale sort per stratum), and keep docs STRICTLY ABOVE the
    // cutoff bucket's upper edge (deterministic to bucket granularity;
    // integer margins vs exact-gridded edges, so the comparison replays
    // bit-for-bit).
    "q80_adaptive_quality" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      // localCheckpoint: scored feeds the quantile sketch AND the final
      // cutoff join — without pinning, the tokenize+explode+agg chain
      // runs twice (the q76 lesson)
      val scored = QualityModels.hashedLinearScore(docs)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select("doc_id", "source", "margin_q")
        .transform(Ckpt.eager)
      val cuts = Sketches.histogramQuantiles(scored, "source",
          col("margin_q"), -1.0e8, 1.0e8, 2000, Seq(0.25))
        .select(col("source"), col("value_le").as("cutoff"))
      scored.join(broadcast(cuts), Seq("source"))
        .where(col("margin_q").cast("double") > col("cutoff"))
        .select(col("doc_id"), col("source"), col("margin_q"),
          col("cutoff"))
        .orderBy("doc_id")
    }),

    // Q66: BM25 over the PERSISTED postings index — certifies the whole
    // maintained-postings lifecycle in one key: bucketed build from half
    // the corpus, incremental append of the other half, then search
    // serving purely from the catalog table (zero corpus re-tokenize).
    // The oracle replays the same scoring over the full corpus, so a
    // build/append path that lost or doubled any posting hash-mismatches.
    "q66_bm25_postings" -> ((s, d) => {
      import s.implicits._
      val docs = par(Tables.documents(s, d))
      val idx = new Retrieval.PostingsIndex(s, "graft_q66_postings")
      idx.build(docs.where(pmod(col("doc_id"), lit(2)) === 0))
      idx.append(docs.where(pmod(col("doc_id"), lit(2)) === 1))
      val qs = Seq((0L, "dup scan fast"), (1L, "agg merge window"),
        (2L, "spark vector join")).toDF("query_id", "qtext")
      idx.search(qs, 10).orderBy("query_id", "rank")
    })
  )


  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
  private def key56(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 14)) AS BIGINT)"

  /** The shared q90/q92 curation-funnel CTE chain over `documents`:
    * candidates = the %97<>0 slice, eval suite = the %97==0 slice.
    * Ends with `dd` (dedup survivors, with toks) and `dirty`
    * (contaminated survivor ids); `tk`/`lid`/`qf` stay visible for the
    * q92 stage attribution. Multi-consumer CTEs are MATERIALIZED —
    * DuckDB inlines per consumer otherwise and the chain re-derives
    * exponentially. */
  private val curationChainSql: String = {
    val gk = "CAST(concat('0x', substr(md5(list_aggregate(" +
      "toks[i:i+3], 'string_agg', ' ')), 1, 14)) AS BIGINT)"
    s"""tk AS MATERIALIZED (SELECT doc_id, text,
      |    $toksSql AS toks FROM documents),
      |lc AS (SELECT doc_id, text, toks,
      |    len(list_filter(toks, t -> t IN ('the','and','of','to'))) AS en_cnt,
      |    len(list_filter(toks, t -> t IN ('der','und','die','das'))) AS de_cnt,
      |    len(list_filter(toks, t -> t IN ('le','la','et','les'))) AS fr_cnt,
      |    len(list_filter(toks, t -> t IN ('el','los','que','y'))) AS es_cnt,
      |    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS non_ascii
      |  FROM tk WHERE doc_id % 97 <> 0),
      |lid AS MATERIALIZED (SELECT doc_id, text, toks FROM lc
      |  WHERE non_ascii = 0 AND en_cnt >= de_cnt
      |    AND en_cnt >= fr_cnt AND en_cnt >= es_cnt),
      |mg AS (SELECT l.doc_id,
      |    CAST(sum((${key56(s"'w' || (${key56("t")} % 256)")}
      |      % 2000001) - 1000000) AS BIGINT) AS margin_q
      |  FROM lid l, UNNEST(l.toks) AS u(t) GROUP BY l.doc_id),
      |qf AS MATERIALIZED (SELECT l.doc_id, l.text, l.toks FROM lid l
      |  JOIN mg USING (doc_id) WHERE mg.margin_q >= 0),
      |dd AS MATERIALIZED (SELECT doc_id, text, toks FROM (
      |    SELECT qf.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
      |    FROM qf) WHERE doc_id = keep),
      |g AS (SELECT d.doc_id, $gk AS gk
      |  FROM dd d, UNNEST(range(1, len(toks) - 2)) AS t(i)),
      |tg AS MATERIALIZED (SELECT DISTINCT $gk AS gk
      |  FROM tk, UNNEST(range(1, len(toks) - 2)) AS t(i)
      |  WHERE doc_id % 97 = 0),
      |dirty AS MATERIALIZED (SELECT DISTINCT g.doc_id FROM g
      |  JOIN tg USING (gk))""".stripMargin
  }

  /** Shared BM25 replay: postings/stats/df/score CTEs over `documents`,
    * parameterized by the query-terms CTE body. Ends with `bm(query_id,
    * doc_id, score_q, rank)`. Constants are interpolated from the SAME
    * JVM arithmetic the operator uses (k1=1.2, b=0.75), so both engines
    * evaluate identical doubles. */
  private def bm25Ctes(qtSql: String): String =
    s"""tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
      |post AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
      |    ${key56("t")} AS term_key, count(*) AS tf
      |  FROM tk, UNNEST(toks) AS u(t)
      |  GROUP BY doc_id, dl, term_key),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(dl) AS BIGINT) AS tot
      |  FROM (SELECT doc_id, any_value(dl) AS dl FROM post GROUP BY doc_id)),
      |qt AS ($qtSql),
      |qk AS (SELECT DISTINCT query_id, ${key56("term")} AS term_key FROM qt),
      |dfreq AS (SELECT term_key, count(*) AS df FROM post
      |  WHERE term_key IN (SELECT DISTINCT term_key FROM qk)
      |  GROUP BY term_key),
      |bsc AS (
      |  SELECT qk.query_id, p.doc_id,
      |    CAST(floor(
      |      ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (p.tf * ${1.2 + 1.0})
      |        / (p.tf + (${1.2 * (1 - 0.75)} + ${1.2 * 0.75} * p.dl
      |            / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS cq
      |  FROM post p
      |  JOIN qk ON p.term_key = qk.term_key
      |  JOIN dfreq d ON d.term_key = p.term_key
      |  CROSS JOIN stats s),
      |bagg AS (SELECT query_id, doc_id, CAST(sum(cq) AS BIGINT) AS score_q
      |  FROM bsc GROUP BY query_id, doc_id),
      |bm AS (SELECT query_id, doc_id, score_q,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY score_q DESC, doc_id) AS INTEGER) AS rank
      |  FROM bagg)""".stripMargin

  private val q58Qt: String =
    """SELECT CAST(v.query_id AS BIGINT) AS query_id, v.term
      |  FROM (VALUES (0, 'dup'), (0, 'merge'), (0, 'scan'),
      |    (1, 'spark'), (1, 'window'), (1, 'agg'),
      |    (2, 'vector'), (2, 'join'), (2, 'fast')) v(query_id, term)""".stripMargin

  /** q62 iteration CTEs, q35-style but over the FULL corpus `dz`. */
  private[queries] def kmeansIter(t: Int): String = kmeansIter(t, "dz")

  /** One unrolled Lloyd round over trainer source `src` (default the
    * full `dz` grid CTE; q119 trains on the base-only slice `dzb` to
    * replay the FROZEN-centroid contract). */
  private[queries] def kmeansIter(t: Int, src: String): String = {
    val dot = (a: String, b: String) =>
      s"list_sum(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]))"
    s"""a$t AS (
      |  SELECT vec_id, qv, cell FROM (
      |    SELECT d.vec_id, d.qv, c.cell,
      |      row_number() OVER (PARTITION BY d.vec_id
      |        ORDER BY ${dot("d.dv", "c.cv")} DESC, c.cell) AS rnk
      |    FROM $src d CROSS JOIN c${t - 1} c) x
      |  WHERE rnk = 1),
      |s$t AS (
      |  SELECT cell, ii.i, CAST(sum(qv[ii.i + 1]) AS BIGINT) AS sq,
      |    count(*) AS cnt
      |  FROM a$t, (SELECT unnest(range(0, 64)) AS i) ii
      |  GROUP BY cell, ii.i),
      |m$t AS (
      |  SELECT cell,
      |    list(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE) / 1024.0
      |      ORDER BY i) AS mv
      |  FROM s$t GROUP BY cell),
      |c$t AS MATERIALIZED (
      |  SELECT p.cell,
      |    CASE WHEN m.cell IS NULL
      |           OR sqrt(list_sum(list_transform(m.mv, x -> x * x))) = 0
      |      THEN p.cv
      |      ELSE list_transform(m.mv, x ->
      |        x / sqrt(list_sum(list_transform(m.mv, y -> y * y))))
      |    END AS cv
      |  FROM c${t - 1} p LEFT JOIN m$t m ON m.cell = p.cell)""".stripMargin
  }

  private val q66Qt: String =
    """SELECT CAST(v.query_id AS BIGINT) AS query_id, v.term
      |  FROM (VALUES (0, 'dup'), (0, 'scan'), (0, 'fast'),
      |    (1, 'agg'), (1, 'merge'), (1, 'window'),
      |    (2, 'spark'), (2, 'vector'), (2, 'join')) v(query_id, term)""".stripMargin

  /** The q62 k-means replay chain (normalize → 1/1024 grid → 8
    * lowest-id init centroids → 3 unrolled Lloyd rounds → final argmax
    * assignment `af(vec_id, cell, d)`) — shared by q62 and the q79
    * outlier ranking. */
  private val kmeansChainSql: String =
    s"""nrm AS MATERIALIZED (
        |  SELECT vec_id, list_transform(range(0, 64), i ->
        |    CAST(CAST(embedding[i+1] AS DOUBLE)
        |      / sqrt(list_sum(list_transform(range(0, 64), j ->
        |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
        |      AS REAL)) AS v
        |  FROM embeddings
        |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
        |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
        |dz AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(v, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv,
        |    list_transform(list_transform(v, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)),
        |      q -> CAST(q AS DOUBLE) / 1024.0) AS dv
        |  FROM nrm),
        |c0 AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, dv AS cv
        |  FROM (SELECT vec_id, dv FROM dz ORDER BY vec_id LIMIT 8)),
        |${(1 to 3).map(kmeansIter).mkString(",\n")},
        |af AS (
        |  SELECT vec_id, cell, d FROM (
        |    SELECT d.vec_id, c.cell,
        |      list_sum(list_transform(range(0, 64), i ->
        |        d.dv[i+1] * c.cv[i+1])) AS d,
        |      row_number() OVER (PARTITION BY d.vec_id
        |        ORDER BY list_sum(list_transform(range(0, 64), i ->
        |          d.dv[i+1] * c.cv[i+1])) DESC, c.cell) AS rnk
        |    FROM dz d CROSS JOIN c3 c) x
        |  WHERE rnk = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q58_bm25" ->
      s"""WITH ${bm25Ctes(q58Qt)}
        |SELECT query_id, rank, doc_id,
        |  CAST(score_q AS DOUBLE) / 1000000.0 AS score
        |FROM bm WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q93: tf-idf cosine replay — idf quantized to 1e-3 longs FIRST,
    // every aggregation (doc norms, query norms, dots) exact integer
    // sums; the one float step is the final cosine + 1e-6 quantization
    "q93_tfidf" ->
      s"""WITH tk AS MATERIALIZED (SELECT doc_id, $toksSql AS toks
        |  FROM documents),
        |post AS MATERIALIZED (SELECT doc_id, ${key56("t")} AS term_key,
        |    count(*) AS tf
        |  FROM tk, UNNEST(toks) AS u(t) GROUP BY doc_id, term_key),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM post),
        |dfq AS (SELECT term_key, count(*) AS dfc FROM post
        |  GROUP BY term_key),
        |idf AS MATERIALIZED (SELECT term_key,
        |    CAST(floor(ln((nn.n + 1.0) / (dfc + 1.0)) * 1000.0 + 0.5)
        |      AS BIGINT) AS idfq
        |  FROM dfq, nn),
        |norms AS MATERIALIZED (SELECT doc_id,
        |    CAST(sum((tf * idfq) * (tf * idfq)) AS BIGINT) AS nsq
        |  FROM post JOIN idf USING (term_key) GROUP BY doc_id),
        |q(query_id, qtext) AS (VALUES (0, 'dup merge scan'),
        |  (1, 'spark window agg'), (2, 'vector join fast')),
        |qt AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id,
        |    ${key56("t")} AS term_key
        |  FROM q, UNNEST(regexp_split_to_array(trim(qtext), '\\s+'))
        |    AS u(t)),
        |qw AS MATERIALIZED (SELECT qt.query_id, qt.term_key,
        |    coalesce(idf.idfq,
        |      (SELECT CAST(floor(ln(n + 1.0) * 1000.0 + 0.5) AS BIGINT)
        |       FROM nn)) AS qidfq
        |  FROM qt LEFT JOIN idf USING (term_key)),
        |qn AS (SELECT query_id,
        |    CAST(sum(qidfq * qidfq) AS BIGINT) AS qnsq
        |  FROM qw GROUP BY query_id),
        |dt AS (SELECT qw.query_id, post.doc_id,
        |    CAST(sum(post.tf * qw.qidfq * qw.qidfq) AS BIGINT) AS dq
        |  FROM post JOIN qw USING (term_key)
        |  GROUP BY qw.query_id, post.doc_id),
        |sc AS (SELECT dt.query_id, dt.doc_id,
        |    CAST(floor(CAST(dq AS DOUBLE)
        |        / (sqrt(CAST(nsq AS DOUBLE)) * sqrt(CAST(qnsq AS DOUBLE)))
        |        * 1000000.0 + 0.5) AS BIGINT) AS score_q
        |  FROM dt
        |  JOIN norms USING (doc_id)
        |  JOIN qn USING (query_id)
        |  WHERE nsq > 0 AND qnsq > 0),
        |r AS (SELECT query_id, doc_id, score_q,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_q DESC, doc_id) AS INTEGER) AS rank
        |  FROM sc)
        |SELECT query_id, rank, doc_id,
        |  CAST(score_q AS DOUBLE) / 1000000.0 AS score
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q87: per-phrase array scan — every start position whose aligned
    // tokens all match counts one occurrence (overlaps included), then
    // rank by count.
    "q87_phrase_search" ->
      """WITH tk AS MATERIALIZED (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |occ AS (
        |  SELECT 1 AS phrase_id, doc_id, count(*) AS n_occurrences
        |  FROM tk, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE t[i] = 'table' AND t[i+1] = 'hash' GROUP BY doc_id
        |  UNION ALL
        |  SELECT 2, doc_id, count(*)
        |  FROM tk, UNNEST(range(1, len(t) - 1)) AS u(i)
        |  WHERE t[i] = 'slow' AND t[i+1] = 'hash' AND t[i+2] = 'batch'
        |  GROUP BY doc_id
        |  UNION ALL
        |  SELECT 3, doc_id, count(*)
        |  FROM tk, UNNEST(range(1, len(t))) AS u(i)
        |  WHERE t[i] = 'table' AND t[i+1] = 'table' GROUP BY doc_id),
        |rk AS (SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
        |    CAST(n_occurrences AS BIGINT) AS n_occurrences,
        |    CAST(row_number() OVER (PARTITION BY phrase_id
        |      ORDER BY n_occurrences DESC, doc_id) AS INTEGER) AS rank
        |  FROM occ)
        |SELECT phrase_id, rank, doc_id, n_occurrences
        |FROM rk WHERE rank <= 10 ORDER BY phrase_id, rank""".stripMargin,

    // q88: naive per-doc position cross product (the oracle can afford
    // positions² per doc; the engine's bucket join replays it exactly).
    "q88_proximity_search" ->
      """WITH tk AS MATERIALIZED (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |pos AS MATERIALIZED (SELECT doc_id, i, t[i] AS w
        |  FROM tk, UNNEST(range(1, len(t) + 1)) AS u(i)),
        |occ AS (
        |  SELECT 1 AS query_id, a.doc_id, count(*) AS n_pairs
        |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |  WHERE a.w = 'table' AND b.w = 'hash' AND abs(a.i - b.i) <= 3
        |  GROUP BY a.doc_id
        |  UNION ALL
        |  SELECT 2, a.doc_id, count(*)
        |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |  WHERE a.w = 'spark' AND b.w = 'window' AND abs(a.i - b.i) <= 3
        |  GROUP BY a.doc_id
        |  UNION ALL
        |  SELECT 3, a.doc_id, count(*)
        |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
        |  WHERE a.w = 'vector' AND b.w = 'join' AND abs(a.i - b.i) <= 3
        |  GROUP BY a.doc_id),
        |rk AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |    CAST(n_pairs AS BIGINT) AS n_pairs,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY n_pairs DESC, doc_id) AS INTEGER) AS rank
        |  FROM occ)
        |SELECT query_id, rank, doc_id, n_pairs
        |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q66: the oracle is persistence-blind — it rebuilds the identical
    // postings from the full corpus; the Spark side must reproduce them
    // through build(half) + append(half) + catalog reload
    "q66_bm25_postings" ->
      s"""WITH ${bm25Ctes(q66Qt)}
        |SELECT query_id, rank, doc_id,
        |  CAST(score_q AS DOUBLE) / 1000000.0 AS score
        |FROM bm WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q67: replay the fixed-boundary buckets, exact cumulative counts
    // and INTEGER rank targets — every arithmetic step identical
    "q67_hist_quantiles" ->
      """WITH h AS (
        |  SELECT lang,
        |    CAST(least(255, greatest(0,
        |      floor((CAST(length(text) AS DOUBLE) - 0.0) / 2048.0 * 256.0)))
        |      AS INTEGER) AS bucket,
        |    count(*) AS cnt
        |  FROM documents GROUP BY lang, bucket),
        |c AS (SELECT lang, bucket, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total
        |  FROM h),
        |q AS (SELECT unnest([250000, 500000, 900000, 990000]) AS q_q),
        |sel AS (
        |  SELECT c.lang, q.q_q, min(c.bucket) AS bucket
        |  FROM c, q
        |  WHERE c.cum >= (q.q_q * c.total + 999999) // 1000000
        |  GROUP BY c.lang, q.q_q),
        |j AS (SELECT s.lang, s.q_q, s.bucket, c.cum, c.total
        |  FROM sel s JOIN c ON c.lang = s.lang AND c.bucket = s.bucket)
        |SELECT lang, CAST(q_q AS DOUBLE) / 1000000.0 AS q, bucket,
        |  0.0 + 2048.0 * (bucket + 1) / 256.0 AS value_le, cum, total
        |FROM j ORDER BY lang, q""".stripMargin,

    // q80: the q60 margin chain joined to sources, the q67 histogram /
    // integer-rank-target quantile replay at [-1e8, 1e8) x 2000 buckets,
    // then the strictly-above-cutoff filter — every stage is a formula
    // already proven by its own query; q80 proves the COMPOSITION
    "q80_adaptive_quality" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        |b AS (SELECT doc_id, ${key56("term")} % 256 AS bkt FROM t),
        |w AS (SELECT doc_id,
        |  (${key56("'w' || bkt")} % 2000001) - 1000000 AS wq FROM b),
        |a AS (SELECT doc_id, CAST(sum(wq) AS BIGINT) AS margin_q
        |  FROM w GROUP BY doc_id),
        |sc AS MATERIALIZED (SELECT a.doc_id, d.source, a.margin_q
        |  FROM a JOIN documents d USING (doc_id)),
        |h AS (SELECT source,
        |    CAST(least(1999, greatest(0,
        |      floor((CAST(margin_q AS DOUBLE) + 100000000.0)
        |        / 200000000.0 * 2000.0))) AS INTEGER) AS bucket,
        |    count(*) AS cnt
        |  FROM sc GROUP BY source, bucket),
        |c AS (SELECT source, bucket,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY bucket)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
        |  FROM h),
        |sel AS (SELECT source, min(bucket) AS bucket
        |  FROM c WHERE cum >= (250000 * total + 999999) // 1000000
        |  GROUP BY source),
        |cut AS (SELECT source,
        |  -100000000.0 + 200000000.0 * (bucket + 1) / 2000.0 AS cutoff
        |  FROM sel)
        |SELECT sc.doc_id, sc.source, sc.margin_q, cut.cutoff
        |FROM sc JOIN cut USING (source)
        |WHERE CAST(sc.margin_q AS DOUBLE) > cut.cutoff
        |ORDER BY doc_id""".stripMargin,

    "q59_hybrid_rrf" ->
      s"""WITH ${bm25Ctes(
          "SELECT doc_id AS query_id, unnest(toks) AS term FROM tk WHERE doc_id < 3")},
        |nv AS (
        |  SELECT vec_id, list_transform(range(0, 64), i ->
        |    CAST(CAST(embedding[i+1] AS DOUBLE)
        |      / sqrt(list_sum(list_transform(range(0, 64), j ->
        |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
        |      AS REAL)) AS v
        |  FROM embeddings
        |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
        |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
        |vs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |    list_sum(list_transform(range(0, 64), i ->
        |      CAST(q.v[i+1] AS DOUBLE) * CAST(c.v[i+1] AS DOUBLE))) AS sim
        |  FROM nv q, nv c WHERE q.vec_id < 3),
        |vr AS (
        |  SELECT query_id, doc_id, sim, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY sim DESC, doc_id) AS INTEGER) AS rank
        |  FROM vs),
        |contrib AS (
        |  SELECT query_id, doc_id, 1000000000 // (60 + rank) AS rq
        |  FROM bm WHERE rank <= 20
        |  UNION ALL
        |  SELECT query_id, doc_id, 1000000000 // (60 + rank) AS rq
        |  FROM vr WHERE rank <= 20 AND sim > 0),
        |fused AS (SELECT query_id, doc_id, CAST(sum(rq) AS BIGINT) AS rrf_q
        |  FROM contrib GROUP BY query_id, doc_id),
        |fr AS (SELECT query_id, doc_id, rrf_q,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_q DESC, doc_id) AS INTEGER) AS rank
        |  FROM fused)
        |SELECT query_id, rank, doc_id,
        |  CAST(rrf_q AS DOUBLE) / 1000000000.0 AS rrf
        |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q60_quality_classifier" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        |b AS (SELECT doc_id, ${key56("term")} % 256 AS bkt FROM t),
        |w AS (SELECT doc_id,
        |  (${key56("'w' || bkt")} % 2000001) - 1000000 AS wq FROM b),
        |a AS (SELECT doc_id, CAST(sum(wq) AS BIGINT) AS margin_q,
        |  count(*) AS n_tokens FROM w GROUP BY doc_id)
        |SELECT doc_id, n_tokens, margin_q,
        |  ${r4sql("1.0 / (1.0 + exp(-(CAST(margin_q AS DOUBLE) / 1000000.0 / n_tokens)))")} AS score,
        |  CASE WHEN margin_q >= 0 THEN 1 ELSE 0 END AS label
        |FROM a ORDER BY doc_id""".stripMargin,

    "q61_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |bi AS (SELECT doc_id,
        |    ${key56("toks[i] || ' ' || toks[i+1]")} AS bk,
        |    ${key56("toks[i]")} AS uk
        |  FROM tk, UNNEST(range(1, len(toks))) AS t(i)),
        |c2 AS (SELECT bk, count(*) AS c2 FROM bi
        |  WHERE doc_id % 97 <> 0 GROUP BY bk),
        |c1 AS (SELECT ${key56("t")} AS uk, count(*) AS c1
        |  FROM tk, UNNEST(toks) AS u(t)
        |  WHERE doc_id % 97 <> 0 GROUP BY uk),
        |vv AS (SELECT count(*) AS v FROM c1),
        |sc AS (SELECT b.doc_id,
        |    CAST(floor(ln((coalesce(c2.c2, 0) + 1.0)
        |        / (coalesce(c1.c1, 0) + vv.v))
        |      * 1000000.0 + 0.5) AS BIGINT) AS lpq
        |  FROM bi b
        |  LEFT JOIN c2 USING (bk)
        |  LEFT JOIN c1 USING (uk)
        |  CROSS JOIN vv),
        |a AS (SELECT doc_id, CAST(sum(lpq) AS BIGINT) AS sumq,
        |  count(*) AS n_bigrams FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  ${r4sql("CAST(sumq AS DOUBLE) / 1000000.0 / n_bigrams")} AS avg_logprob
        |FROM a ORDER BY doc_id""".stripMargin,

    "q62_kmeans" ->
      s"""WITH $kmeansChainSql
        |SELECT vec_id, CAST(cell AS INTEGER) AS cell,
        |  ${r4sql("d")} AS sim
        |FROM af ORDER BY vec_id""".stripMargin,

    // q79: the same chain, then each cell's bottom-5 by (sim, vec_id) —
    // the least-prototypical outlier set, rank 1 = most anomalous
    "q79_embedding_outliers" ->
      s"""WITH $kmeansChainSql,
        |r AS (SELECT vec_id, cell, d, row_number() OVER (
        |    PARTITION BY cell ORDER BY d ASC, vec_id) AS rank
        |  FROM af)
        |SELECT vec_id, CAST(cell AS INTEGER) AS cell,
        |  ${r4sql("d")} AS sim, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY cell, rank""".stripMargin,

    // q94: the same chain, then up to 5 per cell by the deterministic
    // md5 ppm draw (ascending, ties by vec_id) — the cluster-balanced
    // sample replayed verbatim
    "q94_cluster_sample" ->
      s"""WITH $kmeansChainSql,
        |dr AS (SELECT vec_id, cell, d,
        |    ${key56("CAST(vec_id AS VARCHAR) || ':cbs'")} % 1000000
        |      AS draw
        |  FROM af),
        |r AS (SELECT vec_id, cell, d, draw, row_number() OVER (
        |    PARTITION BY cell ORDER BY draw ASC, vec_id) AS rank
        |  FROM dr)
        |SELECT vec_id, CAST(cell AS INTEGER) AS cell,
        |  ${r4sql("d")} AS sim, CAST(draw AS BIGINT) AS draw,
        |  CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY cell, rank""".stripMargin,

    "q104_epoch_plan" ->
      s"""WITH st AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n
        |  FROM documents),
        |d AS (SELECT doc_id, source, n,
        |    ${key56("CAST(doc_id AS VARCHAR) || ':epoch'")} AS k
        |  FROM st WHERE n > 0),
        |t(source, target) AS (SELECT * FROM (VALUES
        |  ('src0', CAST(80000 AS BIGINT)), ('src1', CAST(60000 AS BIGINT)),
        |  ('src2', CAST(40000 AS BIGINT)), ('src3', CAST(20000 AS BIGINT)))
        |  v(source, target)),
        |c AS (SELECT d.doc_id, d.source, d.n, t.target,
        |    COALESCE(sum(d.n) OVER (PARTITION BY d.source
        |      ORDER BY d.k, d.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before,
        |    sum(d.n) OVER (PARTITION BY d.source) AS tot
        |  FROM d JOIN t USING (source))
        |SELECT doc_id, source, n AS n_tokens,
        |  CAST(target // tot
        |    + CASE WHEN before < target % tot THEN 1 ELSE 0 END
        |    AS BIGINT) AS copies
        |FROM c
        |WHERE target // tot
        |  + CASE WHEN before < target % tot THEN 1 ELSE 0 END >= 1
        |ORDER BY doc_id""".stripMargin,

    "q105_shuffled_order" ->
      s"""SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY
        |    ${key56("CAST(doc_id AS VARCHAR) || ':shuf'")}, doc_id)
        |    AS BIGINT) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q112_epoch_shards" ->
      s"""WITH r AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY
        |      ${key56("CAST(doc_id AS VARCHAR) || ':shuf'")}, doc_id)
        |      AS BIGINT) AS pos
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM r)
        |SELECT doc_id, pos,
        |  CAST(((pos - 1) * 8) // n AS BIGINT) AS shard,
        |  CAST((pos - 1) - (((((pos - 1) * 8) // n) * n + 7) // 8)
        |    AS BIGINT) AS pos_in_shard
        |FROM r, n ORDER BY doc_id""".stripMargin,

    "q63_source_mixture" ->
      s"""WITH st AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS nst
        |  FROM documents),
        |s AS (SELECT source, CAST(sum(nst) AS BIGINT) AS toks_s
        |  FROM st GROUP BY source),
        |w AS (SELECT source, toks_s,
        |  sqrt(CAST(toks_s AS DOUBLE)) AS wv FROM s),
        |dn AS (SELECT list_sum(list(wv ORDER BY source)) AS denom FROM w),
        |r AS (SELECT w.source,
        |  least(1000000, CAST(floor(w.wv / dn.denom * 20000.0 / w.toks_s
        |    * 1000000.0) AS BIGINT)) AS rate_q
        |  FROM w, dn)
        |SELECT st.doc_id, st.source,
        |  ${r4sql("CAST(r.rate_q AS DOUBLE) / 1000000.0")} AS rate
        |FROM st JOIN r USING (source)
        |WHERE ${key56("CAST(st.doc_id AS VARCHAR) || ':mix'")} % 1000000
        |  < r.rate_q
        |ORDER BY doc_id""".stripMargin,

    // q78: rebuild the identical Bloom bit set in SQL (same md5/affine
    // chain as q76), probe every doc — members AND the deterministic
    // false positives replay exactly
    "q78_bloom_membership" -> {
      val p = 2147483647L // Dedup.P
      val bit = s"((((637543 + 104729 * j.range) % $p) * h" +
        s" + (389287 + 982451 * j.range) % $p) % $p) % 512"
      s"""WITH hv AS (SELECT doc_id, ${key56("text")} % $p AS h
        |  FROM documents),
        |bits AS MATERIALIZED (SELECT DISTINCT $bit AS bit
        |  FROM hv, range(0, 3) j WHERE doc_id % 4 = 0),
        |probe AS (SELECT doc_id, $bit AS bit
        |  FROM hv, range(0, 3) j)
        |SELECT p.doc_id, count(b.bit) = 3 AS might_contain
        |FROM probe p LEFT JOIN bits b USING (bit)
        |GROUP BY p.doc_id ORDER BY doc_id""".stripMargin
    },

    // q76: rebuild the identical CMS in SQL — same md5-based 56-bit key,
    // same (a·h + b) mod P affine family, same (row, bucket) sums — then
    // probe it for the top-20 tokens (min over rows, absent bucket = 0)
    "q76_cms_heavy_hitters" -> {
      val p = 2147483647L // Dedup.P
      // bucket of hash column `h` for sketch row j (DuckDB range alias)
      val bucket = s"((((637543 + 104729 * j.range) % $p) * h" +
        s" + (389287 + 982451 * j.range) % $p) % $p) % 1024"
      s"""WITH tok AS (SELECT unnest($toksSql) AS w FROM documents),
        |tc AS MATERIALIZED (SELECT w, count(*) AS true_cnt
        |  FROM tok GROUP BY w),
        |thv AS (SELECT ${key56("w")} % $p AS h FROM tok),
        |cms AS MATERIALIZED (SELECT j.range AS row, $bucket AS bucket,
        |    count(*) AS cnt
        |  FROM thv, range(0, 4) j GROUP BY 1, 2),
        |top AS (SELECT w, true_cnt FROM tc
        |  ORDER BY true_cnt DESC, w LIMIT 20),
        |probe AS (SELECT t.w, t.true_cnt, j.range AS row,
        |    $bucket AS bucket
        |  FROM (SELECT w, true_cnt, ${key56("w")} % $p AS h FROM top) t,
        |    range(0, 4) j)
        |SELECT probe.w AS token, probe.true_cnt,
        |  min(coalesce(cms.cnt, 0)) AS est_cnt
        |FROM probe LEFT JOIN cms USING (row, bucket)
        |GROUP BY probe.w, probe.true_cnt
        |ORDER BY token""".stripMargin
    },

    // q82: the same md5 ppm draw and cumulative bounds, replayed
    "q82_split_assignment" ->
      s"""SELECT doc_id,
        |  CASE WHEN ${key56("CAST(doc_id AS VARCHAR) || ':split'")}
        |         % 1000000 < 800000 THEN 'train'
        |       WHEN ${key56("CAST(doc_id AS VARCHAR) || ':split'")}
        |         % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q106: the q82 split draw, then per-split sums of 56-bit keys mod
    // 2^56 — order-invariant in any engine, so GROUP BY replays exactly
    "q106_dataset_manifest" ->
      s"""WITH a AS (SELECT doc_id, text,
        |  CASE WHEN ${key56("CAST(doc_id AS VARCHAR) || ':split'")}
        |         % 1000000 < 800000 THEN 'train'
        |       WHEN ${key56("CAST(doc_id AS VARCHAR) || ':split'")}
        |         % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(CAST(sum(${key56("CAST(doc_id AS VARCHAR)")}) AS HUGEINT)
        |    % 72057594037927936 AS BIGINT) AS id_checksum,
        |  CAST(CAST(sum(${key56("CAST(doc_id AS VARCHAR) || ':' || text")})
        |    AS HUGEINT) % 72057594037927936 AS BIGINT) AS content_checksum
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

    // q107: the same perturbation + a FULL OUTER JOIN on id comparing
    // the 56-bit content keys; null-safe change test
    "q107_corpus_diff" ->
      s"""WITH edited AS (SELECT doc_id,
        |    CASE WHEN doc_id % 37 = 0 THEN text || ' x' ELSE text END
        |      AS text
        |  FROM documents),
        |after_t AS (
        |  SELECT doc_id, text FROM edited WHERE doc_id % 53 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 61 = 0),
        |bk AS (SELECT doc_id,
        |    ${key56("CAST(doc_id AS VARCHAR) || ':' || text")} AS k
        |  FROM documents),
        |ak AS (SELECT doc_id,
        |    ${key56("CAST(doc_id AS VARCHAR) || ':' || text")} AS k
        |  FROM after_t),
        |j AS (SELECT COALESCE(bk.doc_id, ak.doc_id) AS doc_id,
        |    CASE WHEN bk.doc_id IS NULL THEN 'added'
        |         WHEN ak.doc_id IS NULL THEN 'removed'
        |         WHEN ak.k IS DISTINCT FROM bk.k THEN 'changed' END
        |      AS status
        |  FROM bk FULL OUTER JOIN ak ON bk.doc_id = ak.doc_id)
        |SELECT doc_id, status FROM j WHERE status IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // q86: bucket = top 8 bits of the 56-bit key, rank = leading zeros
    // of the low 48 bits + 1 (via binary-string bit length — bin() emits
    // no leading zeros in either engine), registers = per-bucket max,
    // S = Σ 2^(49−M) with empty registers at 2^49, estimate ln-free.
    "q86_hll_distinct" ->
      s"""WITH tk AS MATERIALIZED (SELECT lang,
        |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        |  FROM documents),
        |hv AS (SELECT lang, ${key56("w")} AS h FROM tk),
        |rg AS (SELECT lang, h // 281474976710656 AS bucket,
        |    max(CASE WHEN h % 281474976710656 = 0 THEN 49
        |      ELSE 49 - length(ltrim(bin(h % 281474976710656), '0'))
        |      END) AS register
        |  FROM hv GROUP BY lang, h // 281474976710656),
        |ag AS (SELECT lang, count(*) AS n_occupied,
        |    sum(562949953421312 >> register) AS s_occ
        |  FROM rg GROUP BY lang),
        |sc AS (SELECT lang, n_occupied, CAST(s_occ
        |    + (256 - n_occupied) * 562949953421312 AS BIGINT) AS s_scaled
        |  FROM ag),
        |ex AS (SELECT lang, count(DISTINCT w) AS exact_distinct FROM tk
        |  GROUP BY lang)
        |SELECT s.lang, s.n_occupied, s.s_scaled,
        |  ${r4sql("0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0 / CAST(s.s_scaled AS DOUBLE)")} AS estimate,
        |  e.exact_distinct
        |FROM sc s JOIN ex e USING (lang) ORDER BY lang""".stripMargin,

    // q90: the full funnel replayed — q21's langid CASE, q60's µ-weight
    // margin, q18's md5 canonical pick, q53's 56-bit gram probe against
    // the %97 eval slice, q82's ppm split draw — composed in the
    // engine's exact stage order over the %97<>0 candidate slice
    "q90_curation_pipeline" -> {
      val splitKey = key56("CAST(doc_id AS VARCHAR) || ':split'")
      s"""WITH $curationChainSql
        |SELECT doc_id,
        |  CASE WHEN $splitKey % 1000000 < 800000 THEN 'train'
        |       WHEN $splitKey % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split,
        |  CAST(len(toks) AS BIGINT) AS n_tokens
        |FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
        |ORDER BY doc_id""".stripMargin
    },

    // q92: the same funnel chain, read as ACCOUNTING — every candidate
    // attributed to the FIRST stage that removed it (or 'kept'), so the
    // stage rows partition the input and counts sum to it
    "q92_curation_funnel" ->
      s"""WITH $curationChainSql
        |SELECT CASE WHEN l.lid_id IS NULL THEN 'language'
        |    WHEN q.qf_id IS NULL THEN 'quality'
        |    WHEN d.dd_id IS NULL THEN 'duplicate'
        |    WHEN di.doc_id IS NOT NULL THEN 'contaminated'
        |    ELSE 'kept' END AS stage,
        |  count(*) AS n_docs,
        |  CAST(sum(len(b.toks)) AS BIGINT) AS n_tokens
        |FROM (SELECT doc_id, toks FROM tk WHERE doc_id % 97 <> 0) b
        |LEFT JOIN (SELECT doc_id AS lid_id FROM lid) l
        |  ON b.doc_id = l.lid_id
        |LEFT JOIN (SELECT doc_id AS qf_id FROM qf) q
        |  ON b.doc_id = q.qf_id
        |LEFT JOIN (SELECT doc_id AS dd_id FROM dd) d
        |  ON b.doc_id = d.dd_id
        |LEFT JOIN dirty di ON b.doc_id = di.doc_id
        |GROUP BY 1 ORDER BY stage""".stripMargin,

    "q64_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT lang, ${key56("text")} AS hv
        |  FROM documents),
        |r AS (SELECT lang, hv, row_number() OVER (
        |  PARTITION BY lang ORDER BY hv) AS rk FROM h),
        |a AS (SELECT lang, count(*) AS n_kept, max(hv) AS hk
        |  FROM r WHERE rk <= 64 GROUP BY lang)
        |SELECT lang, n_kept,
        |  ${r4sql("CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE) ELSE CAST(63 AS DOUBLE) * CAST(72057594037927936 AS DOUBLE) / CAST(hk AS DOUBLE) END")} AS estimate
        |FROM a ORDER BY lang""".stripMargin
  )
}
