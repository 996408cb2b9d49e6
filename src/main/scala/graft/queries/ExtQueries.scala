package graft.queries

import graft.operators.{Ckpt, Multimodal, SimilaritySearch, SyntheticVersions}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANN + multimodal oracle queries (builder north-star extensions). */
object ExtQueries {

  /** documents as a synthetic media table: payload = utf-8 text bytes. */
  private def media(s: SparkSession, d: String): DataFrame =
    par(Tables.documents(s, d)).select(
      col("doc_id").as("media_id"), lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // Q27: approximate top-k via hyperplane-LSH buckets (vs exact q15).
    "q27_ann_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKLsh(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q27b: multi-table LSH top-k — 2 independent 6-bit tables, each
    // multi-probed; candidates unioned before ranking (the recall
    // configuration for large corpora).
    "q27b_ann_lsh_multi" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKLshMulti(queries, corpus, 5,
          nBits = 6, nTables = 2)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q40: the engine's flagship composite — search over RECONSTRUCTED
    // LATEST versions (facade searchLatestVersions): one set-based
    // reconstruction of every content's max-seq state (base as-of + delta
    // fold), then exact cosine top-k over the reconstructed corpus. The
    // whole pipeline — promotion, sparse deltas, fold, normalize, rank —
    // is replayed by the DuckDB oracle.
    "q40_search_latest" -> ((s, d) => {
      val versions = SyntheticVersions.versions(s, d)
      val latest = versions.groupBy("content_id").agg(max("seq").as("seq"))
      val corpus = graft.operators.Reconstruction
        .reconstruct(versions, latest)
        .select(substring(col("content_id"), 2, 10).cast("int").as("id"),
          col("embedding").as("vec"))
      val queries = corpus.where(col("id") < 3)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      SimilaritySearch.topK(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q40b: the approx twin of q40 — same reconstructed-latest corpus,
    // but candidates come from single-table 6-bit hyperplane-LSH buckets
    // (with hamming-1 multi-probe) instead of the exact cross join: the
    // repeat-query path the facade exposes as searchLatestVersionsApprox.
    "q40b_search_latest_lsh" -> ((s, d) => {
      val versions = SyntheticVersions.versions(s, d)
      val latest = versions.groupBy("content_id").agg(max("seq").as("seq"))
      val corpus = graft.operators.Reconstruction
        .reconstruct(versions, latest)
        .select(substring(col("content_id"), 2, 10).cast("int").as("id"),
          col("embedding").as("vec"))
      val queries = corpus.where(col("id") < 3)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      SimilaritySearch.topKLsh(queries, corpus, 5, nBits = 6)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q35: approximate top-k via IVF coarse quantization. The quantized
    // Lloyd's trainer is bit-deterministic and engine-portable (integer
    // cross-row sums), so the DuckDB oracle replays the training loop
    // exactly — 5 unrolled iterations in SQL — and the entry hash-checks.
    "q35_ann_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKIvf(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q41: approximate top-k via product quantization (ADC scan). Same
    // oracle-replayable-training recipe as q35: the per-subspace quantized
    // Lloyd's (L2 objective) is bit-deterministic, so DuckDB replays the
    // codebooks, the byte encoding, AND the lookup-table scoring exactly.
    "q41_ann_pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKPq(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q56: approximate top-k via SQ8 scalar quantization — per-dimension
    // byte grid from the sample's min/max envelope (a trainer with NO
    // float-sum ambiguity, exactly replayable), asymmetric decode-and-dot
    // scan. Completes the quantization family: IVF / PQ / IVF-PQ / SQ.
    "q56_ann_sq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKSq(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q43: PQ with exact re-rank — ADC top-20 per query in the compressed
    // domain, then exact dots over just the survivors. Returned sims are
    // EXACT (the precision stage); the oracle replays both stages.
    "q43_ann_pq_refine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKPqRefine(queries, corpus, 5, refine = 20)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q44: IVF-PQ — the q35 coarse quantizer restricts candidates to the
    // probed cells (equi-join, no cross join) and the q41 byte codes score
    // them via ADC lookups. Both trainers replayed by the oracle.
    "q44_ann_ivfpq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKIvfPq(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q72: IVFPQ-R — the q44 cell-probed ADC stage keeps the top-20
    // candidates per query, then ONLY those survivors re-join the raw
    // corpus for exact dots (topKIvfPq's refine stage; the q43 two-stage
    // shape with the coarse quantizer bounding stage 1). Returned sims
    // are EXACT; the oracle replays both stages.
    "q72_ann_ivfpq_refine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKIvfPq(queries, corpus, 5, refine = 20)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q95: binary quantization + exact refine — sign bits of the RAW
    // embedding packed into two 32-bit words (32x compression), flat
    // Hamming scan keeps the 20 nearest candidates per query
    // (bit_count(xor) per word), then ONLY those survivors take exact
    // normalized dots. No trainer at all: the oracle replays sign tests,
    // xor/popcount, and both rank stages verbatim.
    "q95_ann_bq_refine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"))
      SimilaritySearch.topKBq(queries, corpus, 5, refine = 20)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q49: the maintained-index search shape end-to-end — IVF-PQ over the
    // RECONSTRUCTED LATEST corpus (the facade's searchLatestVersionsPq
    // pipeline: reconstruction → coarse cells → byte codes → cell-probed
    // ADC). Composes the q40 reconstruction prefix with the q44 trainer
    // chains; the oracle replays ALL of it (promotion, delta fold, both
    // quantized Lloyd trainers, the cell probe, the ADC lookups).
    "q49_search_latest_ivfpq" -> ((s, d) => {
      val versions = SyntheticVersions.versions(s, d)
      val latest = versions.groupBy("content_id").agg(max("seq").as("seq"))
      // pin the reconstructed corpus ONCE (the facade serves searches from
      // its materialized latest corpus — cacheLatest — so the trainer
      // sample, the query broadcast, and the encode scan here must read a
      // materialization too, not re-run the reconstruction 3x)
      val corpus = graft.operators.Reconstruction
        .reconstruct(versions, latest)
        .select(substring(col("content_id"), 2, 10).cast("int").as("id"),
          col("embedding").as("vec"))
        .transform(Ckpt.eager)
      val queries = corpus.where(col("id") < 3)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      SimilaritySearch.topKIvfPq(queries, corpus, 5)
        .select(col("query_id"), col("rank"), col("id"),
          r4(col("sim")).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // Q28: multimodal decode plumbing — binary payloads through the
    // partition-parallel featurize stub (md5-derived, oracle-replicable).
    "q28_multimodal_features" -> ((s, d) => {
      val feats = Multimodal.decodeAndFeaturize(media(s, d)).toDF()
      val dims = (0 until 4).map(j =>
        r4(element_at(col("feature"), j + 1).cast("double")).as(s"f$j"))
      feats.select(Seq(col("media_id"), col("n_bytes")) ++ dims: _*)
        .orderBy("media_id")
    }),

    // Q28b: frame-sampling plumbing (1 payload row -> N frame rows).
    "q28b_multimodal_frames" -> ((s, d) =>
      Multimodal.sampleFrames(media(s, d), stride = 64)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")),

    // Q77: integer area-average RESIZE — the q69 image fixture (32×32
    // PPM, pixel value a closed-form function of (doc_id, x, y)) decoded
    // by the real codec and pooled to an 8×8 luma grid with exact
    // integer means; the oracle replays the pixel formula, the cell
    // sums, and the same floor division (grayscale: luma = 1000·v).
    "q77_image_resize" -> ((s, d) =>
      Multimodal.resizedLuma(DedupQueries.mediaFrame(s, d),
          outW = 8, outH = 8)
        .orderBy("media_id", "ky", "kx")),

    // Q77b: the same resize as ONE row per image — the grid serialized
    // row-major into a canonical string (map-only, no 64× row fan-out;
    // the deployment shape when cells aren't individually addressed).
    "q77b_image_resize_grid" -> ((s, d) =>
      Multimodal.resizedLumaGrid(DedupQueries.mediaFrame(s, d),
          outW = 8, outH = 8)
        .select(col("media_id"), concat_ws(",",
          transform(col("grid"), v => v.cast("string"))).as("grid"))
        .orderBy("media_id"))
  ) ++ sqlSurface

  private lazy val sqlSurface: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      // Q32: the SQL text surface — temp views + the graft_dot custom
      // expression invoked from spark.sql (codegen'd inside SQL too).
      "q32_sql_surface" -> ((s, d) => {
        graft.api.GraftSql.registerFunctions(s)
        graft.api.GraftSql.registerTables(s, d)
        s.sql(
          """SELECT a.vec_id AS id1, b.vec_id AS id2,
            |  CAST(floor(graft_dot(a.embedding, b.embedding) * 10000D + 0.5D)
            |    AS DOUBLE) / 10000D AS dot
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE a.vec_id < 5 AND b.vec_id < 5
            |ORDER BY id1, id2""".stripMargin)
      }))

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKIvf]]:
    * identical normalization (q15-proven REAL cast), identical quantized
    * Lloyd's training (integer sums are order-independent; all double ops
    * in fixed index order), identical assignment/probe tie-breaks
    * (sim DESC, cell ASC == Spark's first-max / (−sim, cell) sort). */
  private def q35OracleSql: String = {
    val dot64 = (a: String, b: String) =>
      s"list_sum(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]))"
    val dotReal = (a: String, b: String) =>
      s"""list_sum(list_transform(range(0, 64), i ->
         |        CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))""".stripMargin
    val iter = (t: Int) =>
      s"""a$t AS (
        |  SELECT rn, qv, cell FROM (
        |    SELECT rn, qv, cell,
        |      row_number() OVER (PARTITION BY rn ORDER BY d DESC, cell) AS rnk
        |    FROM (SELECT s.rn, s.qv, c.cell,
        |        ${dot64("s.dv", "c.cv")} AS d
        |      FROM sampd s CROSS JOIN c${t - 1} c) y) x
        |  WHERE rnk = 1),
        |s$t AS (
        |  SELECT cell, ii.i, sum(qv[ii.i + 1]) AS sq, count(*) AS cnt
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
    s"""WITH nrm AS MATERIALIZED (
      |  SELECT vec_id, list_transform(range(0, 64), i ->
      |    CAST(CAST(embedding[i+1] AS DOUBLE)
      |      / sqrt(list_sum(list_transform(range(0, 64), j ->
      |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
      |      AS REAL)) AS v
      |  FROM embeddings
      |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
      |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
      |sampq AS MATERIALIZED (
      |  SELECT vec_id, v FROM nrm ORDER BY vec_id LIMIT 4096),
      |samp AS MATERIALIZED (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn,
      |    list_transform(v, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
      |  FROM sampq),
      |sampd AS MATERIALIZED (
      |  SELECT rn, qv,
      |    list_transform(qv, q -> CAST(q AS DOUBLE) / 1024.0) AS dv
      |  FROM samp),
      |sz AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(least(16, count(*)) AS BIGINT) AS k FROM samp),
      |c0 AS MATERIALIZED (
      |  SELECT cl.cell, s.dv AS cv
      |  FROM (SELECT unnest(range(16)) AS cell) cl, sz, sampd s
      |  WHERE cl.cell < sz.k AND s.rn = (cl.cell * sz.n) // sz.k),
      |${(1 to 5).map(iter).mkString(",\n")},
      |cf AS MATERIALIZED (
      |  SELECT cell, list_transform(cv, x -> CAST(x AS REAL)) AS cvf
      |  FROM c5),
      |asgn AS MATERIALIZED (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT vec_id, v, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rnk
      |    FROM (SELECT n.vec_id, n.v, c.cell,
      |        ${dotReal("n.v", "c.cvf")} AS d
      |      FROM nrm n CROSS JOIN cf c) y) x
      |  WHERE rnk = 1),
      |pr AS (
      |  SELECT query_id, qv2, cell FROM (
      |    SELECT vec_id AS query_id, v AS qv2, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rnk
      |    FROM (SELECT n.vec_id, n.v, c.cell,
      |        ${dotReal("n.v", "c.cvf")} AS d
      |      FROM nrm n CROSS JOIN cf c
      |      WHERE n.vec_id < 10) y) x
      |  WHERE rnk <= 4),
      |sc AS (
      |  SELECT p.query_id, a.vec_id AS id,
      |    ${dotReal("p.qv2", "a.v")} AS sim
      |  FROM pr p JOIN asgn a ON a.cell = p.cell),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin
  }

  /** Bounded id-ordered training sample on the 1024 integer grid, over
    * whatever `nrm(vec_id, v)` the composition provides (embeddings for
    * q41/q43/q44; the reconstructed-latest corpus for q49). */
  private val sampCtes: String =
    """sampq AS MATERIALIZED (
      |  SELECT vec_id, v FROM nrm ORDER BY vec_id LIMIT 4096),
      |samp AS MATERIALIZED (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn,
      |    list_transform(v, x ->
      |      CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
      |  FROM sampq),
      |sz AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(least(16, count(*)) AS BIGINT) AS k FROM samp)""".stripMargin

  /** Shared normalization + quantized-sample CTEs (q35-proven shapes):
    * `nrm` (REAL-normalized vectors from `embeddings`), then [[sampCtes]].
    * Multiply-referenced CTEs carry MATERIALIZED hints throughout the ANN
    * oracle family: DuckDB 1.0 inlines by default, and the 5-iteration
    * trainer chains reference each predecessor twice (assign + fallback) —
    * inlined, that is a 2^5 replay of everything beneath, which is what
    * made the round-6 oracle sweep non-terminating on q49. */
  private val annPrefixCtes: String =
    """nrm AS MATERIALIZED (
      |  SELECT vec_id, list_transform(range(0, 64), i ->
      |    CAST(CAST(embedding[i+1] AS DOUBLE)
      |      / sqrt(list_sum(list_transform(range(0, 64), j ->
      |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
      |      AS REAL)) AS v
      |  FROM embeddings
      |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
      |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
      |""".stripMargin + sampCtes

  /** The PQ pipeline as reusable CTEs (names prefixed `p`/distinct so the
    * IVF chain can coexist in q44): per-subspace L2 k-means keyed by
    * (sub, cell) — `m` independent trainers as ONE unrolled iteration
    * chain — then the argmin encode (||c||² − 2·dot, ties to lowest code)
    * and ADC sims via ordered-list sum (list(pd ORDER BY sub) = Spark's
    * fixed left-to-right fold). Assumes [[annPrefixCtes]]. Ends with
    * `adcsc(query_id, id, sim)`. Knobs mirror the Scala defaults for
    * dim 64: m=16 subspaces of dsub=4, ks=256 codes. */
  private def pqChainCtes: String = pqChainCtes("n.vec_id < 10")

  private def pqChainCtes(queryPred: String): String =
    pqChainCtes(queryPred, "samp", "nrm", "v")

  /** `sampSrc(rn, qv)` feeds the trainer; `encSrc(vec_id, encVec)` is the
    * frame the corpus ENCODE scans (raw normalized vectors for q41/q43;
    * per-cell RESIDUALS for the q44/q49 IVF-PQ composition — the LUT side
    * always scores the raw query against the codebooks). */
  private def pqChainCtes(queryPred: String, sampSrc: String,
                          encSrc: String, encVec: String,
                          m: Int = 16, dsub: Int = 4,
                          ks: Int = 256): String = {
    val iter = (t: Int) =>
      s"""pa$t AS (
        |  SELECT rn, sub, q8, cell FROM (
        |    SELECT rn, sub, q8, cell,
        |      row_number() OVER (PARTITION BY rn, sub ORDER BY d ASC, cell) AS rnk
        |    FROM (SELECT s.rn, s.sub, s.q8, c.cell,
        |        list_sum(list_transform(range(0, $dsub), i ->
        |          (s.d8[i+1] - c.cv[i+1]) * (s.d8[i+1] - c.cv[i+1]))) AS d
        |      FROM subs s JOIN pc${t - 1} c ON c.sub = s.sub) y) x
        |  WHERE rnk = 1),
        |ps$t AS (
        |  SELECT sub, cell, ii.i, sum(q8[ii.i + 1]) AS sq, count(*) AS cnt
        |  FROM pa$t, (SELECT unnest(range(0, $dsub)) AS i) ii
        |  GROUP BY sub, cell, ii.i),
        |pm$t AS (
        |  SELECT sub, cell,
        |    list(CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE) / 1024.0 ORDER BY i)
        |      AS mv
        |  FROM ps$t GROUP BY sub, cell),
        |pc$t AS MATERIALIZED (
        |  SELECT p.sub, p.cell,
        |    CASE WHEN m.cell IS NULL THEN p.cv ELSE m.mv END AS cv
        |  FROM pc${t - 1} p LEFT JOIN pm$t m
        |    ON m.sub = p.sub AND m.cell = p.cell)""".stripMargin
    val pdotOf = (vec: String) =>
      s"""list_sum(list_transform(range(0, $dsub), i ->
        |          CAST(n.$vec[c.sub * $dsub + i + 1] AS DOUBLE)
        |          * CAST(c.cvf[i+1] AS DOUBLE)))""".stripMargin
    val pdot = pdotOf("v")
    s"""subs AS MATERIALIZED (
      |  SELECT s.rn, ss.sub,
      |    list_slice(s.qv, ss.sub * $dsub + 1, ss.sub * $dsub + $dsub) AS q8,
      |    list_transform(list_slice(s.qv, ss.sub * $dsub + 1, ss.sub * $dsub + $dsub),
      |      q -> CAST(q AS DOUBLE) / 1024.0) AS d8
      |  FROM $sampSrc s, (SELECT unnest(range(0, $m)) AS sub) ss),
      |szp AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(least($ks, count(*)) AS BIGINT) AS k FROM $sampSrc),
      |pc0 AS MATERIALIZED (
      |  SELECT sd.sub, cl.cell, sd.d8 AS cv
      |  FROM (SELECT unnest(range($ks)) AS cell) cl, szp, subs sd
      |  WHERE cl.cell < szp.k AND sd.rn = (cl.cell * szp.n) // szp.k),
      |${(1 to 5).map(iter).mkString(",\n")},
      |pcf AS (
      |  SELECT sub, cell, list_transform(cv, x -> CAST(x AS REAL)) AS cvf
      |  FROM pc5),
      |pcfd AS MATERIALIZED (
      |  SELECT sub, cell, cvf,
      |    list_sum(list_transform(cvf, x ->
      |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq
      |  FROM pcf),
      |enc AS MATERIALIZED (
      |  SELECT vec_id, sub, cell AS code FROM (
      |    SELECT vec_id, sub, cell,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, cell)
      |        AS rnk
      |    FROM (SELECT n.vec_id, c.sub, c.cell,
      |        c.nsq - 2.0 * ${pdotOf(encVec)} AS d
      |      FROM $encSrc n CROSS JOIN pcfd c) y) x
      |  WHERE rnk = 1),
      |lut AS (
      |  SELECT n.vec_id AS query_id, c.sub, c.cell, $pdot AS pd
      |  FROM nrm n CROSS JOIN pcfd c WHERE $queryPred),
      |adcsc AS (
      |  SELECT l.query_id, e.vec_id AS id,
      |    list_sum(list(l.pd ORDER BY l.sub)) AS sim
      |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.cell = e.code
      |  GROUP BY l.query_id, e.vec_id)""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKPq]]. */
  private def q41OracleSql: String =
    s"""WITH $annPrefixCtes,
      |$pqChainCtes,
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM adcsc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKPqRefine]]:
    * ADC top-20 candidates per query, then exact dots over the survivors
    * only, re-ranked (no positivity filter on the ADC stage — the exact
    * stage decides). */
  private def q43OracleSql: String =
    s"""WITH $annPrefixCtes,
      |$pqChainCtes,
      |ra AS (
      |  SELECT query_id, id, row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS rnk
      |  FROM adcsc),
      |cand AS (SELECT query_id, id FROM ra WHERE rnk <= 20),
      |ex AS (
      |  SELECT c.query_id, c.id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(n.v[i+1] AS DOUBLE))) AS sim
      |  FROM cand c JOIN nrm n ON n.vec_id = c.id
      |  JOIN nrm q ON q.vec_id = c.query_id),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM ex)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKIvfPq]] over
    * whatever `nrm(vec_id, v)` and sample CTEs precede it: the q35
    * spherical-Lloyd cell chain (c0..c5/cf/asgn, verbatim shapes), then the
    * RESIDUAL composition — sample rows re-assigned to their final cells
    * (sasgn), residuals quantized to the 1024 grid (rsamp) to feed the q41
    * PQ chain, corpus residuals (cres) byte-encoded against the residual
    * codebooks — and finally ADC sims ⟨q,centroid⟩ + Σ lut only for
    * candidates whose cell the query probes (pr carries the centroid sim).
    * `queryPred` selects the query rows (q44: embeddings ids < 10; q49:
    * reconstructed ids < 3). */
  private def ivfPqBodySql(queryPred: String): String = {
    val dot64 = (a: String, b: String) =>
      s"list_sum(list_transform(range(0, 64), i -> $a[i+1] * $b[i+1]))"
    val dotReal = (a: String, b: String) =>
      s"""list_sum(list_transform(range(0, 64), i ->
         |        CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))""".stripMargin
    val iter = (t: Int) =>
      s"""a$t AS (
        |  SELECT rn, qv, cell FROM (
        |    SELECT rn, qv, cell,
        |      row_number() OVER (PARTITION BY rn ORDER BY d DESC, cell) AS rnk
        |    FROM (SELECT s.rn, s.qv, c.cell,
        |        ${dot64("s.dv", "c.cv")} AS d
        |      FROM sampd s CROSS JOIN c${t - 1} c) y) x
        |  WHERE rnk = 1),
        |s$t AS (
        |  SELECT cell, ii.i, sum(qv[ii.i + 1]) AS sq, count(*) AS cnt
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
    s"""sampd AS MATERIALIZED (
      |  SELECT rn, qv,
      |    list_transform(qv, q -> CAST(q AS DOUBLE) / 1024.0) AS dv
      |  FROM samp),
      |c0 AS MATERIALIZED (
      |  SELECT cl.cell, s.dv AS cv
      |  FROM (SELECT unnest(range(16)) AS cell) cl, sz, sampd s
      |  WHERE cl.cell < sz.k AND s.rn = (cl.cell * sz.n) // sz.k),
      |${(1 to 5).map(iter).mkString(",\n")},
      |cf AS MATERIALIZED (
      |  SELECT cell, list_transform(cv, x -> CAST(x AS REAL)) AS cvf
      |  FROM c5),
      |asgn AS MATERIALIZED (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rnk
      |    FROM (SELECT n.vec_id, c.cell,
      |        ${dotReal("n.v", "c.cvf")} AS d
      |      FROM nrm n CROSS JOIN cf c) y) x
      |  WHERE rnk = 1),
      |sampr AS MATERIALIZED (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn, v FROM sampq),
      |sasgn AS MATERIALIZED (
      |  SELECT rn, v, cell FROM (
      |    SELECT rn, v, cell,
      |      row_number() OVER (PARTITION BY rn ORDER BY d DESC, cell) AS rnk
      |    FROM (SELECT s.rn, s.v, c.cell,
      |        ${dotReal("s.v", "c.cvf")} AS d
      |      FROM sampr s CROSS JOIN cf c) y) x
      |  WHERE rnk = 1),
      |rsamp AS MATERIALIZED (
      |  SELECT s.rn, list_transform(range(0, 64), i ->
      |    CAST(floor(CAST(CAST(CAST(s.v[i+1] AS DOUBLE)
      |      - CAST(c.cvf[i+1] AS DOUBLE) AS REAL) AS DOUBLE) * 1024.0 + 0.5)
      |      AS BIGINT)) AS qv
      |  FROM sasgn s JOIN cf c ON c.cell = s.cell),
      |cres AS MATERIALIZED (
      |  SELECT n.vec_id, list_transform(range(0, 64), i ->
      |    CAST(CAST(n.v[i+1] AS DOUBLE) - CAST(c.cvf[i+1] AS DOUBLE) AS REAL))
      |      AS rv
      |  FROM nrm n JOIN asgn a ON a.vec_id = n.vec_id
      |  JOIN cf c ON c.cell = a.cell),
      |pr AS (
      |  SELECT query_id, cell, csim FROM (
      |    SELECT vec_id AS query_id, cell, d AS csim,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rnk
      |    FROM (SELECT n.vec_id, c.cell,
      |        ${dotReal("n.v", "c.cvf")} AS d
      |      FROM nrm n CROSS JOIN cf c
      |      WHERE $queryPred) y) x
      |  WHERE rnk <= 4),
      |${pqChainCtes(queryPred, "rsamp", "cres", "rv")},
      |sc AS (
      |  SELECT l.query_id, e.vec_id AS id,
      |    p.csim + list_sum(list(l.pd ORDER BY l.sub)) AS sim
      |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.cell = e.code
      |  JOIN asgn a ON a.vec_id = e.vec_id
      |  JOIN pr p ON p.query_id = l.query_id AND p.cell = a.cell
      |  GROUP BY l.query_id, e.vec_id, p.csim)""".stripMargin
  }

  /** Standard ADC-rank tail over `sc(query_id, id, sim)`. */
  private val adcRankTail: String =
    s""",
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  private def q44OracleSql: String =
    s"""WITH $annPrefixCtes,
      |${ivfPqBodySql("n.vec_id < 10")}$adcRankTail""".stripMargin

  /** DuckDB replay of q72 (topKIvfPq with refine): the q44 scored chain,
    * ADC top-20 survivors per query, exact dots over survivors only,
    * re-ranked (q43's refine tail over the cell-probed stage 1). */
  private def q72OracleSql: String =
    s"""WITH $annPrefixCtes,
      |${ivfPqBodySql("n.vec_id < 10")},
      |ra AS (
      |  SELECT query_id, id, row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS rnk
      |  FROM sc),
      |cand AS (SELECT query_id, id FROM ra WHERE rnk <= 20),
      |ex AS (
      |  SELECT c.query_id, c.id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(n.v[i+1] AS DOUBLE))) AS sim
      |  FROM cand c JOIN nrm n ON n.vec_id = c.id
      |  JOIN nrm q ON q.vec_id = c.query_id),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM ex)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of q49: the q40 reconstruction prefix supplies
    * `nrm` (the reconstructed-latest corpus), then the IDENTICAL IVF-PQ
    * chain as q44 — reconstruction, both trainers, cell probe, ADC
    * lookups, all in SQL. */
  private def q49OracleSql: String =
    q40ReconCte +
      s""",
      |nrm AS MATERIALIZED (SELECT id AS vec_id, v FROM n),
      |$sampCtes,
      |${ivfPqBodySql("n.vec_id < 3")}$adcRankTail""".stripMargin

  /** Multi-table LSH bucket bits for table `t` of a 6-bit scheme (global
    * plane index g = t·6 + j, mirroring Dedup.hyperplaneBucket). */
  private def bucket6(v: String, table: Int): String = (0 until 6).map { j =>
    val g = table * 6 + j
    s"""(CASE WHEN list_sum(list_transform(range(0, 64), i ->
       |      CAST($v[i+1] AS DOUBLE)
       |      * (CAST((73 * i + ${179 * g + 11}) % 97 AS DOUBLE) / 97.0 - 0.5)))
       |    > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
  }.mkString(" + ")

  private def q27bOracleSql: String = {
    val probes = (b: String) =>
      s"[$b, xor($b, 1), xor($b, 2), xor($b, 4), xor($b, 8), " +
        s"xor($b, 16), xor($b, 32)]"
    s"""WITH bk AS (
      |  SELECT vec_id, ${bucket6("embedding", 0)} AS b0,
      |    ${bucket6("embedding", 1)} AS b1
      |  FROM embeddings),
      |n AS (
      |  SELECT e.vec_id, bk.b0, bk.b1, list_transform(range(0, 64), i ->
      |    CAST(CAST(embedding[i+1] AS DOUBLE)
      |      / sqrt(list_sum(list_transform(range(0, 64), j ->
      |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
      |      AS REAL)) AS v
      |  FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id
      |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
      |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
      |nbt AS (
      |  SELECT vec_id, v, 0 AS tbl, b0 AS bucket FROM n
      |  UNION ALL
      |  SELECT vec_id, v, 1 AS tbl, b1 AS bucket FROM n),
      |qpt AS (
      |  SELECT vec_id, v, 0 AS tbl, unnest(${probes("b0")}) AS probe
      |  FROM n WHERE vec_id < 10
      |  UNION ALL
      |  SELECT vec_id, v, 1 AS tbl, unnest(${probes("b1")}) AS probe
      |  FROM n WHERE vec_id < 10),
      |sc AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(c.v[i+1] AS DOUBLE))) AS sim
      |  FROM qpt q JOIN nbt c ON c.tbl = q.tbl AND c.bucket = q.probe),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin
  }

  /** Shared q40/q40b reconstruction prefix: each content's latest version
    * rebuilt in SQL (nearest base + per-dim delta sums, q14's proven
    * arithmetic extended to all 64 dims), ending with `rec` (id, raw emb)
    * and `n` (id, normalized v). */
  private def q40ReconCte: String = {
    val sums = (0 until 64).map(i =>
      s"    sum(CAST(kd.dstored[${i + 1}] AS DOUBLE)) AS a$i").mkString(",\n")
    val dims = (0 until 64).map(i =>
      s"CAST(CAST(bv.emb[${i + 1}] AS DOUBLE) + coalesce(ag.a$i, 0.0) AS REAL)")
      .mkString(",\n      ")
    graft.operators.SyntheticVersions.oracleCte +
      s""", tg AS (SELECT content_id, max(seq) AS seq FROM vk GROUP BY content_id),
      |b AS (
      |  SELECT tg.content_id, tg.seq, max(vk.seq) AS base_seq
      |  FROM tg JOIN vk ON vk.content_id = tg.content_id
      |    AND vk.kind = 'base' AND vk.seq <= tg.seq
      |  GROUP BY tg.content_id, tg.seq),
      |ag AS (
      |  SELECT b.content_id, b.seq, b.base_seq,
      |$sums
      |  FROM b LEFT JOIN vk kd ON kd.content_id = b.content_id
      |    AND kd.kind = 'delta' AND kd.seq > b.base_seq AND kd.seq <= b.seq
      |  GROUP BY b.content_id, b.seq, b.base_seq),
      |rec AS MATERIALIZED (
      |  SELECT CAST(substr(ag.content_id, 2) AS INTEGER) AS id,
      |    list_value(
      |      $dims) AS emb
      |  FROM ag JOIN vk bv ON bv.content_id = ag.content_id
      |    AND bv.seq = ag.base_seq),
      |n AS MATERIALIZED (
      |  SELECT id, list_transform(range(0, 64), i ->
      |    CAST(CAST(emb[i+1] AS DOUBLE)
      |      / sqrt(list_sum(list_transform(range(0, 64), j ->
      |          CAST(emb[j+1] AS DOUBLE) * CAST(emb[j+1] AS DOUBLE))))
      |      AS REAL)) AS v
      |  FROM rec
      |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
      |    CAST(emb[j+1] AS DOUBLE) * CAST(emb[j+1] AS DOUBLE)))) > 0)""".stripMargin
  }

  /** DuckDB replay of q40: the shared reconstruction prefix, then the
    * q15-proven exact cosine + rank. */
  private def q40OracleSql: String =
    q40ReconCte +
      s""",
      |sc AS (
      |  SELECT q.id AS query_id, c.id AS id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(c.v[i+1] AS DOUBLE))) AS sim
      |  FROM n q, n c WHERE q.id < 3),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of q40b: same reconstruction prefix, but candidates
    * from single-table 6-bit hyperplane-LSH buckets over the RAW
    * reconstructed vectors, queries probing their bucket plus every
    * hamming-1 neighbor (exactly SimilaritySearch.topKLsh nBits=6). */
  private def q40bOracleSql: String =
    q40ReconCte +
      s""",
      |bk AS (SELECT id, ${bucket6("emb", 0)} AS bucket FROM rec),
      |nb AS (SELECT n.id, n.v, bk.bucket FROM n JOIN bk ON bk.id = n.id),
      |qp AS (
      |  SELECT id, v, unnest([bucket,
      |    xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8),
      |    xor(bucket, 16), xor(bucket, 32)]) AS probe
      |  FROM nb WHERE id < 3),
      |sc AS (
      |  SELECT q.id AS query_id, c.id AS id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(c.v[i+1] AS DOUBLE))) AS sim
      |  FROM qp q JOIN nb c ON c.bucket = q.probe),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKSq]]: per-dim
    * min/max over the id-ordered sample, byte encode with edge clamping,
    * decode to REAL, asymmetric double-accumulated dots. */
  private def q56OracleSql: String = {
    val dotReal = (a: String, b: String) =>
      s"""list_sum(list_transform(range(0, 64), i ->
         |        CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))""".stripMargin
    s"""WITH $annPrefixCtes,
      |mm AS (
      |  SELECT ii.i, CAST(min(v[ii.i + 1]) AS DOUBLE) AS lo,
      |    (CAST(max(v[ii.i + 1]) AS DOUBLE)
      |      - CAST(min(v[ii.i + 1]) AS DOUBLE)) / 255.0 AS sc
      |  FROM sampq, (SELECT unnest(range(0, 64)) AS i) ii
      |  GROUP BY ii.i),
      |mml AS (SELECT list(lo ORDER BY i) AS lo, list(sc ORDER BY i) AS sc
      |  FROM mm),
      |enc AS (
      |  SELECT n.vec_id, list_transform(range(0, 64), i ->
      |    CASE WHEN m.sc[i + 1] = 0 THEN 0
      |      ELSE CAST(least(255, greatest(0,
      |        floor((CAST(n.v[i + 1] AS DOUBLE) - m.lo[i + 1])
      |          / m.sc[i + 1] + 0.5))) AS BIGINT) END) AS codes
      |  FROM nrm n, mml m),
      |dec AS (
      |  SELECT e.vec_id, list_transform(range(0, 64), i ->
      |    CAST(m.lo[i + 1] + e.codes[i + 1] * m.sc[i + 1] AS REAL)) AS dv
      |  FROM enc e, mml m),
      |sc2 AS (
      |  SELECT q.vec_id AS query_id, d.vec_id AS id,
      |    ${dotReal("q.v", "d.dv")} AS sim
      |  FROM nrm q, dec d WHERE q.vec_id < 10),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM sc2)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.SimilaritySearch.topKBq]]: sign
    * bits of the RAW embedding packed into two 32-bit words, Hamming
    * candidates via bit_count(xor) (top-20 per query, id tie-break), exact
    * normalized dots over the survivors. Zero-norm rows drop at the `nrm`
    * join exactly where the Spark refine stage drops them. */
  private def q95OracleSql: String =
    s"""WITH $annPrefixCtes,
      |bw AS MATERIALIZED (
      |  SELECT vec_id, list_transform(range(0, 2), w ->
      |    list_sum(list_transform(range(0, 32), j ->
      |      CASE WHEN embedding[32 * w + j + 1] >= 0
      |        THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
      |        ELSE 0 END))) AS wds
      |  FROM embeddings),
      |hm AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS id,
      |    bit_count(CAST(xor(q.wds[1], c.wds[1]) AS BIGINT))
      |      + bit_count(CAST(xor(q.wds[2], c.wds[2]) AS BIGINT)) AS ham
      |  FROM bw q, bw c WHERE q.vec_id < 10),
      |rh AS (
      |  SELECT query_id, id, row_number() OVER (
      |    PARTITION BY query_id ORDER BY ham, id) AS rnk
      |  FROM hm),
      |cand AS (SELECT query_id, id FROM rh WHERE rnk <= 20),
      |ex AS (
      |  SELECT c.query_id, c.id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CAST(q.v[i+1] AS DOUBLE) * CAST(n.v[i+1] AS DOUBLE))) AS sim
      |  FROM cand c JOIN nrm n ON n.vec_id = c.id
      |  JOIN nrm q ON q.vec_id = c.query_id),
      |r AS (
      |  SELECT query_id, id, sim, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
      |  FROM ex)
      |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
      |FROM r WHERE rank <= 5 AND sim > 0
      |ORDER BY query_id, rank""".stripMargin

  val oracle: Map[String, String] = Map(
    "q95_ann_bq_refine" -> q95OracleSql,
    "q35_ann_ivf_topk" -> q35OracleSql,
    "q56_ann_sq_topk" -> q56OracleSql,
    "q41_ann_pq_topk" -> q41OracleSql,
    "q43_ann_pq_refine" -> q43OracleSql,
    "q44_ann_ivfpq_topk" -> q44OracleSql,
    "q72_ann_ivfpq_refine" -> q72OracleSql,
    "q49_search_latest_ivfpq" -> q49OracleSql,
    "q27b_ann_lsh_multi" -> q27bOracleSql,
    "q40_search_latest" -> q40OracleSql,
    "q40b_search_latest_lsh" -> q40bOracleSql,
    "q32_sql_surface" ->
      s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  ${r4sql("list_sum(list_transform(range(0, 64), i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))")} AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 5
        |ORDER BY id1, id2""".stripMargin,
    "q27_ann_lsh_topk" -> {
      val bucket = (0 until 8).map { j =>
        s"""(CASE WHEN list_sum(list_transform(range(0, 64), i ->
           |      CAST(embedding[i+1] AS DOUBLE)
           |      * (CAST((73 * i + ${179 * j + 11}) % 97 AS DOUBLE) / 97.0 - 0.5)))
           |    > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
      }.mkString(" + ")
      s"""WITH bk AS (
        |  SELECT vec_id, $bucket AS bucket FROM embeddings),
        |n AS (
        |  SELECT e.vec_id, bk.bucket, list_transform(range(0, 64), i ->
        |    CAST(CAST(embedding[i+1] AS DOUBLE)
        |      / sqrt(list_sum(list_transform(range(0, 64), j ->
        |          CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))))
        |      AS REAL)) AS v
        |  FROM embeddings e JOIN bk ON bk.vec_id = e.vec_id
        |  WHERE sqrt(list_sum(list_transform(range(0, 64), j ->
        |    CAST(embedding[j+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE)))) > 0),
        |qp AS (
        |  SELECT vec_id, v, unnest([bucket,
        |    xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8),
        |    xor(bucket, 16), xor(bucket, 32), xor(bucket, 64),
        |    xor(bucket, 128)]) AS probe
        |  FROM n WHERE vec_id < 10),
        |sc AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |    list_sum(list_transform(range(0, 64), i ->
        |      CAST(q.v[i+1] AS DOUBLE) * CAST(c.v[i+1] AS DOUBLE))) AS sim
        |  FROM qp q JOIN n c ON q.probe = c.bucket),
        |r AS (
        |  SELECT query_id, id, sim, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY sim DESC, id) AS INTEGER) AS rank
        |  FROM sc)
        |SELECT query_id, rank, id, ${r4sql("sim")} AS sim
        |FROM r WHERE rank <= 5 AND sim > 0
        |ORDER BY query_id, rank""".stripMargin
    },

    "q28_multimodal_features" -> {
      val dims = (0 until 4).map(j =>
        s"  ${r4sql(s"CAST(CAST(concat('0x', substr(md5(text), ${2 * j + 1}, 6)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0")} AS f$j"
      ).mkString(",\n")
      s"""SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |$dims
        |FROM documents ORDER BY media_id""".stripMargin
    },

    "q28b_multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST((octet_length(encode(text)) - 1) // 64 + 1 AS BIGINT)
        |    AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    // q77: the q69 pixel formula (DedupQueries.mediaFrame is the source
    // of truth) -> 4x4 cell sums -> floor(1000*sum / 16) exact integer
    // means (every 32->8 cell holds exactly 16 pixels; grayscale makes
    // luma = 1000*v)
    "q77_image_resize" ->
      """WITH px AS (
        |  SELECT doc_id AS id, x.range AS x, y.range AS y,
        |    (3 * x.range + 5 * y.range + 7 * (doc_id % 25)
        |      + x.range * y.range
        |      + CASE WHEN x.range < 2 THEN (doc_id // 25) % 7 ELSE 0 END)
        |      % 256 AS v
        |  FROM documents, range(0, 32) x, range(0, 32) y)
        |SELECT id AS media_id, CAST(y // 4 AS INTEGER) AS ky,
        |  CAST(x // 4 AS INTEGER) AS kx,
        |  CAST((1000 * sum(v)) // 16 AS BIGINT) AS v
        |FROM px GROUP BY id, y // 4, x // 4
        |ORDER BY media_id, ky, kx""".stripMargin,

    // q77b: same cells, serialized row-major per image.
    "q77b_image_resize_grid" ->
      """WITH px AS (
        |  SELECT doc_id AS id, x.range AS x, y.range AS y,
        |    (3 * x.range + 5 * y.range + 7 * (doc_id % 25)
        |      + x.range * y.range
        |      + CASE WHEN x.range < 2 THEN (doc_id // 25) % 7 ELSE 0 END)
        |      % 256 AS v
        |  FROM documents, range(0, 32) x, range(0, 32) y),
        |cells AS (SELECT id, y // 4 AS ky, x // 4 AS kx,
        |    CAST((1000 * sum(v)) // 16 AS BIGINT) AS v
        |  FROM px GROUP BY id, y // 4, x // 4)
        |SELECT id AS media_id,
        |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY ky, kx) AS grid
        |FROM cells GROUP BY id ORDER BY media_id""".stripMargin
  )
}
