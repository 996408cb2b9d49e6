package graft.queries

import graft.operators.{Multimodal, SimilaritySearch}
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

    // Q35: approximate top-k via IVF coarse quantization (KMeans cells).
    // KMeans isn't bit-reproducible in SQL, so this entry has no oracle —
    // the driver records a rows-only check; recall is gated in tests.
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

  val oracle: Map[String, String] = Map(
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
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
