package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Batch cosine kNN (SURVEY §2 rows 21, 27, 43; reference FAISS path
  * /root/reference/storage/storage_engine.py:439-469).
  *
  * The reference searches an exact inner-product index over L2-normalized
  * BASE snapshots only (delta-only versions are never indexed —
  * storage_engine.py:89-110). The Spark formulation: normalize both sides
  * ONCE (norms materialized, not re-derived per pair), broadcast the small
  * query side, score with a codegen'd higher-order dot product, rank with a
  * per-query window. The corpus is scanned exactly once regardless of query
  * count; the only shuffle is the rank-by-query exchange, which is
  * proportional to |queries| × |corpus| only in the rows that survive
  * scoring — at cluster scale swap the window for a bounded-heap
  * TypedImperativeAggregate if ranking dominates (SURVEY row 43).
  */
object SimilaritySearch {

  /** Exact top-k cosine join. `queries`: (query_id, qvec); `corpus`:
    * (id, vec). Output: query_id, rank, id, sim — positive similarities
    * only (reference storage_engine.py:464-467). */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           positiveOnly: Boolean = true): DataFrame = {
    val qn = queries
      .withColumn("_qnorm", l2Norm(col("qvec")))
      .where(col("_qnorm") > 0)
      .withColumn("qvec", l2NormalizeWith(col("qvec"), col("_qnorm")))
      .drop("_qnorm")
    val cn = corpus
      .withColumn("_cnorm", l2Norm(col("vec")))
      .where(col("_cnorm") > 0)
      .withColumn("vec", l2NormalizeWith(col("vec"), col("_cnorm")))
      .drop("_cnorm")

    val scored = cn.crossJoin(broadcast(qn))
      .withColumn("sim", dotNative(col("qvec"), col("vec")))

    val ranked = scored.withColumn("rank",
      row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), col("id"))))
      .where(col("rank") <= k)

    (if (positiveOnly) ranked.where(col("sim") > 0) else ranked)
      .drop("qvec", "vec")
  }

  /** Approximate top-k via hyperplane-LSH buckets (the 100 TB path): both
    * sides get a deterministic [[Dedup.hyperplaneBucket]] from the RAW
    * vector, and scoring joins only bucket-mates — an equi-join replaces
    * the cross join, trading recall (no multi-probe) for corpus-scan cost
    * proportional to matching buckets only. Exact [[topK]] is the recall
    * baseline. */
  def topKLsh(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = 8): DataFrame = {
    val qn = queries
      .withColumn("_bucket", Dedup.hyperplaneBucket(col("qvec"), nBits))
      .withColumn("_qnorm", l2Norm(col("qvec")))
      .where(col("_qnorm") > 0)
      .withColumn("qvec", l2NormalizeWith(col("qvec"), col("_qnorm")))
      .drop("_qnorm")
    val cn = corpus
      .withColumn("_bucket", Dedup.hyperplaneBucket(col("vec"), nBits))
      .withColumn("_cnorm", l2Norm(col("vec")))
      .where(col("_cnorm") > 0)
      .withColumn("vec", l2NormalizeWith(col("vec"), col("_cnorm")))
      .drop("_cnorm")
    val scored = cn.join(broadcast(qn), Seq("_bucket"))
      .withColumn("sim", dotNative(col("qvec"), col("vec")))
    scored.withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(desc("sim"), col("id"))))
      .where(col("rank") <= k && col("sim") > 0)
      .drop("qvec", "vec", "_bucket")
  }

  /** Search the versioned store the way the reference does: corpus = base
    * snapshots only (storage_engine.py:89-110), identity = (content_id, seq). */
  def searchBases(versions: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topK(queries,
      versions.where(col("kind") === "base")
        .select(concat_ws("#", col("content_id"), col("seq")).as("id"),
          col("embedding").as("vec")),
      k)
}
