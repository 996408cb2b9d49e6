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

    // salted two-phase ranking: a handful of query ids would otherwise
    // each rank the whole corpus on a single task (hot-key skew)
    val ranked = TopK.perKeySalted(scored, "query_id",
      Seq(desc("sim"), col("id")), k)

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

  /** Approximate top-k via IVF (inverted-file) partitioning: KMeans
    * centroids over a corpus sample, each corpus vector assigned to its
    * nearest centroid, and each query probing only the `nProbe` nearest
    * cells — the classic coarse-quantizer ANN shape. Centroid count
    * ~sqrt(N) caps cell size; probing is a broadcast join of (query, cell)
    * pairs against the cell-partitioned corpus. KMeans is seeded but not
    * bit-reproducible across engines, so this operator is checked
    * rows-only (recall vs [[topK]] in tests), not against the SQL oracle. */
  def topKIvf(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val cn = corpus
      .withColumn("_cnorm", l2Norm(col("vec")))
      .where(col("_cnorm") > 0)
      .withColumn("vec", l2NormalizeWith(col("vec"), col("_cnorm")))
      .drop("_cnorm")
      .withColumn("_fv", array_to_vector(col("vec")))
    // a coarse quantizer doesn't need convergence — 5 iterations is the
    // standard IVF training budget
    val km = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("_fv")
    val model = km.fit(cn.select("_fv"))
    val assigned = model.transform(cn)
      .withColumnRenamed("prediction", "_cell").drop("_fv")

    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c: Vector, i) => (i, c.toArray.map(_.toFloat))
    }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("_cell", "_centroid")

    val qn = queries
      .withColumn("_qnorm", l2Norm(col("qvec")))
      .where(col("_qnorm") > 0)
      .withColumn("qvec", l2NormalizeWith(col("qvec"), col("_qnorm")))
      .drop("_qnorm")
    // nProbe nearest cells per query (broadcast: centroids are tiny)
    val probes = qn.crossJoin(broadcast(centDf))
      .withColumn("_csim", dotNative(col("qvec"), col("_centroid")))
      .withColumn("_crank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("_csim"), col("_cell"))))
      .where(col("_crank") <= nProbe)
      .select(col("query_id"), col("qvec"), col("_cell"))

    assigned.join(broadcast(probes), Seq("_cell"))
      .withColumn("sim", dotNative(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), col("id"))))
      .where(col("rank") <= k && col("sim") > 0)
      .select("query_id", "rank", "id", "sim")
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
