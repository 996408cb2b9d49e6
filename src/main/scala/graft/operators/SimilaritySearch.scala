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
              nBits: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val qb = queries
      .withColumn("_qb", Dedup.hyperplaneBucket(col("qvec"), nBits))
      .withColumn("_qnorm", l2Norm(col("qvec")))
      .where(col("_qnorm") > 0)
      .withColumn("qvec", l2NormalizeWith(col("qvec"), col("_qnorm")))
      .drop("_qnorm")
    // multi-probe: each query also probes every hamming-1 neighbor bucket,
    // recovering candidates whose single sign bit flipped — the standard
    // recall lever that costs nBits extra probes instead of more tables
    val qn =
      if (!multiProbe) qb.withColumnRenamed("_qb", "_bucket")
      else qb.select(col("query_id"), col("qvec"),
        explode(array((col("_qb") +: (0 until nBits).map(j =>
          col("_qb").bitwiseXOR(lit(1L << j)))): _*)).as("_bucket"))
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
              nCells: Int = 16, nProbe: Int = 4,
              trainSample: Int = 4096): DataFrame = {
    val cn = corpus
      .withColumn("_cnorm", l2Norm(col("vec")))
      .where(col("_cnorm") > 0)
      .withColumn("vec", l2NormalizeWith(col("vec"), col("_cnorm")))
      .drop("_cnorm")

    // IVF coarse quantizers always train on a bounded SAMPLE — a few
    // thousand vectors suffice for nCells centroids regardless of corpus
    // size, so training is a driver-side Lloyd's over a limit() sample
    // (deterministic: sample ordered by id; no ML pipeline overhead).
    val sample = cn.select(col("id"), col("vec")).orderBy("id")
      .limit(trainSample).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vec").toArray)
    val centroids = lloyd(sample, nCells, iters = 5)

    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toSeq.toDF("_cell", "_centroid")

    // nearest-centroid assignment: broadcast argmax over nCells
    val assigned = cn.crossJoin(broadcast(centDf))
      .withColumn("_csim", dotNative(col("vec"), col("_centroid")))
      .withColumn("_cr", row_number().over(
        Window.partitionBy("id").orderBy(desc("_csim"), col("_cell"))))
      .where(col("_cr") === 1)
      .drop("_csim", "_cr", "_centroid")

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

  /** Driver-side Lloyd's iterations for IVF training. Deterministic:
    * centroids init from evenly-strided sample rows; empty cells keep their
    * previous centroid. */
  private def lloyd(sample: Array[Array[Float]], nCells: Int,
                    iters: Int): Array[Array[Float]] = {
    require(sample.nonEmpty, "IVF training sample is empty")
    val dim = sample.head.length
    val k = math.min(nCells, sample.length)
    var cents = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < dim) { s += v(i).toDouble * cents(c)(i); i += 1 }
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = sums(c).map(x => (x / counts(c)).toFloat)
          val n = math.sqrt(m.map(x => x.toDouble * x).sum)
          if (n == 0) cents(c) else m.map(x => (x / n).toFloat)
        }
      }
    }
    cents
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
