package graft.model

import org.apache.spark.sql.types._

/** Engine-wide defaults, mirroring the reference's hard-coded constants.
  *
  * Citations into /root/reference:
  *  - sparsity threshold 0.01: core/delta_computer.py:19
  *  - base interval 10, sparsity-promotion ratio 0.7: storage/temporal_database.py:30-31
  *  - reconstruction tolerance 0.01: core/delta_computer.py:194
  *  - max chain 15, error rate 0.0005, quality threshold 0.95:
  *    core/reconstruction_service.py:57-59
  *  - default dim 384 (tests use 100; driver testdata uses 64):
  *    storage/storage_engine.py:50
  */
object Defaults {
  val EmbeddingDim          = 384
  val SparsityThreshold     = 0.01
  val MaxDeltaRatio         = 0.8
  val BaseInterval          = 10
  val PromotionRatio        = 0.7
  val ReconstructionTol     = 0.01
  val MaxChainLength        = 15
  val ErrorAccumulationRate = 0.0005
  val QualityThreshold      = 0.95
  val DefaultK              = 5
  /** Coarse cells probed per maintained-index search (of the default 16
    * trained cells) — the recall/cost knob of the IVF layer. */
  val DefaultNProbe         = 4
}

/** One row of the engine's core `versions` table (SURVEY §1.3 / FIXTURES A1).
  * `embedding` is non-null iff kind='base'; `deltaIdx`/`deltaVal` non-null iff
  * kind='delta'. Sparse deltas are parallel arrays — exactly the reference's
  * on-disk layout (storage/storage_engine.py:204-211).
  */
case class VersionRecord(
    content_id: String,
    seq: Int,
    ts: java.sql.Timestamp,
    kind: String,
    embedding: Option[Array[Float]],
    delta_idx: Option[Array[Int]],
    delta_val: Option[Array[Float]],
    from_seq: Option[Int],
    change_magnitude: Option[Double],
    metadata: Map[String, String])

/** Result row of a reconstruction job — reconstructed embedding + provenance
  * (reference: core/reconstruction_service.py:19-36). */
case class ReconstructionResult(
    content_id: String,
    seq: Int,
    embedding: Array[Float],
    base_seq_used: Int,
    deltas_applied: Int,
    reconstruction_cost: Int,
    estimated_error: Double,
    quality_score: Double)

object Schemas {
  val versions: StructType = StructType(Seq(
    StructField("content_id", StringType, nullable = false),
    StructField("seq", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("delta_idx", ArrayType(IntegerType, containsNull = false)),
    StructField("delta_val", ArrayType(FloatType, containsNull = false)),
    StructField("from_seq", IntegerType),
    StructField("change_magnitude", DoubleType),
    StructField("metadata", MapType(StringType, StringType))
  ))
}
