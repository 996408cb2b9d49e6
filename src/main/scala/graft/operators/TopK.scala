package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-resistant per-key top-k (SURVEY §2 row 43 optimization path).
  *
  * A single `Window.partitionBy(key)` ranks each key on ONE task — with few
  * hot keys (e.g. 10 query ids ranking a whole corpus) most of the cluster
  * idles while hot keys sort millions of rows. The salted form runs two
  * phases: rank within (key, salt) — spreading each key over `salts`
  * tasks — keep k per salted group, then rank the ≤ k·salts survivors per
  * key. Output is IDENTICAL to the naive window provided `order` is a
  * total order (break ties!): any row in the true top-k is in the top-k of
  * its salted subgroup.
  */
object TopK {

  /** Bounded-heap per-key top-k as a typed Aggregator (SURVEY row 43):
    * each partial aggregation carries at most k (score, id) entries, so the
    * shuffle moves k rows per key per map task instead of the full
    * candidate set, and nothing is ever globally sorted. Output per key:
    * array of (score, id) structs, best first, ties by ascending id —
    * identical ordering to `orderBy(desc(score), id)`. */
  class TopKAggregator(k: Int) extends org.apache.spark.sql.expressions
      .Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    // buffer kept sorted ascending-by-rank-order inverse; small k -> O(k)
    // insert is fine and keeps the encoder simple (no PQ serialization)
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(buf: Seq[(Double, Long)],
                        row: (Double, Long)): Seq[(Double, Long)] =
      insert(buf, row)

    override def merge(a: Seq[(Double, Long)],
                       b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[(Double, Long)],
                       row: (Double, Long)): Seq[(Double, Long)] = {
      // at capacity, only a STRICTLY better row displaces — a tie with
      // buf.last must drop, else the append path below grows the buffer
      // to k+1 entries
      if (buf.length >= k && !better(row, buf.last)) buf
      else {
        val i = buf.indexWhere(e => better(row, e)) match {
          case -1 => buf.length
          case x => x
        }
        (buf.take(i) :+ row) ++ buf.drop(i).take(k - i - 1)
      }
    }

    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder
        : org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      bufferEncoder
  }

  /** Heap-based per-key top-k: one aggregation instead of a window sort.
    * `scoreCol` DESC with `idCol` ASC tiebreak. Output:
    * (key, rank, id, score) — identical rows to the window formulation. */
  def perKeyHeap(df: DataFrame, key: String, scoreCol: String, idCol: String,
                 k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    df.groupBy(key)
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long"))
        .as("_top"))
      .select(col(key), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col(key), (col("_pos") + 1).cast("int").as("rank"),
        col("_e._2").as("id"), col("_e._1").as("score"))
  }

  /** Keep the top `k` rows per `key` under `order` (must be total). */
  def perKeySalted(df: DataFrame, key: String, order: Seq[Column], k: Int,
                   salts: Int = 16): DataFrame = {
    // any deterministic-per-row salt works — correctness never depends on
    // the assignment, only the phase-2 re-rank does
    val salted = df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    val phase1 = salted
      .withColumn("_r1", row_number().over(
        Window.partitionBy(col(key), col("_salt")).orderBy(order: _*)))
      .where(col("_r1") <= k)
      .drop("_salt", "_r1")
    phase1.withColumn("rank", row_number().over(
        Window.partitionBy(col(key)).orderBy(order: _*)))
      .where(col("rank") <= k)
  }
}
