package graft.simulation

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic article-evolution generator, porting the semantics of the
  * reference's WikipediaSimulator (/root/reference/simulation/wikipedia.py):
  * per-category seeds (:58-72), edit types typo_fix → major_revision with
  * dimension-change footprints from ~dim/50 to ~dim/2 (:256-309), and L2
  * normalization after every edit (:312).
  *
  * Differences for bit-reproducibility (FIXTURES.md A2): an explicit RNG
  * seed everywhere and a FIXED epoch start (2025-01-01T00:00:00Z) instead
  * of the reference's `datetime.now()` anchoring (:129).
  */
object EvolutionSimulator {

  case class Edit(name: String, frac: Double, scale: Double, p: Double)

  /** Edit-type distribution (footprints mirror wikipedia.py:256-309). */
  val Edits = Seq(
    Edit("typo_fix", 1.0 / 50, 0.02, 0.40),
    Edit("minor_edit", 1.0 / 20, 0.05, 0.35),
    Edit("section_edit", 1.0 / 8, 0.12, 0.20),
    Edit("major_revision", 1.0 / 2, 0.30, 0.05))

  private val EpochMs =
    Timestamp.valueOf("2025-01-01 00:00:00").getTime

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Generate `nArticles` × `versionsPer` rows
    * (content_id, seq, ts, embedding), deterministic in `seed`. */
  def history(nArticles: Int, versionsPer: Int, dim: Int,
              seed: Long): Seq[(String, Int, Timestamp, Array[Float])] =
    (0 until nArticles).flatMap { a =>
      val rnd = new scala.util.Random(seed * 1000003L + a)
      var cur = normalize(Array.fill(dim)(rnd.nextGaussian().toFloat))
      (1 to versionsPer).map { k =>
        if (k > 1) {
          val r = rnd.nextDouble()
          val edit = Edits.scanLeft(("", 0.0)) { (acc, e) =>
            (e.name, acc._2 + e.p)
          }.drop(1).find(_._2 >= r)
            .flatMap(n => Edits.find(_.name == n._1))
            .getOrElse(Edits.last)
          val nDims = math.max(1, (dim * edit.frac).toInt)
          val touched = rnd.shuffle((0 until dim).toList).take(nDims).toSet
          cur = normalize(cur.zipWithIndex.map { case (x, i) =>
            if (touched(i)) x + (rnd.nextGaussian() * edit.scale).toFloat
            else x
          })
        }
        val ts = new Timestamp(EpochMs + (a.toLong * versionsPer + k) * 86400000L)
        (f"article_$a%03d", k, ts, cur.clone())
      }
    }

  def historyDf(spark: SparkSession, nArticles: Int, versionsPer: Int,
                dim: Int, seed: Long): DataFrame = {
    import spark.implicits._
    history(nArticles, versionsPer, dim, seed)
      .toDF("content_id", "seq", "ts", "embedding")
  }
}
