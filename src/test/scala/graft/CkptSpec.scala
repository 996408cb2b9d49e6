package graft

import graft.operators.{Ckpt, Dedup, Graph, SuffixArray}
import org.apache.spark.sql.DataFrame

/** Reliable-vs-local checkpoint parity for the iterative pyramids
  * (VERDICT r9 item 4): `spark.graft.checkpoint.reliable=true` must
  * change ONLY the lineage-truncation storage (checkpoint-dir-backed,
  * executor-loss-safe), never a single output bit. Gated here on the
  * exact operators the verdict named — pageRank (q100 shape),
  * suffixRanks + the LCP stats built on them (q96 shape), and both
  * connected-components variants — plus the loud-failure contract when
  * the mode is flipped without a checkpoint dir. */
class CkptSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` once per checkpoint mode and return both results. */
  private def bothModes[T](body: => T): (T, T) = {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val local = body // default mode: localCheckpoint
    sc.setCheckpointDir(dir)
    spark.conf.set(Ckpt.ReliableKey, "true")
    try { (local, body) }
    finally spark.conf.unset(Ckpt.ReliableKey)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val names = df.columns.sorted.toSeq
    df.collect().map(r => names.map(n => r.get(r.fieldIndex(n))))
      .sortBy(_.mkString("|")).toSeq
  }

  test("reliable=true without a checkpoint dir fails loudly") {
    // a fresh session shares the SparkContext; only flip the conf if no
    // dir is set yet (suite order may have set one)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Ckpt.ReliableKey, "true")
      try {
        val e = intercept[IllegalArgumentException] {
          Ckpt.eager(Seq(1L).toDF("v"))
        }
        assert(e.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.unset(Ckpt.ReliableKey)
    } else cancel("checkpoint dir already set by an earlier suite")
  }

  test("pageRank is bit-identical in local and reliable checkpoint modes") {
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (3L, 1L), (1L, 9L),
      (9L, 3L), (4L, 1L), (4L, 2L)).toDF("src", "dst")
    val (a, b) = bothModes(
      Graph.pageRank(edges, iters = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("suffixRanks + substringDedupStats are bit-identical in both modes") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "completely unrelated text with no repeats at all here"),
      (3L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val (a, b) = bothModes {
      val ranks = SuffixArray.suffixRanks(docs, levels = 4)
      (sortedRows(ranks), sortedRows(SuffixArray.substringDedupStats(docs, 4)))
    }
    assert(a == b)
    assert(a._1.nonEmpty && a._2.nonEmpty)
  }

  test("connectedComponents (label and star) are bit-identical in both " +
    "modes") {
    val pairs = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L),
      (11L, 12L), (12L, 13L), (20L, 21L)).toDF("id1", "id2")
    val (a, b) = bothModes((
      sortedRows(Dedup.connectedComponents(pairs)),
      sortedRows(Dedup.connectedComponentsStar(pairs))))
    assert(a == b)
    assert(a._1.nonEmpty && a._2.nonEmpty)
  }
}
