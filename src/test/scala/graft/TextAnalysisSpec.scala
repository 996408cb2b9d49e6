package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("packShards: bucketed two-stage sum equals the naive global window") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 500).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))("tok").mkString(" ")))
      .toDF("doc_id", "text")
    // tiny buckets force many bucket boundaries through the offset join
    val got = TextAnalysis.packShards(docs, tokenBudget = 37, bucketSize = 16)
      .select("doc_id", "cum_subtokens", "shard_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // naive ground truth
    var cum = 0L
    val exp = docs.select(col("doc_id"),
        TextAnalysis.subtokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
      .map { case (id, n) => cum += n; (id, cum, (cum - n) / 37) }
    assert(got.toSeq == exp.toSeq)
    // shards are contiguous and budget-aligned: every shard's first doc
    // starts at a cum boundary below budget·(shard+1)
    got.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._1).max - rows.map(_._1).min + 1 == rows.length)
      assert(shard >= 0)
    }
  }

  test("chunkTokens: overlapping windows cover the token stream exactly") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo")                                    // 1 token
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(docs, chunkSize = 4, overlap = 1)
      .select("doc_id", "chunk_id", "n_chunk_tokens")
      .as[(Long, Int, Long)].collect().toSet
    // step 3: starts 1,4,7,10 -> lengths 4,4,4,1; solo doc -> one 1-token
    assert(got == Set((1L, 0, 4L), (1L, 1, 4L), (1L, 2, 4L), (1L, 3, 1L),
      (2L, 0, 1L)))
    // hashes of identical windows are identical across docs
    val twin = Seq((3L, "a b c"), (4L, "a b c")).toDF("doc_id", "text")
    val hashes = TextAnalysis.chunkTokens(twin, 4, 1)
      .select("chunk_hash").as[String].collect()
    assert(hashes.length == 2 && hashes.distinct.length == 1)
  }

  test("chunkTokens rejects bad overlap") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, chunkSize = 4, overlap = 4)
    }
  }
}
