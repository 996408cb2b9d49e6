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

  test("hashSample: deterministic, rate-proportional, stable under growth") {
    val docs = (0 until 2000).map(i => (i.toLong, s"text $i"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = TextAnalysis.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // reproducible
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"kept ${a.size}")
    // raising the rate only ADDS rows (thresholds nest)
    val wider = TextAnalysis.hashSample(docs, "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
    // growth stability: the kept set over a prefix is the prefix of the
    // kept set (per-row decision, no corpus-level state)
    val prefix = TextAnalysis.hashSample(
        docs.where(col("doc_id") < 1000), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(prefix == a.filter(_ < 1000))
    // a different seed draws a different (but same-sized-ish) sample
    val reseeded = TextAnalysis.hashSample(docs, "doc_id", 0.3, seed = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(reseeded != a)
  }

  test("stratifiedSample honors per-stratum rates") {
    val docs = (0 until 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        s"text $i"))
      .toDF("doc_id", "lang", "text")
    val kept = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.2, "de" -> 0.7))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("en") / 1000.0 - 0.2) < 0.06, kept.toString)
    assert(math.abs(kept("de") / 1000.0 - 0.7) < 0.06, kept.toString)
    assert(kept("fr") == 1000) // default rate 1.0 keeps everything
    // rate 0 drops a stratum entirely
    val none = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.0), defaultRate = 1.0)
      .where(col("lang") === "en").count()
    assert(none == 0)
  }
}
