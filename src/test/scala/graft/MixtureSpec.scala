package graft

import graft.operators.{Dedup, Mixture}
import org.apache.spark.sql.functions._

/** Epoch assembly: explicit-weight mixture planning (upsampling copies,
  * remainder prefix, exclusions) vs a sequential reference, token
  * accounting bounds, and the deterministic shuffle permutation. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 3 sources with known whitespace-token counts
  private val fixture = Seq(
    (1L, "a", 10), (2L, "a", 20), (3L, "a", 5), (4L, "a", 15),
    (10L, "b", 100), (11L, "b", 50),
    (20L, "c", 7), (21L, "c", 7), (22L, "c", 7),
    (30L, "d", 40) // unweighted source: must vanish
  )
  private def docs() =
    fixture.map { case (id, s, n) =>
      (id, s, Seq.fill(n)("tok").mkString(" ")) }
      .toDF("doc_id", "source", "text")

  private def md5Key(id: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$id:epoch").substring(0, 14), 16)

  test("epochPlan matches the sequential reference: base copies, " +
    "remainder prefix in md5 order, unweighted sources excluded") {
    val weights = Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    val budget = 400L
    val got = Mixture.epochPlan(docs(), weights, budget)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // sequential reference
    val want = fixture.filter(f => weights.contains(f._2))
      .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        val target = budget * weights(src) / 1000000L
        val tot = ds.map(_._3.toLong).sum
        val base = target / tot
        val rem = target % tot
        var before = 0L
        ds.sortBy(f => (md5Key(f._1), f._1)).map { case (id, _, n) =>
          val extra = if (before < rem) 1L else 0L
          before += n
          (id, src, n.toLong, base + extra)
        }
      }.filter(_._4 >= 1).sortBy(_._1)
    assert(got == want)
    assert(!got.exists(_._2 == "d")) // unweighted source gone
    // token accounting: each source lands within one doc of its target
    got.groupBy(_._2).foreach { case (src, rs) =>
      val target = budget * weights(src) / 1000000L
      val planned = rs.map(r => r._3 * r._4).sum
      val maxDoc = fixture.filter(_._2 == src).map(_._3).max
      assert(planned >= target && planned < target + maxDoc,
        s"$src planned $planned target $target")
    }
    // source b (150 tokens, target 120): downsampling — copies in {0,1}
    // source a (50 tokens, target 200): upsampling — every doc >= 4
    assert(got.filter(_._2 == "b").forall(_._4 == 1L))
    assert(got.filter(_._2 == "a").forall(_._4 >= 4L))
  }

  test("epochPlan is append-stable for untouched sources and validates " +
    "input") {
    val weights = Map("a" -> 500000L, "c" -> 500000L)
    val before = Mixture.epochPlan(docs(), weights, 300L)
      .where(col("source") === "a")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // appending docs to OTHER sources never moves source a's plan
    val more = docs().unionByName(
      Seq((40L, "c", Seq.fill(9)("t").mkString(" ")))
        .toDF("doc_id", "source", "text"))
    val after = Mixture.epochPlan(more, weights, 300L)
      .where(col("source") === "a")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(before == after)
    intercept[IllegalArgumentException](
      Mixture.epochPlan(docs(), Map("a" -> 1000001L), 10L))
    intercept[IllegalArgumentException](
      Mixture.epochPlan(docs(), Map("a" -> 600000L, "b" -> 600000L), 10L))
    intercept[IllegalArgumentException](
      Mixture.epochPlan(docs(), Map("a" -> 1L), 0L))
  }

  test("seeded random corpora: epochPlan matches the sequential " +
    "reference across draws (bucketing invariance included)") {
    val rnd = new scala.util.Random(99)
    for (draw <- 1 to 3) {
      val nSrc = 2 + rnd.nextInt(4)
      val fx = (0 until (40 + rnd.nextInt(40))).map { i =>
        (rnd.nextLong(100000), s"s${i % nSrc}", 1 + rnd.nextInt(60))
      }.distinctBy(_._1)
      val ppmEach = 1000000L / nSrc
      val weights = (0 until nSrc).map(i => s"s$i" -> ppmEach).toMap
      val budget = 500L + rnd.nextLong(3000)
      val dfx = fx.map { case (id, s, n) =>
        (id, s, Seq.fill(n)("tok").mkString(" ")) }
        .toDF("doc_id", "source", "text")
      def run(buckets: Int) =
        Mixture.epochPlan(dfx, weights, budget, buckets = buckets)
          .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      val got = run(4096)
      val want = fx.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        val target = budget * weights(src) / 1000000L
        val tot = ds.map(_._3.toLong).sum
        val base = target / tot
        val rem = target % tot
        var before = 0L
        ds.sortBy(f => (md5Key(f._1), f._1)).map { case (id, _, n) =>
          val extra = if (before < rem) 1L else 0L
          before += n
          (id, src, n.toLong, base + extra)
        }
      }.filter(_._4 >= 1).sortBy(_._1)
      assert(got == want, s"draw $draw")
      // the bucket knob only stages the prefix sum — output invariant
      assert(run(7) == got, s"draw $draw buckets=7")
    }
  }

  test("shuffledOrder is a dense permutation, reproducible, and " +
    "salt-sensitive") {
    val df = (1L to 500L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Mixture.shuffledOrder(df, "doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (1L to 500L))            // dense perm
    val b = Mixture.shuffledOrder(df, "doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(a == b)                                           // reproducible
    val c = Mixture.shuffledOrder(df, "doc_id", salt = "epoch2")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(c.values.toSeq.sorted == (1L to 500L) && a != c)  // fresh draw
    // actually shuffled: id order and pos order disagree broadly
    val agree = (1L until 500L).count(i => a(i) < a(i + 1))
    assert(agree > 150 && agree < 350, s"suspiciously ordered: $agree")
  }

  test("epochShardAssignment: contiguous balanced ranges of the shuffle " +
    "order, 0-based in-shard positions, exact boundary formula") {
    val df = (1L to 103L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Mixture.epochShardAssignment(df, "doc_id", shards = 8)
      .select("pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._1).toSeq == (1L to 103L))
    // shard sizes differ by at most one and sum to N
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L to 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.values.sum == 103)
    // shards are CONTIGUOUS in the global order and in-shard positions
    // are 0-based and dense
    a.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._1).sorted
      assert(ps.last - ps.head == ps.length - 1) // contiguous pos range
      assert(rows.map(_._3).sorted.toSeq == (0L until ps.length)) // dense
    }
    // exact boundary formula (the oracle's): shard = (pos-1)*S div N
    assert(a.forall { case (p, s, _) => s == (p - 1) * 8 / 103 })
  }

  test("writeEpochShards: shard directories land sorted by position and " +
    "re-running reproduces byte-identical audit manifests") {
    val df = (1L to 200L).map(i => (i, s"text $i body")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_epoch").toString
    val m1 = Mixture.writeEpochShards(df, s"$dir/e1", shards = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val m2 = Mixture.writeEpochShards(df, s"$dir/e2", shards = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m1 == m2) // byte-identical manifests across independent builds
    assert(m1.map(_._2).sum == 200)
    // directories exist per shard; rows inside carry the assignment and
    // the two epochs' FILES hold identical content
    val e1 = spark.read.parquet(s"$dir/e1")
    assert(e1.select("shard").distinct().as[Long].collect().toSet ==
      (0L to 3L).toSet)
    val assigned = Mixture.epochShardAssignment(df, "doc_id", 4)
      .select("doc_id", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(e1.select("doc_id", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long)].collect().toSet == assigned)
    assert(spark.read.parquet(s"$dir/e2")
      .select("doc_id", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long)].collect().toSet == assigned)
    // order inside one shard file set follows the global order
    val s0 = e1.where(col("shard") === 0L).select("pos", "pos_in_shard")
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(s0.map(_._1).toSeq == s0.map(_._1).sorted.toSeq)
  }

  test("readEpochShards: read(write(x)) reassembles the exact global " +
    "order under manifest re-verification; membership and order " +
    "tampering both fail loudly") {
    val df = (1L to 150L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_epoch_rt").toString
    val manifest = Mixture.writeEpochShards(df, s"$dir/e", shards = 4)
      .persist()
    manifest.count()
    val back = Mixture.readEpochShards(spark, s"$dir/e", manifest)
    // the reassembled global order IS the deterministic shuffle order
    val wantOrder = Mixture.shuffledOrder(df.select("doc_id"), "doc_id")
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(back.orderBy("pos").select("doc_id").as[Long].collect().toSeq
      == wantOrder)
    // a rank's slice is contiguous in the global order
    val r2 = back.where(col("shard") === 2L)
      .orderBy("pos_in_shard").select("pos").as[Long].collect().toSeq
    assert(r2 == (r2.head to r2.last).toSeq)
    // MEMBERSHIP tampering: drop one row from a shard directory
    val e2 = s"$dir/e2"
    val m2 = Mixture.writeEpochShards(df, e2, shards = 4).persist()
    m2.count()
    val shard0 = spark.read.parquet(s"$e2/shard=0")
    shard0.where(col("doc_id") =!= shard0.select("doc_id")
        .as[Long].head()).write.mode("overwrite")
      .parquet(s"$dir/tmp0")
    spark.read.parquet(s"$dir/tmp0").write.mode("overwrite")
      .parquet(s"$e2/shard=0")
    val drop = intercept[IllegalArgumentException] {
      Mixture.readEpochShards(spark, e2, m2)
    }
    assert(drop.getMessage.contains("drifted"))
    // ORDER tampering: swap two ids' positions inside one shard (same
    // membership, same pos set — only the binding changes)
    val e3 = s"$dir/e3"
    val m3 = Mixture.writeEpochShards(df, e3, shards = 4).persist()
    m3.count()
    val s1 = spark.read.parquet(s"$e3/shard=1")
    val twoIds = s1.orderBy("pos").select("doc_id").as[Long]
      .collect().take(2)
    val swapped = s1.withColumn("doc_id",
      when(col("doc_id") === twoIds(0), twoIds(1))
        .when(col("doc_id") === twoIds(1), twoIds(0))
        .otherwise(col("doc_id")))
    swapped.write.mode("overwrite").parquet(s"$dir/tmp1")
    spark.read.parquet(s"$dir/tmp1").write.mode("overwrite")
      .parquet(s"$e3/shard=1")
    val swap = intercept[IllegalArgumentException] {
      Mixture.readEpochShards(spark, e3, m3)
    }
    assert(swap.getMessage.contains("drifted"))
    manifest.unpersist(); m2.unpersist(); m3.unpersist()
  }
}
