package graft

import graft.operators.{Ckpt, Dedup}
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 session-2 closure-implementation probe (dev tool, not a
  * declared query): [[graft.operators.Dedup.connectedComponents]]
  * (min-label propagation, O(diameter) rounds) vs
  * [[graft.operators.Dedup.connectedComponentsStar]] (large/small-star,
  * O(log²) rounds) on the SAME pinned pair graphs — the fuzzy-key
  * variant graph (compound fuzz tiers chain keys: suspected
  * long-diameter) and the MinHash near-dup graph (shallow
  * near-cliques, the shape the label loop's scaladoc prefers).
  * Motivated by bench_r12_store2 vs bench_r12_incr: the same fuzzy
  * from-scratch chain measured 97.7 s through the label loop and
  * ~2.7 s through the star path at the 100× decade — this probe
  * isolates the closure to pin the attribution before acting on it.
  *
  * One JSON line; SPARK_GRAFT_SF_DIR picks the fixture; repeats via
  * SPARK_GRAFT_R12_REPEATS (floors). */
object BenchCcR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_R12_REPEATS", "3").toInt
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def floorOf(body: => Unit): Double =
      (1 to repeats).map(_ => timed(body)).min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // distributed assignment comparison (NO driver collect — the
    // assignments are corpus-scale at the 100× decade): row counts +
    // an order-insensitive hash aggregate over (id, component)
    def sig(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("id").cast("long"),
          col("component").cast("long")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }

    // fuzzy pair graph (rep edges)
    val fk = DedupQueries.fuzzKeys(spark, sfDir)
    val fuzzPairs = Ckpt.eager(
      Dedup.fuzzyKeyPairs(fk, "key", "doc_id")
        .select(col("rep_a").as("id1"), col("rep_b").as("id2")))
    val nFuzz = fuzzPairs.count()
    val fuzzLabel = floorOf { noop(Dedup.connectedComponents(fuzzPairs)) }
    val fuzzStar = floorOf {
      noop(Dedup.connectedComponentsStar(fuzzPairs))
    }
    val fuzzSame = sig(Dedup.connectedComponents(fuzzPairs)) ==
      sig(Dedup.connectedComponentsStar(fuzzPairs))
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(fuzzPairs)

    // MinHash near-dup pair graph (the q42 shape)
    val aug = DedupQueries.augDocs(spark, sfDir)
    val mhPairs = Ckpt.eager(
      Dedup.nearDupPairs(aug, "doc_id", "text", tau = 0.5)
        .select(col("id1"), col("id2")))
    val nMh = mhPairs.count()
    val mhLabel = floorOf { noop(Dedup.connectedComponents(mhPairs)) }
    val mhStar = floorOf { noop(Dedup.connectedComponentsStar(mhPairs)) }
    val mhSame = sig(Dedup.connectedComponents(mhPairs)) ==
      sig(Dedup.connectedComponentsStar(mhPairs))
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(mhPairs)

    println(
      s"""{"metric":"cc_r12","sf":"$sfDir","repeats":$repeats,""" +
      s""""fuzz_pairs":$nFuzz,"fuzz_label_sec":$fuzzLabel,""" +
      s""""fuzz_star_sec":$fuzzStar,"fuzz_same":$fuzzSame,""" +
      s""""mh_pairs":$nMh,"mh_label_sec":$mhLabel,""" +
      s""""mh_star_sec":$mhStar,"mh_same":$mhSame}""")
    spark.stop()
  }
}
