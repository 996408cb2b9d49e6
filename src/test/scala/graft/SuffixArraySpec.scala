package graft

import graft.operators.SuffixArray
import org.apache.spark.sql.functions._

/** Suffix-array prefix doubling: global dense rank scalability shape,
  * exact longest-repeated-span semantics vs a brute-force windows oracle,
  * and the degenerate corpora (empty, single token, all-identical,
  * overlapping self-repeats). */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: every (doc, pos, len) window string with its global
    * occurrence count; per-doc LRS = longest window occurring >= 2 times
    * anywhere (overlaps included), least start wins ties. */
  private def bruteLrs(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val toks = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ts) <- toks; p <- ts.indices; m <- 1 to (ts.length - p))
      counts.updateWith(ts.slice(p, p + m))(c => Some(c.getOrElse(0) + 1))
    docs.map { case (id, _) =>
      val ts = toks.toMap.getOrElse(id, Seq.empty)
      var best = 0L; var bestPos = 0L
      for (p <- ts.indices; m <- 1 to (ts.length - p)) {
        if (counts(ts.slice(p, p + m)) >= 2 &&
          (m > best || (m == best && p < bestPos))) {
          if (m > best) { best = m; bestPos = p }
        }
      }
      id -> (best, bestPos)
    }.toMap
  }

  private def runLrs(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    SuffixArray.longestRepeatedSpans(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, l, p) => id -> (l, p) }.toMap

  /** Brute coverage at minLen: position t covered iff some start s <= t
    * has a repeated span reaching past t with length >= minLen. */
  private def bruteCoverage(docs: Seq[(Long, String)],
                            minLen: Int): Map[Long, (Long, Long)] = {
    val toks = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ts) <- toks; p <- ts.indices; m <- 1 to (ts.length - p))
      counts.updateWith(ts.slice(p, p + m))(c => Some(c.getOrElse(0) + 1))
    docs.map { case (id, _) =>
      val ts = toks.toMap.getOrElse(id, Seq.empty)
      val covered = ts.indices.count { t =>
        (0 to t).exists { s =>
          val need = math.max(minLen, t - s + 1)
          (need to (ts.length - s)).exists(m =>
            counts(ts.slice(s, s + m)) >= 2)
        }
      }
      id -> (ts.length.toLong, covered.toLong)
    }.toMap
  }

  test("globalDenseRank matches a single-partition dense_rank window " +
    "and never plans one (ties split across range boundaries included)") {
    val df = (1 to 500).map(i => (i.toLong % 7, s"v${i % 13}"))
      .toDF("a", "b").repartition(8)
    val got = SuffixArray.globalDenseRank(df, Seq("a", "b"), "rk")
    val w = org.apache.spark.sql.expressions.Window.orderBy("a", "b")
    val want = df.withColumn("rk", dense_rank().over(w).cast("long"))
    assert(got.select("a", "b", "rk").as[(Long, String, Long)]
      .collect().sorted.toSeq ==
      want.select("a", "b", "rk").as[(Long, String, Long)]
        .collect().sorted.toSeq)
    // ranks are dense: 1..#distinct with no gaps
    val ranks = got.select("rk").distinct().as[Long].collect().sorted
    assert(ranks.toSeq == (1L to ranks.length).toSeq)
    // the plan claim in the title: no Window operator, no SinglePartition
    // exchange anywhere — the rank is range-shuffle + per-partition pass
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("longestRepeatedSpans matches brute force on deterministic corpora") {
    val corpora = Seq(
      // exact copy pair + an unrelated doc
      Seq(1L -> "the quick brown fox jumps", 2L -> "the quick brown fox jumps",
        3L -> "entirely different words here"),
      // shared tail (near-dup with first token stripped)
      Seq(1L -> "alpha beta gamma delta", 2L -> "beta gamma delta"),
      // overlapping self-repeat inside one doc
      Seq(1L -> "a a a", 2L -> "b c"),
      // repeat spanning doc interiors only
      Seq(1L -> "x common span y", 2L -> "z common span w"),
      // single doc, no repeats
      Seq(1L -> "one two three"),
      // single token docs
      Seq(1L -> "t", 2L -> "t", 3L -> "u")
    )
    for (c <- corpora)
      assert(runLrs(c) == bruteLrs(c), s"corpus: $c")
  }

  test("longestRepeatedSpans matches brute force on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val docs = (1L to 12L).map { id =>
        val n = 1 + rnd.nextInt(20)
        id -> Seq.fill(n)(('a' + rnd.nextInt(3)).toChar.toString)
          .mkString(" ")
      }
      assert(runLrs(docs) == bruteLrs(docs), s"trial $trial: $docs")
    }
  }

  test("substringDedupStats coverage matches brute force (minLen 2 and " +
    "3, overlap + cross-doc spans)") {
    val corpora = Seq(
      Seq(1L -> "a b c a b c d", 2L -> "x y z"),
      Seq(1L -> "a a a b b", 2L -> "c a a a"),
      Seq(1L -> "p q r s", 2L -> "q r s t", 3L -> "r s t u"))
    for (c <- corpora; ml <- Seq(2, 3)) {
      val got = SuffixArray
        .substringDedupStats(c.toDF("doc_id", "text"), minLen = ml)
        .select("doc_id", "n_tokens", "n_covered")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == bruteCoverage(c, ml), s"minLen=$ml corpus: $c")
    }
    // seeded random cross-check
    val rnd = new scala.util.Random(7)
    val docs = (1L to 10L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(16))(
        ('a' + rnd.nextInt(2)).toChar.toString).mkString(" ")
    }
    val got = SuffixArray
      .substringDedupStats(docs.toDF("doc_id", "text"), minLen = 3)
      .select("doc_id", "n_tokens", "n_covered")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == bruteCoverage(docs, 3), s"random corpus: $docs")
  }

  /** Brute eval overlap: per train doc, longest substring also present
    * anywhere in the eval corpus + minLen coverage. */
  private def bruteEval(train: Seq[(Long, String)], ev: Seq[(Long, String)],
                        minLen: Int): Map[Long, (Long, Long, Long)] = {
    def toks(s: String) = if (s.trim.isEmpty) Seq.empty[String]
    else s.trim.split("\\s+").toSeq
    val evalSubs = (for {
      (_, t) <- ev
      ts = toks(t)
      p <- ts.indices
      m <- 1 to (ts.length - p)
    } yield ts.slice(p, p + m)).toSet
    train.map { case (id, t) =>
      val ts = toks(t)
      def sharedAt(s: Int): Int =
        (1 to (ts.length - s)).reverse
          .find(m => evalSubs.contains(ts.slice(s, s + m))).getOrElse(0)
      val sh = ts.indices.map(sharedAt)
      val covered = ts.indices.count { t0 =>
        (0 to t0).exists(s => sh(s) >= math.max(minLen, t0 - s + 1))
      }
      id -> (ts.length.toLong,
        (if (sh.isEmpty) 0L else sh.max.toLong), covered.toLong)
    }.toMap
  }

  test("evalOverlapStats matches brute force: leaked copies, shared " +
    "phrases, disjoint docs, empty eval") {
    val ev = Seq(100L -> "the secret eval answer phrase",
      101L -> "b b b")
    val train = Seq(
      1L -> "prefix the secret eval answer phrase suffix", // full leak
      2L -> "contains the secret eval only",               // partial
      3L -> "totally unrelated words here",                // disjoint
      4L -> "b b",                                         // overlap-heavy
      5L -> "")                                            // empty text
    for (ml <- Seq(2, 3)) {
      val got = SuffixArray.evalOverlapStats(
          train.toDF("doc_id", "text"), ev.toDF("doc_id", "text"),
          minLen = ml)
        .select("doc_id", "n_tokens", "max_shared", "n_covered")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == bruteEval(train, ev, ml), s"minLen=$ml")
    }
    // empty eval corpus: all zeros but token counts intact
    val none = SuffixArray.evalOverlapStats(
        train.toDF("doc_id", "text"),
        Seq.empty[(Long, String)].toDF("doc_id", "text"), minLen = 2)
      .select("doc_id", "max_shared", "n_covered")
      .as[(Long, Long, Long)].collect()
    assert(none.forall(r => r._2 == 0L && r._3 == 0L))
    // seeded random cross-check
    val rnd = new scala.util.Random(23)
    def randDocs(n: Int, off: Long) = (1L to n.toLong).map { i =>
      (i + off) -> Seq.fill(1 + rnd.nextInt(14))(
        ('a' + rnd.nextInt(2)).toChar.toString).mkString(" ")
    }
    val rt = randDocs(10, 0L)
    val re = randDocs(4, 1000L)
    val got = SuffixArray.evalOverlapStats(rt.toDF("doc_id", "text"),
        re.toDF("doc_id", "text"), minLen = 3)
      .select("doc_id", "n_tokens", "max_shared", "n_covered")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == bruteEval(rt, re, 3), s"random: $rt vs $re")
  }

  test("the assembled stats pipeline plans no single-partition exchange") {
    val plan = SuffixArray.substringDedupStats(
        Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text"),
        minLen = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("prefixCarryMax equals a sequential scan (sparse carriers, " +
    "empty-prefix nulls, all-null)") {
    val rnd = new scala.util.Random(5)
    val rows: Seq[(Long, Option[Long])] = (1L to 500L).map(i =>
      (i, if (rnd.nextInt(10) == 0) Some(i * 7L) else None))
    val got = SuffixArray.prefixCarryMax(
        rows.toDF("ord", "v"), "ord", "v", 500L, "c")
      .select("ord", "c").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    var run: Option[Long] = None
    rows.foreach { case (o, v) =>
      run = (run.toSeq ++ v.toSeq)
        .reduceOption((a: Long, b: Long) => math.max(a, b))
      assert(got(o) == run, s"ord=$o")
    }
    // all-null carriers: everything stays null
    val gotNull = SuffixArray.prefixCarryMax(
        (1L to 20L).map(i => (i, None: Option[Long])).toDF("ord", "v"),
        "ord", "v", 20L, "c")
      .select("c").collect()
    assert(gotNull.forall(_.isNullAt(0)))
  }

  test("degenerate inputs: empty text rows report (0,0); empty corpus " +
    "yields an empty frame; explicit undersized levels are rejected") {
    val withEmpty = Seq(1L -> "a b a b", 2L -> "   ", 3L -> "")
    val got = runLrs(withEmpty)
    assert(got(2L) == (0L, 0L) && got(3L) == (0L, 0L))
    assert(got(1L) == (2L, 0L)) // "a b" repeats at 0 and 2
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.longestRepeatedSpans(empty).count() == 0L)
    intercept[IllegalArgumentException] {
      SuffixArray.longestRepeatedSpans(
        Seq(1L -> ("w " * 40).trim).toDF("doc_id", "text"), levels = 2)
        .collect()
    }
  }
}
