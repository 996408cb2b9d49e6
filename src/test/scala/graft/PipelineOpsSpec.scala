package graft

import graft.operators.{Clustering, Dedup, QualityModels, Retrieval}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Specs for the round-5 pipeline widening: BM25 retrieval, RRF fusion,
  * hashed linear classifier, bigram-LM scoring, distributed k-means, and
  * source mixing. Ground truths are naive JVM reimplementations of the
  * same arithmetic, so agreement proves the distributed formulation, not
  * just self-consistency. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of [[Dedup.md5Long]] (first 14 md5 hex digits as a long). */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString, 16)
  }

  test("bm25: matches a naive single-threaded reimplementation") {
    val corpus = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "c c c d"), (4L, "b b d a"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "a d"), (11L, "c")).toDF("query_id", "qtext")
    val got = Retrieval.bm25(corpus, qs, 3)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet

    // naive ground truth with the operator's exact arithmetic
    val docs = Map(1L -> "a b a", 2L -> "a c", 3L -> "c c c d",
      4L -> "b b d a").view.mapValues(_.split("\\s+").toSeq).toMap
    val n = docs.size.toLong
    val avgdl = docs.values.map(_.size).sum.toDouble / n.toDouble
    def df(t: String) = docs.values.count(_.contains(t)).toLong
    def scoreQ(qterms: Seq[String], id: Long): Long =
      qterms.distinct.filter(t => docs(id).contains(t)).map { t =>
        val tf = docs(id).count(_ == t).toLong
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val contrib = idf * (tf * (1.2 + 1.0)) /
          (tf + (1.2 * (1 - 0.75) + 1.2 * 0.75 * docs(id).size / avgdl))
        math.floor(contrib * 1000000.0 + 0.5).toLong
      }.sum
    val exp = (for {
      (qid, qterms) <- Seq(10L -> Seq("a", "d"), 11L -> Seq("c"))
      ranked = docs.keys.toSeq.map(id => (id, scoreQ(qterms, id)))
        .filter(_._2 != 0L)
        .sortBy { case (id, s) => (-s, id) }.take(3)
      ((id, s), i) <- ranked.zipWithIndex
    } yield (qid, i + 1, id, s.toDouble / 1000000.0)).toSet
    assert(got == exp)
    // the rare term dominates: for query "a d", docs with 'd' outrank the
    // doc that only has 'a' twice
    val q10 = got.filter(_._1 == 10L).toSeq.sortBy(_._2).map(_._3)
    assert(Set(3L, 4L).contains(q10.head))
  }

  test("bm25OverPostings on a prebuilt postings frame equals the " +
    "one-shot form; maxDfFrac drops ubiquitous terms before scoring") {
    val corpus = Seq(
      (1L, "the a b"), (2L, "the a c"), (3L, "the c d"), (4L, "the b d"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "the d")).toDF("query_id", "qtext")
    val post = Retrieval.postings(corpus).cache()
    val oneShot = Retrieval.bm25(corpus, qs, 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    val overPost = Retrieval.bm25OverPostings(post, qs, 4)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(oneShot == overPost)
    // 'the' is in every doc (df = 4 = n): capped at 0.5 it contributes
    // nothing, so only docs containing 'd' survive
    val capped = Retrieval.bm25OverPostings(post, qs, 4, maxDfFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(3L, 4L))
    // uncapped, every doc matches via 'the'
    assert(overPost.map(_._3) == Set(1L, 2L, 3L, 4L))
    // conjunctive mode: only docs containing BOTH 'the' and 'd'
    val conj = Retrieval.bm25OverPostings(post, qs, 4, requireAll = true)
      .select("doc_id").as[Long].collect().toSet
    assert(conj == Set(3L, 4L))
    // conjunctive + df-cap: the capped stopword leaves a 1-term query,
    // which still matches docs with 'd' (cap happens BEFORE the all-of
    // count, so conjunctive queries don't become unmatchable)
    val conjCap = Retrieval.bm25OverPostings(post, qs, 4,
        maxDfFrac = 0.5, requireAll = true)
      .select("doc_id").as[Long].collect().toSet
    assert(conjCap == Set(3L, 4L))
    // an out-of-vocabulary term in a conjunctive query means NO doc can
    // match every term — the result must be empty (OOV terms are not
    // df-capped, so they still count toward the required set)
    val oov = Seq((9L, "the zzznotaword")).toDF("query_id", "qtext")
    assert(Retrieval.bm25OverPostings(post, oov, 4, requireAll = true)
      .count() == 0)
    // ...while the same query in OR mode still ranks by 'the'
    assert(Retrieval.bm25OverPostings(post, oov, 4).count() == 4)
    // the shuffled-queries regime (million-query batches don't
    // broadcast) returns identical rows
    val shuffled = Retrieval.bm25OverPostings(post, qs, 4,
        broadcastQueries = false)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(shuffled == overPost)
    post.unpersist()
  }

  test("PostingsIndex: build + incremental append equals direct postings; " +
    "search serves with the corpus DELETED; bucketing kills the term_key " +
    "exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postidx")
    val corpusPath = s"$dir/docs"
    (0 until 60).map(i =>
        (i.toLong, s"tok${i % 7} tok${i % 11} shared word filler${i % 3}"))
      .toDF("doc_id", "text")
      .write.parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val qs = Seq((1L, "shared tok2"), (2L, "filler1 word"))
      .toDF("query_id", "qtext")
    val direct = Retrieval.bm25(docs, qs, 5)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val idx = new Retrieval.PostingsIndex(spark, "postidx_spec")
    try {
      // build half, append the other half — the incremental lifecycle
      idx.build(docs.where(pmod(col("doc_id"), lit(2)) === 0))
      idx.append(docs.where(pmod(col("doc_id"), lit(2)) === 1))
      // the persisted table IS the direct postings frame, row for row
      val persisted = idx.postingsTable
        .as[(Long, Long, Long, Long)].collect().toSet
      val fresh = Retrieval.postings(docs)
        .select("doc_id", "dl", "term_key", "tf")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(persisted == fresh)
      // zero-corpus-read proof (the q49 discipline): delete the corpus,
      // search anyway — results identical to the pre-deletion direct run
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      val fromIdx = idx.search(qs, 5)
        .select("query_id", "rank", "doc_id", "score")
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(fromIdx == direct)
      // the bucket layout carries the hash distribution: a term_key
      // aggregation over the persisted table plans WITHOUT an exchange
      val aggPlan = idx.postingsTable.groupBy("term_key")
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed term_key agg should not shuffle:\n$aggPlan")
    } finally idx.drop()
  }

  test("histogram + histogramQuantiles: exact counts, clamped edges, " +
    "quantiles within one bucket width of the true order statistic, " +
    "partitioning-invariant") {
    import graft.operators.Sketches
    val vals = (1 to 997).map(i => ("g", (i * 37) % 500 - 10)) ++
      Seq(("g", -999), ("g", 99999)) // out-of-range -> edge buckets
    val df = vals.toDF("grp", "v")
    val h = Sketches.histogram(df, "grp", col("v"), 0.0, 512.0, 64)
    // exact counts: bucket sums must equal the row count
    assert(h.agg(sum("cnt")).head().getLong(0) == vals.length)
    // the clamp: bucket 0 holds every v < 0, bucket 63 every v >= 512
    val byBucket = h.select("bucket", "cnt")
      .as[(Int, Long)].collect().toMap
    val below = vals.count(_._2 < 8) // v in (-inf, 8) -> bucket 0
    assert(byBucket(0) == below)
    assert(byBucket(63) == vals.count(_._2 >= 504))
    // quantile bound: value_le >= true q-th order statistic, and within
    // one bucket width (8.0) above it for in-range quantiles
    val qs = Seq(0.5, 0.9)
    val got = Sketches.histogramQuantiles(df, "grp", col("v"),
        0.0, 512.0, 64, qs)
      .select("q", "value_le").as[(Double, Double)].collect().toMap
    val sorted = vals.map(_._2).sorted
    for (q <- qs) {
      val trueQ = sorted(math.ceil(q * sorted.length).toInt - 1)
      assert(got(q) >= trueQ, s"q=$q: ${got(q)} < $trueQ")
      assert(got(q) <= trueQ + 8.0, s"q=$q: ${got(q)} > $trueQ + width")
    }
    // partitioning invariance (exact counts + integer targets)
    val rep = Sketches.histogramQuantiles(df.repartition(13), "grp",
        col("v"), 0.0, 512.0, 64, qs)
      .select("q", "value_le").as[(Double, Double)].collect().toMap
    assert(rep == got)
  }

  test("text-family edge cases: empty, whitespace-only and symbol-heavy " +
    "docs flow through retrieval and scoring without errors") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "!!! ??? ..."),
      (4L, "normal words here"), (5L, "a"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "normal"), (2L, "")).toDF("query_id", "qtext")
    val r = Retrieval.bm25(docs, qs, 5)
      .as[(Long, Int, Long, Double)].collect()
    // query 1 finds doc 4. The tokenizer maps an empty/whitespace string
    // to ONE empty token on both sides (Spark split-on-trim semantics,
    // same as the oracle's regexp_split), so the empty query matches
    // exactly the empty docs — consistent, deterministic, no crash.
    assert(r.filter(_._1 == 1L).map(_._3).toSeq == Seq(4L))
    assert(r.filter(_._1 == 2L).map(_._3).toSet == Set(1L, 2L))
    assert(QualityModels.hashedLinearScore(docs).count() == 5)
    assert(QualityModels.bigramLmScore(
      docs.where(col("doc_id") =!= 4), docs).count() == 2) // docs 3, 4
    assert(QualityModels.sourceMixtureSample(
      docs.withColumn("source", lit("s")), 100L).count() >= 0)
    import graft.operators.Sketches
    val kmv = Sketches.kmvDistinct(docs, "doc_id", col("text"), 4)
    assert(kmv.count() == 5)
  }

  test("rrfFuse: exact integer contributions, missing-list docs score " +
    "single-sided, ties break by doc_id") {
    val r1 = Seq((1L, 100L, 1), (1L, 101L, 2)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), 10)
      .select("query_id", "rank", "doc_id", "rrf")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    def c(r: Int) = 1000000000L / (60L + r)
    val expTop = Seq(
      (101L, c(2) + c(1)), // in both lists
      (100L, c(1)),
      (102L, c(2)))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._3).toSeq == expTop.map(_._1))
    assert(got.map(_._4).toSeq ==
      expTop.map(_._2.toDouble / 1000000000.0))
  }

  test("hashedLinearScore: derived weights equal the weighted variant " +
    "fed the same md5-derived table; margins are exact") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "delta beta"),
      (3L, "zeta")).toDF("doc_id", "text")
    val nb = 64
    val weights = Array.tabulate(nb)(j =>
      math.floorMod(md5Long(s"w$j"), 2000001L) - 1000000L)
    val a = QualityModels.hashedLinearScore(docs, nb)
      .select("doc_id", "n_tokens", "margin_q", "score", "label")
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._1)
    val b = QualityModels.hashedLinearScoreWeighted(docs, weights)
      .select("doc_id", "n_tokens", "margin_q", "score", "label")
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // exact margin check for doc 1 via the JVM md5 twin
    val toks = Seq("alpha", "beta", "gamma", "alpha")
    val margin = toks.map(t =>
      weights(math.floorMod(md5Long(t), nb.toLong).toInt)).sum
    val row1 = a.find(_._1 == 1L).get
    assert(row1._3 == margin && row1._2 == 4L)
    assert(row1._5 == (if (margin >= 0) 1 else 0))
    val z = margin.toDouble / 1000000.0 / 4L
    // Spark's EXP may differ from Math.exp by 1 ulp (StrictMath vs
    // intrinsic); scores carry that wiggle, which is why the oracle
    // compares r4-rounded scores. Margins above are exact longs.
    assert(math.abs(row1._4 - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
  }

  test("marginExpr: the per-row fold equals the batch explode+agg " +
    "margin bit-for-bit (exact long arithmetic)") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "delta beta"),
      (3L, "zeta"), (4L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val folded = docs.select(col("doc_id"),
        QualityModels.marginExpr(col("text"), 64).as("m"))
      .as[(Long, Long)].collect().toMap
    val batch = QualityModels.hashedLinearScore(docs, 64)
      .select("doc_id", "margin_q").as[(Long, Long)].collect().toMap
    assert(folded == batch)
  }

  test("bigramLmScore: hand-computed add-one probabilities") {
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val target = Seq((3L, "a b x"), (4L, "q")).toDF("doc_id", "text")
    val got = QualityModels.bigramLmScore(train, target)
      .select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // train counts: C(a b)=3, C(b a)=1, C(b c)=1; unigrams a=3, b=3, c=1;
    // V=3. doc 3 bigrams: (a b) -> ln(4/6), (b x) -> ln(1/6).
    def q(x: Double) = math.floor(x * 1000000.0 + 0.5).toLong
    val sumQ = q(math.log((3 + 1.0) / (3 + 3))) +
      q(math.log((0 + 1.0) / (3 + 3)))
    assert(got.map(_._1).toSeq == Seq(3L)) // 1-token doc 4 has no bigrams
    assert(got.head._2 == 2L)
    assert(got.head._3 == sumQ.toDouble / 1000000.0 / 2L)
  }

  test("kmeansAssign separates an obviously clustered corpus and is " +
    "deterministic") {
    // two tight clusters around orthogonal directions
    val rnd = new scala.util.Random(11)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 0f, 1f, 0f)
      (i.toLong, jitter(base).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Clustering.kmeansAssign(corpus, nCells = 2, iters = 3)
      .select("vec_id", "cell", "sim")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val cells = got.map(r => (r._1 % 2, r._2)).distinct
    // every even id in one cell, every odd in the other
    assert(cells.length == 2 && cells.map(_._2).distinct.length == 2)
    // cohesion: everything close to its centroid
    assert(got.forall(_._3 > 0.95))
    val again = Clustering.kmeansAssign(corpus, 2, 3)
      .select("vec_id", "cell", "sim")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("kmeansCentroids: unit-norm floats, k of them, usable as IVF " +
    "coarse layer") {
    val rows = (0 until 24).map { i =>
      val base = Array.fill(8)(0f); base(i % 4) = 1f
      (i.toLong, base.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Clustering.kmeansCentroids(corpus, nCells = 4, iters = 2)
    assert(cents.length == 4)
    cents.foreach { c =>
      val nrm = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-6)
    }
  }

  test("sourceMixtureSample: rates follow the temperature formula and " +
    "the keep test is the deterministic md5 threshold") {
    val docs = (0 until 300).map { i =>
      val src = if (i < 200) "big" else "small"
      (i.toLong, src, "tok " * (5 + i % 3))
    }.toDF("doc_id", "source", "text")
    val budget = 600L
    val got = QualityModels.sourceMixtureSample(docs, budget)
      .select("doc_id", "source", "rate")
      .as[(Long, String, Double)].collect()
    // ground-truth rates
    val st = docs.select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.subtokenCount(col("text")).as("n"))
      .as[(Long, String, Long)].collect()
    val bySrc = st.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val denom = bySrc.toSeq.sortBy(_._1).map { case (_, t) =>
      math.sqrt(t.toDouble) }.sum
    def rateQ(srcToks: Long): Long = math.min(1000000L,
      math.floor(math.sqrt(srcToks.toDouble) / denom * budget.toDouble /
        srcToks * 1000000.0).toLong)
    val expKept = st.filter { case (id, src, _) =>
      math.floorMod(md5Long(s"$id:mix"), 1000000L) < rateQ(bySrc(src))
    }.map(r => (r._1, r._2, rateQ(bySrc(r._2)).toDouble / 1000000.0)).toSet
    assert(got.toSet == expKept)
    // the small source is upweighted: its keep-rate exceeds the big one's
    assert(rateQ(bySrc("small")).toDouble / bySrc("small") >
      rateQ(bySrc("big")).toDouble / bySrc("big"))
  }

  test("kmvDistinct: exact below k, within the estimator's error band " +
    "above it, and the estimate is a pure function of the value set") {
    import graft.operators.Sketches
    val big = (0 until 2000).map(i => ("big", s"value-$i"))
    val small = (0 until 10).map(i => ("small", s"v$i"))
    val dup = (0 until 300).map(i => ("small", s"v${i % 10}")) // duplicates
    val df = (big ++ small ++ dup).toDF("lang", "text")
    val got = Sketches.kmvDistinct(df, "lang", col("text"), k = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // below k: exact
    assert(got("small")._2 == 10L && got("small")._3 == 10.0)
    // above k: KMV estimator, stderr ~ 1/sqrt(62) ~ 13% — allow 3 sigma
    val est = got("big")._3
    assert(math.abs(est - 2000.0) / 2000.0 < 0.4, s"estimate $est")
    // duplicates cannot move the sketch (hash set semantics)
    val noDup = Sketches.kmvDistinct(
      (big ++ small).toDF("lang", "text"), "lang", col("text"), 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(noDup == got)
  }

  test("phraseSearch: matches a naive scan — overlaps, repeated tokens, " +
    "phrase longer than doc, no-match phrases") {
    import graft.operators.Retrieval
    val corpus = Seq(
      (1L, "a b c a b c a b"),    // "a b c": starts 0, 3 -> 2; "a b": 3
      (2L, "a a a a"),            // "a a": overlapping starts 0,1,2 -> 3
      (3L, "c b a"),              // reversed: no "a b c"
      (4L, "a b"))                // too short for the 3-gram
      .toDF("doc_id", "text")
    val phrases = Seq((1L, "a b c"), (2L, "a a"), (3L, "z q"))
      .toDF("phrase_id", "ptext")
    val post = Retrieval.positionalPostings(corpus)
    val got = Retrieval.phraseSearch(post, phrases, 10)
      .select("phrase_id", "doc_id", "n_occurrences", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 1), (2L, 2L, 3L, 1)))
    // the shuffled-join fallback agrees
    val shuffled = Retrieval.phraseSearch(post, phrases, 10,
        broadcastPhrases = false)
      .select("phrase_id", "doc_id", "n_occurrences", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(shuffled == got)
  }

  test("proximitySearch: bucket join equals the naive cross product — " +
    "boundary distances, multiple occurrences, no-match") {
    import graft.operators.Retrieval
    // positions chosen to straddle bucket boundaries at window = 3:
    // doc 1: a@0 b@3 (dist 3 = window, IN), a@0 b@4 would be out
    val corpus = Seq(
      (1L, "a x x b x x x x a b"), // a@0,8; b@3,9
      (2L, "b a"),                 // adjacent, reversed order
      (3L, "a x x x x b"))         // dist 5: out of window
      .toDF("doc_id", "text")
    val qs = Seq((1L, "a", "b")).toDF("query_id", "term_a", "term_b")
    val post = Retrieval.positionalPostings(corpus)
    val got = Retrieval.proximitySearch(post, qs, window = 3, k = 10)
      .select("query_id", "doc_id", "n_pairs", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // naive truth doc 1: pairs (0,3) d3 ✓, (0,9) d9 ✗, (8,3) d5 ✗,
    // (8,9) d1 ✓ -> 2; doc 2: (1,0) d1 ✓ -> 1; doc 3: d5 ✗
    assert(got == Set((1L, 1L, 2L, 1), (1L, 2L, 1L, 2)))
    val shuffled = Retrieval.proximitySearch(post, qs, window = 3, k = 10,
        broadcastQueries = false)
      .select("query_id", "doc_id", "n_pairs", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(shuffled == got)
    // EQUAL term pair: counts unordered pairs of DISTINCT positions —
    // no self-pairs (distance 0), no double orderings. doc 1 has a@0,8
    // (dist 8 > 3: no pair); doc 4 has a@0,2,3: pairs {0,2},{0,3},{2,3}
    val corpus2 = corpus.union(
      Seq((4L, "a x a a")).toDF("doc_id", "text"))
    val qsSame = Seq((1L, "a", "a")).toDF("query_id", "term_a", "term_b")
    val post2 = Retrieval.positionalPostings(corpus2)
    val same = Retrieval.proximitySearch(post2, qsSame, window = 3, k = 10)
      .select("query_id", "doc_id", "n_pairs", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(same == Set((1L, 4L, 3L, 1)))
  }

  test("hllRegisters/hllEstimate: JVM-replayed registers, duplicate " +
    "insensitivity, the exact merge identity, estimator error band") {
    import graft.operators.Sketches
    val values = (0 until 5000).map(i => ("g", s"item-$i"))
    val df = values.toDF("lang", "text")
    val regs = Sketches.hllRegisters(df, "lang", col("text"))
      .as[(String, Long, Int)].collect()
      .map { case (_, b, r) => b -> r }.toMap
    // independent JVM replay of every register
    val expected = scala.collection.mutable.Map.empty[Long, Int]
    values.foreach { case (_, v) =>
      val h = md5Long(v)
      val bucket = h >> 48
      val low = h & ((1L << 48) - 1)
      val rank =
        if (low == 0) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      expected(bucket) = math.max(expected.getOrElse(bucket, 0), rank)
    }
    assert(regs == expected.toMap)
    // duplicates cannot move a register (max of a set)
    val dup = (values ++ values.take(700)).toDF("lang", "text")
    val regsDup = Sketches.hllRegisters(dup, "lang", col("text"))
      .as[(String, Long, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(regsDup == regs)
    // merge identity: max-merge of two halves' registers == whole build
    val (h1, h2) = values.splitAt(2500)
    val merged = Sketches.hllRegisters(h1.toDF("lang", "text"), "lang",
        col("text"))
      .unionByName(Sketches.hllRegisters(h2.toDF("lang", "text"), "lang",
        col("text")))
      .groupBy("lang", "bucket")
      .agg(max("register").as("register"))
      .as[(String, Long, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(merged == regs)
    // raw-estimator accuracy: stderr ~ 1.04/sqrt(256) = 6.5%; allow 3σ
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, "lang", col("text")), "lang")
      .as[(String, Long, Long, Double)].collect().head
    assert(math.abs(est._4 - 5000.0) / 5000.0 < 0.2, s"estimate ${est._4}")
    // NULL values carry nothing
    val withNull = (values :+ (("g", null: String))).toDF("lang", "text")
    val regsNull = Sketches.hllRegisters(withNull, "lang", col("text"))
      .as[(String, Long, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(regsNull == regs)
  }

  test("partitioning invariance: bm25, LM scores, k-means and the KMV " +
    "sketch return identical results under different partitionings — " +
    "the quantized/integer arithmetic claim, exercised") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(23)
    val words = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (0 until 200).map(i => (i.toLong,
      Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(words.length)))
        .mkString(" ")))
      .toDF("doc_id", "text")
    val vecs = (0 until 60).map(i => (i.toLong,
      Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val qs = Seq((1L, "aa ff"), (2L, "cc")).toDF("query_id", "qtext")
    def allOf(parts: Int): (Set[(Long, Int, Long, Double)],
        Set[(Long, Long, Double)], Set[(Long, Int)], Set[(String, Long,
        Double)]) = {
      val d = docs.repartition(parts)
      val v = vecs.repartition(parts)
      (Retrieval.bm25(d, qs, 5)
         .as[(Long, Int, Long, Double)].collect().toSet,
       QualityModels.bigramLmScore(d.where(col("doc_id") % 3 =!= 0), d)
         .as[(Long, Long, Double)].collect().toSet,
       Clustering.kmeansAssign(v, nCells = 3, iters = 2)
         .select("vec_id", "cell").as[(Long, Int)].collect().toSet,
       Sketches.kmvDistinct(d, "text", col("doc_id").cast("string"), 8)
         .as[(String, Long, Double)].collect().toSet)
    }
    assert(allOf(1) == allOf(13))
  }

  test("dotNativeD equals the HOF double dot bit-for-bit") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map(i => (i.toLong,
      Seq.fill(16)(rnd.nextDouble() * 2 - 1),
      Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "a", "b")
    val cmp = rows.select(
      dotNativeD(col("a"), col("b")).as("fast"),
      dot(col("a"), col("b")).as("ref"))
      .as[(Double, Double)].collect()
    assert(cmp.forall { case (f, r) => f == r })
  }

  test("cell-argmax kernel is bit-identical to the literal tree, " +
    "ties to the lowest cell, and takes a 512-centroid table") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    val rows = (0 until 200).map(i => (i.toLong,
      Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "dv")
    // duplicate centroid 0 at index 3: rows nearest to it must ALWAYS
    // report cell 0 (first-max), never 3 — the tie rule the oracles
    // replay as row_number ORDER BY d DESC, cell
    val c0 = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val cents = Array(c0,
      Array.fill(dim)(rnd.nextDouble() * 2 - 1),
      Array.fill(dim)(rnd.nextDouble() * 2 - 1),
      c0.clone())
    val kern = Clustering.withCellD(rows, cents)
      .select("vec_id", "cell", "_sim")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val lit0 = Clustering.withCellDLiteral(rows, cents)
      .select("vec_id", "cell", "_sim")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(kern.toSeq == lit0.toSeq) // exact doubles, exact cells
    assert(kern.forall(_._2 != 3)) // the duplicate never wins a tie
    // the wall the kernel removes: a centroid table far past where the
    // per-centroid literal tree stops planning in reasonable time
    val big = Array.fill(512)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val bigAsg = Clustering.withCellD(rows, big)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assert(bigAsg.length == 200 && bigAsg.forall(r => r._2 >= 0 && r._2 < 512))
  }

  test("assignSplit: complete, disjoint, partition-invariant, " +
    "append-stable, proportions near the ppm fractions") {
    import graft.operators.TextAnalysis
    val df = (0L until 2000L).toDF("doc_id")
    val splits = Seq(("train", 800000L), ("val", 100000L),
      ("test", 100000L))
    val got = TextAnalysis.assignSplit(df, "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(got.size == 2000) // complete: one label per row
    assert(got.values.toSet.subsetOf(Set("train", "val", "test")))
    // proportions: binomial 4-sigma bands around 1600/200/200
    val counts = got.values.groupBy(identity).view.mapValues(_.size)
    assert(math.abs(counts("train") - 1600) < 4 * math.sqrt(2000 * .8 * .2))
    assert(math.abs(counts("val") - 200) < 4 * math.sqrt(2000 * .1 * .9))
    assert(math.abs(counts("test") - 200) < 4 * math.sqrt(2000 * .1 * .9))
    // partition-invariant AND append-stable: the same row keeps its
    // split regardless of physical layout or which batch it arrives in
    val rep = TextAnalysis.assignSplit(df.repartition(17), "doc_id",
      splits).as[(Long, String)].collect().toMap
    assert(rep == got)
    val half = TextAnalysis.assignSplit(
      df.where(col("doc_id") < 1000), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(half.forall { case (id, sp) => got(id) == sp })
    // bad fractions fail fast
    intercept[IllegalArgumentException] {
      TextAnalysis.assignSplit(df, "doc_id", Seq(("a", 1L), ("b", 2L)))
    }
    // a NULL id has no draw: split is NULL, never a silent fall-through
    // into the last label
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    val ns = TextAnalysis.assignSplit(withNull, "doc_id", splits)
      .select("split").collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(ns.count(_ == null) == 1 && ns.count(_ != null) == 1)
  }

  test("cellOutliers: bottom-k per cell by centroid cosine, ties by id, " +
    "agrees with a naive re-rank of the assignment") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val got = Clustering.cellOutliers(rows, nCells = 4, iters = 2,
        perCell = 3)
      .select("vec_id", "cell", "sim", "rank")
      .as[(Long, Int, Double, Int)].collect()
    val asg = Clustering.kmeansAssign(rows, nCells = 4, iters = 2)
      .as[(Long, Int, Double)].collect()
    val naive = asg.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
      members.sortBy(m => (m._3, m._1)).take(3).zipWithIndex
        .map { case ((id, c, sim), i) => (id, c, sim, i + 1) }
    }
    assert(got.sortBy(t => (t._2, t._4)).toSeq ==
      naive.sortBy(t => (t._2, t._4)))
    assert(got.groupBy(_._2).values.forall(_.length <= 3))
  }

  test("tfidf: matches a naive single-threaded reimplementation; " +
    "a verbatim-duplicate query ranks its doc first at cosine 1") {
    val corpus = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "c c c d"), (4L, "b e d a"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "a d"), (11L, "c"), (12L, "b e d a"))
      .toDF("query_id", "qtext")
    val got = Retrieval.tfidfSearch(corpus, qs, 4)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet

    // naive ground truth with the operator's exact arithmetic
    val docs = Map(1L -> "a b a", 2L -> "a c", 3L -> "c c c d",
      4L -> "b e d a").view.mapValues(_.split("\\s+").toSeq).toMap
    val n = docs.size.toLong
    def df(t: String) = docs.values.count(_.contains(t)).toLong
    def idfq(t: String): Long =
      math.floor(math.log((n + 1.0) / (df(t) + 1.0)) * 1000.0 + 0.5).toLong
    def docW(id: Long): Map[String, Long] =
      docs(id).groupBy(identity).view
        .mapValues(ts => ts.size.toLong * idfq(ts.head)).toMap
    def scoreQ(qterms: Seq[String], id: Long): Long = {
      val dw = docW(id)
      val qw = qterms.distinct.map(t => t -> idfq(t)).toMap
      val dot = qw.map { case (t, w) => dw.getOrElse(t, 0L) * w }.sum
      val nsq = dw.values.map(w => w * w).sum
      val qnsq = qw.values.map(w => w * w).sum
      math.floor(dot.toDouble /
        (math.sqrt(nsq.toDouble) * math.sqrt(qnsq.toDouble)) *
        1000000.0 + 0.5).toLong
    }
    val exp = (for {
      (qid, qterms) <- Seq(10L -> Seq("a", "d"), 11L -> Seq("c"),
        12L -> Seq("b", "e", "d", "a"))
      // only docs sharing >= 1 query term are candidates (the postings
      // join restricts before scoring)
      ranked = docs.keys.toSeq
        .filter(id => qterms.distinct.exists(docs(id).contains))
        .map(id => (id, scoreQ(qterms, id)))
        .sortBy { case (id, s) => (-s, id) }.take(4)
      ((id, s), i) <- ranked.zipWithIndex
    } yield (qid, i + 1, id, s.toDouble / 1000000.0)).toSet
    assert(got == exp)
    // query 12 IS doc 4 (all-distinct terms, so tf=1 both sides):
    // cosine is exactly 1 and doc 4 ranks first
    val q12 = got.filter(_._1 == 12L).toSeq.sortBy(_._2)
    assert(q12.head._3 == 4L && q12.head._4 == 1.0, q12.toString)
    // over-postings form + the non-broadcast query regime agree
    val post = Retrieval.postings(corpus)
    val shuffled = Retrieval.tfidfOverPostings(post, qs, 4,
        broadcastQueries = false)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(shuffled == got)
  }

  test("clusterBalancedSample: per-cell cap via the deterministic ppm " +
    "draw, agrees with a naive re-rank of the assignment") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val got = Clustering.clusterBalancedSample(rows, nCells = 4,
        iters = 2, perCell = 3)
      .select("vec_id", "cell", "draw", "rank")
      .as[(Long, Int, Long, Int)].collect()
    def draw(id: Long): Long =
      java.lang.Math.floorMod(md5Long(s"$id:cbs"), 1000000L)
    val asg = Clustering.kmeansAssign(rows, nCells = 4, iters = 2)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    val naive = asg.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
      members.map(_._1).sortBy(id => (draw(id), id)).take(3).zipWithIndex
        .map { case (id, i) => (id, cell, draw(id), i + 1) }
    }
    assert(got.sortBy(t => (t._2, t._4)).toSeq ==
      naive.sortBy(t => (t._2, t._4)))
    assert(got.groupBy(_._2).values.forall(_.length <= 3))
  }

  test("bloomBits: no false negatives, deterministic false positives " +
    "match the JVM hash replay, union merges bitwise, bounded by mBits") {
    import graft.operators.Sketches
    val mBits = 256; val k = 3
    val members = (1 to 60).map(i => s"doc$i")
    val others = (61 to 200).map(i => s"doc$i")
    val bloom = Sketches.bloomBits(members.toDF("w"), col("w"), mBits, k)
    val bits = bloom.as[Long].collect().toSet
    assert(bits.size <= math.min(mBits, members.size * k))
    val got = Sketches.bloomMightContain(bloom,
        (members ++ others).toDF("w"), "w", mBits, k)
      .as[(String, Boolean)].collect().toMap
    // the Bloom contract: every member answers true
    members.foreach(w => assert(got(w), s"$w: false negative"))
    // false positives exist by sizing and match the JVM replay exactly
    def hv(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16) % Dedup.P
    }
    def positions(w: String): Seq[Long] = (0 until k).map(j =>
      (Dedup.hashA(j) * hv(w) + Dedup.hashB(j)) % Dedup.P % mBits)
    others.foreach { w =>
      assert(got(w) == positions(w).forall(bits), s"$w diverges")
    }
    assert(others.exists(got(_)) && others.exists(!got(_)))
    // merge = union + distinct (bitwise OR of bit sets)
    val (a, b) = members.splitAt(25)
    val merged = Sketches.bloomBits(a.toDF("w"), col("w"), mBits, k)
      .unionByName(Sketches.bloomBits(b.toDF("w"), col("w"), mBits, k))
      .distinct().as[Long].collect().toSet
    assert(merged == bits)
  }

  test("countMin: never under-counts, exact without collisions, merges " +
    "by sum, partition-invariant, bounded by depth x width") {
    import graft.operators.Sketches
    val depth = 3; val width = 64
    // 40 distinct tokens with skewed frequencies 1..40
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(s"tok$i"))
    val df = rows.toDF("w")
    val sketch = Sketches.countMin(df, col("w"), depth, width)
    val cells = sketch.collect()
    assert(cells.length <= depth * width)
    // identical sketch regardless of physical layout (order-independence
    // is the property that makes CMS distributable at all)
    val rep = Sketches.countMin(df.repartition(13), col("w"), depth, width)
    assert(rep.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq ==
      cells.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq)
    // point estimates: est >= truth for EVERY token (the CMS guarantee)
    val est = Sketches.countMinEstimate(sketch, df, "w", depth, width)
      .as[(String, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (w, t) => assert(est(w) >= t, s"$w: ${est(w)} < $t") }
    // replay the hash chain in plain JVM arithmetic: tokens whose
    // (row, bucket) cells collide with no other token must be EXACT
    def hv(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16) % Dedup.P
    }
    def bucket(j: Int, h: Long): Long =
      (Dedup.hashA(j) * h + Dedup.hashB(j)) % Dedup.P % width
    val toks = truth.keySet.toSeq
    val collisionFree = toks.filter { w =>
      (0 until depth).exists(j =>
        toks.forall(o => o == w || bucket(j, hv(o)) != bucket(j, hv(w))))
    }
    assert(collisionFree.nonEmpty)
    collisionFree.foreach(w => assert(est(w) == truth(w), s"$w inexact"))
    // mergeability: sketch(A union B) = cellwise sum of the halves
    val (a, b) = rows.splitAt(300)
    val merged = Sketches.countMin(a.toDF("w"), col("w"), depth, width)
      .unionByName(Sketches.countMin(b.toDF("w"), col("w"), depth, width))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(merged.toSeq == cells
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq)
  }

  test("datasetManifest: order/partition invariant; id checksum catches " +
    "membership drift, content checksum catches edits and id-text swaps") {
    import graft.operators.Pipeline
    val rows = Seq((1L, "g1", "alpha beta"), (2L, "g1", "gamma"),
      (3L, "g2", "delta eps"), (4L, "g2", "zeta"), (5L, "g2", "eta theta"))
    val df = rows.toDF("doc_id", "grp", "text")
    def m(d: org.apache.spark.sql.DataFrame)
        : Seq[(String, Long, Long, Long, Long, Long, Long)] =
      Pipeline.datasetManifest(d, "grp")
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val base = m(df)
    assert(base.map(_._1) == Seq("g1", "g2"))
    assert(base.map(_._2) == Seq(2L, 3L)) // n_docs
    // JVM replay of the checksum arithmetic
    def key(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(14), 16)
    val mod = BigInt(1) << 56
    val wantCk = rows.groupBy(_._2).view.mapValues { rs =>
      ((rs.map(r => BigInt(key(r._1.toString))).sum % mod).toLong,
        (rs.map(r => BigInt(key(s"${r._1}:${r._3}"))).sum % mod).toLong)
    }.toMap
    base.foreach { r =>
      assert((r._6, r._7) == wantCk(r._1), r._1) }
    // invariance: partitioning and row order never move the manifest
    assert(m(df.repartition(7)) == base)
    assert(m(df.orderBy(desc("doc_id"))) == base)
    // a single-character edit flips ONLY the content checksum
    val edited = Seq((1L, "g1", "alpha betb"), (2L, "g1", "gamma"))
      .toDF("doc_id", "grp", "text")
    val origG1 = m(df.where(col("grp") === "g1")).head
    val edG1 = m(edited).head
    assert(edG1._6 == origG1._6 && edG1._7 != origG1._7)
    // swapping texts between two ids preserves counts/tokens but not
    // the content checksum
    val swapped = Seq((1L, "g1", "gamma"), (2L, "g1", "alpha beta"))
      .toDF("doc_id", "grp", "text")
    val swG1 = m(swapped).head
    assert(swG1._2 == origG1._2 && swG1._3 == origG1._3 &&
      swG1._6 == origG1._6 && swG1._7 != origG1._7)
    // dropping a row flips the id checksum even at equal token counts
    val dropped = m(df.where(col("doc_id") =!= 2L)
      .where(col("grp") === "g1")).head
    assert(dropped._6 != origG1._6)
  }

  test("assignSplitLeakageSafe: every pair's endpoints share a split; " +
    "unpaired docs match the naive assignment; append-stable for " +
    "untouched clusters") {
    import graft.operators.{Pipeline, TextAnalysis}
    val docs = (1L to 60L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters: {1,2,3}, {10,11}, {20,21,22,23} via chains
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L)).toDF("id1", "id2")
    val got = Pipeline.assignSplitLeakageSafe(docs, pairs)
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // endpoints of every pair agree
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).foreach { case (a, b) =>
      assert(got(a)._2 == got(b)._2, s"($a,$b)")
    }
    // representatives are the component minima; members share them
    assert(Seq(1L, 2L, 3L).map(got(_)._1).distinct == Seq(1L))
    assert(Seq(20L, 21L, 22L, 23L).map(got(_)._1).distinct == Seq(20L))
    // unpaired docs = the naive per-doc draw (rep falls back to own id)
    val naive = TextAnalysis.assignSplit(docs, "doc_id",
        Seq(("train", 800000L), ("val", 100000L), ("test", 100000L)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (1L to 60L).filterNot(Set(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 23L))
      .foreach { id =>
        assert(got(id)._1 == id && got(id)._2 == naive(id), s"doc $id") }
    // the cluster draw equals the naive draw OF THE REPRESENTATIVE —
    // so splits stay append-stable when a cluster gains members
    assert(got(3L)._2 == naive(1L) && got(23L)._2 == naive(20L))
    val morePairs = pairs.unionByName(Seq((3L, 4L)).toDF("id1", "id2"))
    val grown = Pipeline.assignSplitLeakageSafe(docs, morePairs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(grown(4L) == got(1L)._2)            // new member joins the split
    assert(grown(20L) == got(20L)._2)          // untouched cluster unmoved
  }

  test("corpusDiff: added/removed/changed classified, unchanged dropped, " +
    "null text is content (not absence)") {
    import graft.operators.Pipeline
    val before = Seq((1L, "same"), (2L, "old"), (3L, "gone"),
      (4L, null: String), (5L, "keepnull")).toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new"), (6L, "fresh"),
      (4L, null: String), (5L, null: String)).toDF("doc_id", "text")
    val got = Pipeline.corpusDiff(before, after)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"),
      (5L, "changed"), (6L, "added")))
    // identical corpora diff to nothing, regardless of partitioning
    assert(Pipeline.corpusDiff(before, before.repartition(5)).count() == 0)
  }
}
