package graft

import graft.operators.{SubstringIndex, SuffixArray}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental substring-dedup maintenance ([[SubstringIndex]]): the
  * append path must be HASH-IDENTICAL to from-scratch
  * [[SuffixArray.substringDeduped]] over the union, while recomputing
  * only the batch + the provably-affected base docs. Window = 4 keeps
  * fixtures readable; q111 runs the production window (16) against the
  * DuckDB rank-formulation replay. */
class SubstringIndexSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4

  // base corpus:
  //  d1/d2 share "a b c d" (dup WITHIN base; canonical (1,0))
  //  d3 all-unique windows — batch doc 10 will duplicate "p q r s"
  //  d4 exactly one window, unique, untouched by any batch doc
  //  d5 shorter than the window (no keys)
  //  d6 carries a NON-canonical "a b c d" at pos 1 (removal covers
  //     pos 1..4) and a base-unique window "d u2 u3 u4" at pos 4 that
  //     batch doc 11 duplicates — the canonical-veto re-activation case:
  //     pos 4 flips removed -> kept, so d6's TEXT changes under append
  private def baseDocs: DataFrame = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x1 a b c d x2 x3 x4"),
    (3L, "p q r s t u v w"),
    (4L, "m n o p"),
    (5L, "s t"),
    (6L, "u1 a b c d u2 u3 u4 u5")
  ).toDF("doc_id", "text")

  // batch: 10 touches d3, 11 touches d6, 12/13 duplicate EACH OTHER,
  // 15 re-duplicates a window already dup in base (occ 2 -> 3: no touch),
  // 14 is short
  private def newDocs: DataFrame = Seq(
    (10L, "p q r s z1 z2 z3 z4"),
    (11L, "y1 y2 d u2 u3 u4 y3"),
    (12L, "w1 w2 w3 w4 w5"),
    (13L, "k1 w1 w2 w3 w4 w5"),
    (14L, "zz"),
    (15L, "a b c d f1 f2 f3 f4")
  ).toDF("doc_id", "text")

  private def collectOut(df: DataFrame): Seq[(Long, String, Long, Long)] =
    df.select("doc_id", "text", "n_tokens_before", "n_tokens_after")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  test("windowKeys: one row per alignment, map-only content keys") {
    val k = SubstringIndex.windowKeys(baseDocs, W)
      .where(col("doc_id") === 1L).orderBy("pos")
      .select("pos", "k1", "k2").as[(Long, Long, Long)].collect()
    assert(k.map(_._1).toSeq == (0L to 4L)) // 8 tokens, W=4 -> 5 windows
    assert(k.map(t => (t._2, t._3)).distinct.length == 5)
    // content-keyed: the same span in ANOTHER doc gets the same key
    val k1d1 = k.head
    val k1d2 = SubstringIndex.windowKeys(baseDocs, W)
      .where(col("doc_id") === 2L && col("pos") === 1L)
      .select("k1", "k2").as[(Long, Long)].collect().head
    assert((k1d1._2, k1d1._3) == k1d2) // "a b c d" in d1@0 == d2@1
    // short docs emit nothing
    assert(SubstringIndex.windowKeys(baseDocs, W)
      .where(col("doc_id") === 5L).count() == 0)
  }

  test("windowKeys plans MAP-ONLY: tokenize, slide, hash in one " +
    "projection — no exchange anywhere") {
    val plan = SubstringIndex.windowKeys(baseDocs, W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("extendIndex(buildIndex(base), batch) == buildIndex(base ∪ batch)") {
    def rows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.select(col("k1"), col("k2"), col("keep.doc_id"), col("keep.pos"),
        col("occ")).as[(Long, Long, Long, Long, Long)].collect().toSet
    val extended = SubstringIndex.extendIndex(
      SubstringIndex.buildIndex(baseDocs, W), newDocs, W)
    val scratch = SubstringIndex.buildIndex(
      baseDocs.unionByName(newDocs), W)
    assert(rows(extended) == rows(scratch))
  }

  test("extendIndexDelta: latest-epoch-wins over (base, delta) equals " +
    "extendIndex's full merge — the delta-epoch store's read theorem " +
    "at the unit level") {
    def rows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.select(col("k1"), col("k2"), col("keep.doc_id"), col("keep.pos"),
        col("occ")).as[(Long, Long, Long, Long, Long)].collect().toSet
    val base = SubstringIndex.buildIndex(baseDocs, W)
    val delta = SubstringIndex.extendIndexDelta(base, newDocs, W)
    // delta rows are exactly the batch-present keys
    assert(rows(delta).map(r => (r._1, r._2)) ==
      rows(SubstringIndex.buildIndex(newDocs, W)).map(r => (r._1, r._2)))
    // latest-wins resolution: delta overrides base per key
    val resolved = base.join(delta.select("k1", "k2"),
        Seq("k1", "k2"), "left_anti")
      .unionByName(delta)
    assert(rows(resolved) ==
      rows(SubstringIndex.extendIndex(base, newDocs, W)))
  }

  test("appendDeduped == from-scratch substringDeduped over the union, " +
    "including the canonical-veto re-activation on a touched base doc") {
    val baseDeduped = SuffixArray.substringDeduped(baseDocs, W)
    val index = SubstringIndex.buildIndex(baseDocs, W)
    val incr = SubstringIndex.appendDeduped(
      baseDocs, baseDeduped, index, newDocs, W)
    val scratch = SuffixArray.substringDeduped(
      baseDocs.unionByName(newDocs), W)
    assert(collectOut(incr) == collectOut(scratch))
    // the veto re-activation really happened: d6's text CHANGED vs its
    // base-only dedup (pos 4 flips removed -> kept)
    val d6Before = collectOut(baseDeduped).find(_._1 == 6L).get._2
    val d6After = collectOut(incr).find(_._1 == 6L).get._2
    assert(d6Before == "u1 u2 u3 u4 u5")
    assert(d6After == "u1 d u2 u3 u4 u5")
    // batch-internal duplication resolved: d13 loses its shared tail to
    // canonical d12
    assert(collectOut(incr).find(_._1 == 13L).get._2 == "k1")
    assert(collectOut(incr).find(_._1 == 12L).get._2 == "w1 w2 w3 w4 w5")
  }

  test("carry/recompute split: untouched base rows come from the " +
    "persisted result verbatim; touched rows are recomputed") {
    val index = SubstringIndex.buildIndex(baseDocs, W)
    // exact touched set: d3 (doc 10 dups its unique window), d6 (doc 11
    // dups its unique window). d1/d2's shared window gains occurrences
    // from doc 15 but was already dup (occ 2) -> untouched.
    val newAgg = SubstringIndex.windowKeys(newDocs, W)
      .groupBy("k1", "k2")
      .agg(min(struct(col("doc_id"), col("pos"))).as("_nk"),
        count(lit(1)).as("_no"))
    assert(SubstringIndex.touchedBaseIds(index, newAgg)
      .as[Long].collect().toSet == Set(3L, 6L))
    // sentinel: poison the persisted result — untouched docs must carry
    // the poison through (proving zero recompute), touched docs must
    // shed it (proving recompute)
    val poisoned = SuffixArray.substringDeduped(baseDocs, W)
      .withColumn("text",
        when(col("doc_id").isin(3L, 4L, 6L), lit("SENTINEL"))
          .otherwise(col("text")))
    val out = collectOut(SubstringIndex.appendDeduped(
      baseDocs, poisoned, index, newDocs, W))
    assert(out.find(_._1 == 4L).get._2 == "SENTINEL") // carried
    assert(out.find(_._1 == 3L).get._2 == "p q r s t u v w") // recomputed
    assert(out.find(_._1 == 6L).get._2 == "u1 d u2 u3 u4 u5") // recomputed
  }

  test("append ordering guard: a batch id <= base max fails loudly") {
    val baseDeduped = SuffixArray.substringDeduped(baseDocs, W)
    val index = SubstringIndex.buildIndex(baseDocs, W)
    val bad = Seq((3L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SubstringIndex.appendDeduped(baseDocs, baseDeduped, index, bad, W)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("does not exceed")), e.toString)
  }

  test("chained appends: extend the index, append again, still equals " +
    "from-scratch over the growing union") {
    val batch2 = Seq(
      (20L, "e f g h e2 e3 e4 e5"), // dups d1's tail window(s)
      (21L, "w2 w3 w4 w5 g7")       // dups the 12/13 shared content
    ).toDF("doc_id", "text")
    val union1 = baseDocs.unionByName(newDocs)
    val index1 = SubstringIndex.extendIndex(
      SubstringIndex.buildIndex(baseDocs, W), newDocs, W)
    val dedup1 = SubstringIndex.appendDeduped(baseDocs,
      SuffixArray.substringDeduped(baseDocs, W),
      SubstringIndex.buildIndex(baseDocs, W), newDocs, W)
    val incr2 = SubstringIndex.appendDeduped(
      union1, dedup1, index1, batch2, W)
    val scratch2 = SuffixArray.substringDeduped(
      union1.unionByName(batch2), W)
    assert(collectOut(incr2) == collectOut(scratch2))
  }

  test("dedupeWithIndex: dedup served FROM a prebuilt index equals " +
    "from-scratch substringDeduped — on the base corpus, and on the " +
    "union via an extended index") {
    val fromIndex = SubstringIndex.dedupeWithIndex(
      baseDocs, SubstringIndex.buildIndex(baseDocs, W), W)
    assert(collectOut(fromIndex) ==
      collectOut(SuffixArray.substringDeduped(baseDocs, W)))
    // the read path also composes with extendIndex (the maintained
    // artifact after an append) — same identity on the union
    val union = baseDocs.unionByName(newDocs)
    val extended = SubstringIndex.extendIndex(
      SubstringIndex.buildIndex(baseDocs, W), newDocs, W)
    assert(collectOut(SubstringIndex.dedupeWithIndex(union, extended, W))
      == collectOut(SuffixArray.substringDeduped(union, W)))
  }
}
