package graft

import graft.api.SubstringDedupStore
import graft.operators.SuffixArray
import org.apache.spark.sql.DataFrame

/** The persisted incremental-dedup store: every committed epoch's
  * `deduped` must equal from-scratch [[SuffixArray.substringDeduped]]
  * over the corpus as of that epoch — across appends, reopen, crash
  * litter, and replayed commits. Window = 4, the SubstringIndexSpec
  * fixture discipline. */
class SubstringDedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4

  private def baseDocs: DataFrame = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x1 a b c d x2 x3 x4"),
    (3L, "p q r s t u v w"),
    (6L, "u1 a b c d u2 u3 u4 u5")
  ).toDF("doc_id", "text")

  private def batch1: DataFrame = Seq(
    (10L, "p q r s z1 z2 z3 z4"), // duplicates d3's base-unique window
    (11L, "w1 d u2 u3 u4 w2 w3 w4") // re-activates the veto over d6
  ).toDF("doc_id", "text")

  private def batch2: DataFrame = Seq(
    (20L, "e f g h e2 e3 e4 e5"),
    (21L, "a b c d")
  ).toDF("doc_id", "text")

  private def collectOut(df: DataFrame): Seq[(Long, String, Long, Long)] =
    df.select("doc_id", "text", "n_tokens_before", "n_tokens_after")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  test("init → append → reopen → append: every epoch's deduped equals " +
    "from-scratch over that epoch's corpus; artifacts survive reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sds").toString + "/store"
    val s0 = SubstringDedupStore.init(spark, root, baseDocs, W)
    assert(s0.epoch == 0L)
    assert(collectOut(s0.deduped) ==
      collectOut(SuffixArray.substringDeduped(baseDocs, W)))

    assert(s0.append(batch1) == 1L)
    val union1 = baseDocs.unionByName(batch1)
    assert(collectOut(s0.deduped) ==
      collectOut(SuffixArray.substringDeduped(union1, W)))

    // REOPEN from disk only, then append again — the artifacts carry
    val s1 = SubstringDedupStore.open(spark, root, W)
    assert(s1.epoch == 1L)
    assert(s1.append(batch2) == 2L)
    val union2 = union1.unionByName(batch2)
    assert(collectOut(s1.deduped) ==
      collectOut(SuffixArray.substringDeduped(union2, W)))
    // corpus is the full union; time-travel serves the old epoch
    assert(s1.corpus.count() == union2.count())
    assert(collectOut(s1.dedupedAt(1L)) ==
      collectOut(SuffixArray.substringDeduped(union1, W)))
  }

  test("crash mid-append leaves unmarked litter that open() ignores and " +
    "a retry overwrites; a replayed commit onto a marked epoch fails " +
    "loudly; double init fails") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sds2").toString + "/store"
    SubstringDedupStore.init(spark, root, baseDocs, W)
    intercept[IllegalArgumentException] {
      SubstringDedupStore.init(spark, root, baseDocs, W)
    }
    // simulate a crash: epoch-1 artifact litter WITHOUT a marker
    Seq((99L, "junk junk junk junk")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/deduped/epoch=1")
    val s = SubstringDedupStore.open(spark, root, W)
    assert(s.epoch == 0L) // unmarked epoch is invisible
    // the retry appends cleanly over the litter
    assert(s.append(batch1) == 1L)
    assert(collectOut(s.deduped) == collectOut(
      SuffixArray.substringDeduped(baseDocs.unionByName(batch1), W)))
    // replaying the SAME epoch commit is rejected at the marker
    intercept[Exception] {
      val again = SubstringDedupStore.open(spark, root, W)
      // force a duplicate marker create for epoch 1
      val m = new org.apache.hadoop.fs.Path(s"$root/_commits/1")
      val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(m, false).close()
      again // unreachable use to keep the value live
    }
    // the id-ordering guard surfaces through append
    val e = intercept[Exception] {
      s.append(Seq((3L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("does not exceed")), e.toString)
  }
}
