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

  test("delta epochs: per-append write volume is touched∪batch, not " +
    "corpus; compact() snapshots and prunes; pruned epochs fail loudly; " +
    "an interrupted compact (no snapshot marker) still reads correctly") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("graft-sds3").toString + "/store"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/$p"))

    val s = SubstringDedupStore.init(spark, root, baseDocs, W)
    s.append(batch1)
    s.append(batch2)
    val union1 = baseDocs.unionByName(batch1)
    val union2 = union1.unionByName(batch2)
    val want2 = collectOut(SuffixArray.substringDeduped(union2, W))
    assert(collectOut(s.deduped) == want2)

    // WRITE VOLUME: epoch 2's deduped delta holds exactly the changed
    // rows — batch2's two docs plus the base docs batch2 touched (doc 1:
    // "e f g h" was base-unique and doc 20 duplicates it; "a b c d" was
    // already duplicated in the base, so doc 21 touches nothing) — never
    // the 8-doc corpus
    val d2 = spark.read.parquet(s"$root/deduped/epoch=2")
    assert(d2.count() == 3L,
      s"expected 3 delta rows, got ${d2.count()}")
    assert(d2.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 20L, 21L))
    // epoch 2's index delta holds only batch2-present keys
    val i2 = spark.read.parquet(s"$root/index/epoch=2")
    val batchKeys = graft.operators.SubstringIndex
      .windowKeys(batch2, W).select("k1", "k2").distinct().count()
    assert(i2.count() == batchKeys)

    // an INTERRUPTED compact (commit marker written, snapshot marker
    // not): epoch 3 holds full artifacts but reads as a delta —
    // latest-wins over a full index/deduped IS that state
    graft.operators.Ckpt.eager(s.index)
      .write.parquet(s"$root/index/epoch=3")
    graft.operators.Ckpt.eager(s.deduped)
      .write.parquet(s"$root/deduped/epoch=3")
    s.corpus.limit(0).write.parquet(s"$root/corpus/epoch=3")
    fs.create(new org.apache.hadoop.fs.Path(s"$root/_commits/3"), false)
      .close()
    assert(s.epoch == 3L && s.latestSnapshot == 0L)
    assert(collectOut(s.deduped) == want2)

    // a real compact() absorbs everything into a new snapshot epoch,
    // prunes the absorbed index/deduped deltas, keeps every corpus dir
    val snap = s.compact()
    assert(snap == 4L && s.latestSnapshot == 4L)
    assert(collectOut(s.deduped) == want2)
    assert(collectOut(s.dedupedAt(4L)) == want2)
    assert(!exists("deduped/epoch=1") && !exists("index/epoch=2") &&
      !exists("deduped/epoch=3") && !exists("_snapshots/0"))
    assert(exists("corpus/epoch=1") && exists("corpus/epoch=2"))
    // time-travel below the snapshot fails loudly
    val gone = intercept[IllegalArgumentException] { s.dedupedAt(1L) }
    assert(gone.getMessage.contains("pruned"))
    // compact on an already-snapshot head is a no-op sweep
    assert(s.compact() == 4L)

    // an INTERRUPTED PRUNE (snapshot + markers written, old dirs left):
    // readers never resolve below the snapshot so the litter is
    // invisible, and the next compact() — with nothing new to absorb —
    // finishes the sweep
    s.deduped.limit(1).write.mode("overwrite")
      .parquet(s"$root/deduped/epoch=2")
    assert(collectOut(s.deduped) == want2) // litter invisible
    assert(s.compact() == 4L)              // no-op absorb, sweeps
    assert(!exists("deduped/epoch=2"))
    assert(collectOut(s.deduped) == want2)

    // the index snapshot equals a from-scratch build over the union
    val wantIdx = graft.operators.SubstringIndex.buildIndex(union2, W)
      .select(col("k1"), col("k2"), col("keep.doc_id"), col("keep.pos"),
        col("occ")).as[(Long, Long, Long, Long, Long)]
      .collect().sorted.toSeq
    assert(s.index
      .select(col("k1"), col("k2"), col("keep.doc_id"), col("keep.pos"),
        col("occ")).as[(Long, Long, Long, Long, Long)]
      .collect().sorted.toSeq == wantIdx)

    // appends continue over the snapshot, and a reopened store agrees
    val batch3 = Seq((30L, "x1 a b c d n1 n2 n3")).toDF("doc_id", "text")
    assert(s.append(batch3) == 5L)
    val want3 = collectOut(SuffixArray.substringDeduped(
      union2.unionByName(batch3), W))
    assert(collectOut(s.deduped) == want3)
    assert(collectOut(SubstringDedupStore.open(spark, root, W).deduped)
      == want3)
  }
}
