package graft

import graft.functions.DeltaFoldAggregator
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants (SURVEY §5.2): fold order-insensitivity and
  * merge associativity of the delta fold, over 200 seeded random cases —
  * pure Aggregator-level checks, no Spark jobs needed. */
class PropertySpec extends AnyFunSuite {

  private val dim = 16
  private val agg = new DeltaFoldAggregator(dim)
  private val rnd = new scala.util.Random(4242)

  private def randomDelta(): (Seq[Int], Seq[Float]) = {
    val n = rnd.nextInt(7)
    val idx = Seq.fill(n)(rnd.nextInt(dim + 5) - 2) // incl. out-of-range
    val vs = Seq.fill(n)(rnd.nextFloat() * 2 - 1)
    (idx, vs)
  }

  test("delta fold is order-insensitive (element-wise addition commutes)") {
    for (_ <- 1 to 200) {
      val deltas = Seq.fill(5)(randomDelta())
      val forward = deltas.foldLeft(agg.zero)(agg.reduce)
      val backward = deltas.reverse.foldLeft(agg.zero)(agg.reduce)
      assert(forward.zip(backward).forall { case (a, b) =>
        math.abs(a - b) < 1e-9 })
    }
  }

  test("merge(reduce(a), reduce(b)) == reduce(a ++ b) (partial-agg safety)") {
    for (_ <- 1 to 200) {
      val as = Seq.fill(3)(randomDelta())
      val bs = Seq.fill(3)(randomDelta())
      val merged = agg.merge(
        as.foldLeft(agg.zero)(agg.reduce),
        bs.foldLeft(agg.zero)(agg.reduce))
      val together = (as ++ bs).foldLeft(agg.zero)(agg.reduce)
      assert(merged.zip(together).forall { case (a, b) =>
        math.abs(a - b) < 1e-9 })
    }
  }

  test("out-of-range indices never contribute") {
    for (_ <- 1 to 200) {
      val d = randomDelta()
      val acc = agg.reduce(agg.zero, d)
      val expected = Array.fill(dim)(0.0)
      d._1.zip(d._2).foreach { case (i, v) =>
        if (i >= 0 && i < dim) expected(i) += v.toDouble }
      assert(acc.zip(expected).forall { case (a, b) => a == b })
    }
  }

  test("PQ trainer: bit-deterministic, k clamps to n, ks>n degenerates sanely") {
    import graft.operators.SimilaritySearch
    for (trial <- 1 to 50) {
      val r = new scala.util.Random(trial)
      val n = 1 + r.nextInt(30)
      val d = 2 + 2 * r.nextInt(4)
      val sample = Array.fill(n)(Array.fill(d)(r.nextFloat() * 2 - 1))
      val a = SimilaritySearch.lloydQuantizedL2(sample.map(_.clone()), 8, 3)
      val b = SimilaritySearch.lloydQuantizedL2(sample.map(_.clone()), 8, 3)
      // determinism: two runs over the same sample are bit-identical
      // (oracle replay depends on this)
      assert(a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) })
      assert(a.length == math.min(8, n)) // k clamps to the sample size
      // every centroid stays inside the data's bounding box (means of
      // grid-quantized members can't escape it by more than the grid step)
      val lo = (0 until d).map(i => sample.map(_(i)).min - 0.001f)
      val hi = (0 until d).map(i => sample.map(_(i)).max + 0.001f)
      assert(a.forall(c => (0 until d).forall(i =>
        c(i) >= lo(i) && c(i) <= hi(i))))
    }
  }

  test("spanDeduped invariants on random collision-heavy corpora: " +
    "token conservation, canonical survivorship, idempotence") {
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    import spark.implicits._
    val w = 4 // small window so random 3-token-alphabet docs collide a lot
    for (seed <- Seq(1, 7, 42)) {
      val r = new scala.util.Random(seed)
      val docs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(4 + r.nextInt(12))(s"t${r.nextInt(3)}")
          .mkString(" "))
      }.toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis.spanDeduped(docs, w)
        .as[(Long, String, Long, Long, Long)].collect()
      // conservation: after = before - w*removed, and the rebuilt text
      // has exactly `after` tokens
      assert(out.forall(r0 => r0._5 == r0._4 - w * r0._3))
      assert(out.forall(r0 =>
        r0._2.split("\\s+").count(_.nonEmpty) ==
          (if (r0._2.trim.isEmpty) 0 else r0._5)))
      // canonical survivorship: each distinct full tile of the INPUT
      // corpus survives in at least one output doc's full-tile set is
      // too strong after re-tiling; instead assert the global removal
      // count matches occurrences-minus-distinct over input full tiles
      val tiles = docs.as[(Long, String)].collect().flatMap {
        case (_, t) =>
          val toks = t.trim.split("\\s+")
          toks.grouped(w).filter(_.length == w).map(_.mkString(" "))
      }
      val expectRemoved = tiles.length - tiles.distinct.length
      assert(out.map(_._3).sum == expectRemoved)
      // idempotence: a second pass finds nothing (kept tiles are all
      // distinct corpus-wide, and re-tiling only shifts boundaries for
      // docs whose removals were interior — both passes agree here
      // because removals leave distinct tile multisets)
      val again = graft.operators.TextAnalysis
        .spanDeduped(out.toSeq.map(r0 => (r0._1, r0._2))
          .toDF("doc_id", "text"), w)
        .agg(sum("n_tiles_removed")).as[Long].head()
      assert(again == 0L, s"seed $seed: second pass removed $again")
    }
  }

  test("PQ codebooks: subspace slices train independently") {
    import graft.operators.SimilaritySearch
    val r = new scala.util.Random(99)
    val sample = Array.fill(20)(Array.fill(8)(r.nextFloat()))
    val books = SimilaritySearch.pqCodebooks(sample, m = 4, ks = 4, iters = 3)
    val direct = (0 until 4).map { s =>
      SimilaritySearch.lloydQuantizedL2(
        sample.map(v => java.util.Arrays.copyOfRange(v, s * 2, s * 2 + 2)),
        4, 3)
    }
    assert(books.zip(direct).forall { case (bk, dr) =>
      bk.zip(dr).forall { case (x, y) => x.sameElements(y) } })
  }

  test("video fingerprint properties: brightness-shift invariance, " +
    "sampled-frame determinism, majority absorbs minority-frame edits") {
    import graft.operators.Video
    val rnd2 = new scala.util.Random(77)
    for (_ <- 1 to 20) {
      val w = 16; val h = 16; val nf = 5
      val base = Array.fill(nf)(Array.fill(w * h)(rnd2.nextInt(200)))
      def avi(frames: Array[Array[Int]]): Array[Byte] =
        Video.buildAviRgb24(frames.map(_.map(v => v * 0x010101)), w, h)
      val fp = Video.fingerprint56(avi(base))
      assert(fp != null)
      // dHash compares cell means, so a uniform +c (no wraparound)
      // cannot flip any comparison — per frame, hence for the majority
      val shifted = base.map(_.map(_ + 50))
      assert(Video.fingerprint56(avi(shifted)) == fp)
      // replacing ONE frame of five (a strict minority under full
      // sampling) can flip a bit only where the vote was 3-2; flipping
      // that single frame's contribution moves each bit's count by at
      // most 1, so bits with a 4-1 or 5-0 vote are immovable — with
      // 5 frames the fingerprint changes by at most the 3-2 bit count
      val counts = (0 until graft.operators.Dedup.SimhashBits).map { j =>
        base.count { f =>
          val lum = f.map(v => 1000L * v)
          ((graft.operators.Multimodal.dHashOfGrid(w, h, lum) >> j)
            & 1L) == 1L
        }
      }
      val contested = counts.count(c => c == 2 || c == 3)
      val oneEdit = base.clone()
      oneEdit(2) = Array.fill(w * h)(rnd2.nextInt(200))
      val fpEdit = Video.fingerprint56(avi(oneEdit))
      assert(java.lang.Long.bitCount(fp ^ fpEdit.longValue()) <= contested)
    }
  }
}
