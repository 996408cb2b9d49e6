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
}
