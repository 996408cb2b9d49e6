package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("l2Norm of 3-4-5 triangle") {
    val v = lit(Array(3.0f, 4.0f))
    assert(math.abs(one[Double](l2Norm(v)) - 5.0) < 1e-9)
  }

  test("dot product") {
    val a = lit(Array(1.0f, 2.0f, 3.0f))
    val b = lit(Array(4.0f, -5.0f, 6.0f))
    assert(math.abs(one[Double](dot(a, b)) - 12.0) < 1e-9)
  }

  test("cosine of identical vectors is 1") {
    val a = lit(Array(0.6f, 0.8f))
    assert(math.abs(one[Double](cosine(a, a)) - 1.0) < 1e-9)
  }

  test("l2Dist") {
    val a = lit(Array(1.0f, 1.0f))
    val b = lit(Array(4.0f, 5.0f))
    assert(math.abs(one[Double](l2Dist(a, b)) - 5.0) < 1e-9)
  }

  test("l2Normalize produces unit norm") {
    val v = lit(Array(3.0f, 4.0f))
    val n = one[Double](l2Norm(l2Normalize(v)))
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("codegen l2NormNative / l2NormalizeWithNative are bit-identical " +
    "to the HOF forms over random vectors") {
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 4 - 2))).toDF("id", "v")
    val normMismatch = vecs.select(
        l2Norm(col("v")).as("a"), l2NormNative(col("v")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(normMismatch == 0)
    val scaleMismatch = vecs
      .withColumn("_n", l2NormNative(col("v")))
      .where(col("_n") > 0)
      .select(l2NormalizeWith(col("v"), col("_n")).as("a"),
        l2NormalizeWithNative(col("v"), col("_n")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(scaleMismatch == 0)
  }

  test("codegen sparseDiffNative is bit-identical to the HOF pipeline " +
    "(idx, val, count, raw magnitude) over random vectors") {
    val rnd = new scala.util.Random(73)
    val pairs = (0 until 300).map { i =>
      val cur = Array.fill(32)(rnd.nextFloat() * 2 - 1)
      // half the dims barely move (sub-threshold), half jump
      val prev = cur.map(x =>
        if (rnd.nextBoolean()) x + (rnd.nextFloat() - 0.5f) * 0.005f
        else x + (rnd.nextFloat() - 0.5f))
      (i.toLong, cur, prev)
    }.toDF("id", "cur", "prev")
    val thr = 0.01
    val hof = pairs.select(col("id"),
      pairsIdx(sparseDiff(col("cur"), col("prev"), thr)).as("idx"),
      pairsVal(sparseDiff(col("cur"), col("prev"), thr)).as("v"),
      size(sparseDiff(col("cur"), col("prev"), thr)).as("n"),
      sqrt(aggregate(vecDiff(col("cur"), col("prev")),
        lit(0.0), (a, x) => a + x * x)).as("mag"))
    val native = pairs.select(col("id"),
      sparseDiffNative(col("cur"), col("prev"), thr).as("s"))
      .select(col("id"), col("s.idx").as("idx"), col("s.val").as("v"),
        col("s.n_changed").as("n"), col("s.raw_magnitude").as("mag"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
  }

  test("codegen applyMapDeltaNative is bit-identical to the HOF " +
    "element_at fold, incl. out-of-range keys") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 200).map { i =>
      val base = Array.fill(32)(rnd.nextFloat() * 2 - 1)
      val n = rnd.nextInt(8)
      // keys include out-of-range values (ignored by both forms)
      val ks = Seq.fill(n)(rnd.nextInt(40) - 4).distinct
      val m = ks.map(k => k -> (rnd.nextDouble() - 0.5)).toMap
      (i.toLong, base, m)
    }.toDF("id", "base", "m")
    val hof = rows.select(col("id"),
      transform(col("base"), (x, i) =>
        (x.cast("double") + coalesce(element_at(col("m"), i.cast("int")),
          lit(0.0))).cast("float")).as("v"))
    val native = rows.select(col("id"),
      applyMapDeltaNative(col("base"), col("m")).as("v"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
  }

  test("sparseDiff keeps only dims above threshold, with indices") {
    // reference semantics: |diff| >= 0.01 kept (delta_computer.py:63-66)
    val cur = lit(Array(1.0f, 2.0f, 3.0f, 4.0f))
    val prev = lit(Array(1.005f, 2.0f, 2.5f, 5.0f))
    val pairs = sparseDiff(cur, prev, 0.01)
    val idx = one[collection.Seq[Int]](pairsIdx(pairs))
    val vs = one[collection.Seq[Float]](pairsVal(pairs))
    assert(idx.toSeq == Seq(2, 3))
    assert(math.abs(vs(0) - 0.5f) < 1e-5 && math.abs(vs(1) + 1.0f) < 1e-5)
  }

  test("applyDelta scatter-adds and silently ignores out-of-range indices") {
    // reference core/data_structures.py:118
    val base = lit(Array(1.0f, 2.0f, 3.0f))
    val di = lit(Array(1, 99)) // 99 out of range
    val dv = lit(Array(0.5f, 7.0f))
    val out = one[collection.Seq[Float]](applyDelta(base, di, dv))
    assert(out.toSeq == Seq(1.0f, 2.5f, 3.0f))
  }

  test("sparseMagnitude") {
    val dv = lit(Array(3.0f, 4.0f))
    assert(math.abs(one[Double](sparseMagnitude(dv)) - 5.0) < 1e-9)
  }

  test("kernels poison result to NULL on null array elements " +
    "(never misread them as zeros)") {
    // nullable-element schema: Option[Float] elements
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1.0f), None, Some(3.0f)),
        Seq[Option[Float]](Some(1.0f), Some(2.0f), Some(3.0f))),
      (2L, Seq[Option[Float]](Some(1.0f), Some(2.0f), Some(3.0f)),
        Seq[Option[Float]](Some(0.5f), Some(2.0f), Some(3.5f)))
    ).toDF("id", "cur", "prev")
    val sd = df.select(col("id"),
      sparseDiffNative(col("cur"), col("prev"), 0.01).as("s"),
      l2NormalizeWithNative(col("cur"), lit(2.0)).as("nv"),
      applyMapDeltaNative(col("prev"),
        map_from_arrays(array(lit(0)), array(lit(1.0)))).as("ap"))
    val rows = sd.collect().map(r => r.getLong(0) ->
      (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows(1L) == ((true, true, false))) // cur has a null element
    assert(rows(2L) == ((false, false, false))) // clean row unaffected
    // null map VALUE poisons apply_delta too
    val nm = df.where(col("id") === 2)
      .select(applyMapDeltaNative(col("prev"),
        map_from_arrays(array(lit(0)), array(lit(null).cast("double"))))
        .as("ap")).collect()(0)
    assert(nm.isNullAt(0))
  }
}
