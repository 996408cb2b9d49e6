package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-`nProbe` centroid probe for a query vector: one compiled
  * pass over the centroid table returning array<struct<c: cell id,
  * s: ⟨q, cents[c]⟩>> ordered by (s DESC, c ASC) — the query-side twin of
  * [[CellArgmaxExpr]], replacing the literal
  * `array_sort(array(struct(-dot, c), ...))` tree whose size grows with
  * the centroid count (the same planning/codegen wall; an IVF sized
  * nCells ~√N needs BOTH sides compiled).
  *
  * Ordering parity with the literal formulation: the tree sorted
  * struct(ns = −s, c) ascending with Spark's primitive double
  * comparison, so s ties (including ±0.0, which compare equal) fall to
  * the lowest cell — the comparator here is the same primitive
  * comparison on s directly. Dots accumulate in double, left-to-right,
  * with dotNative's min-length rule; float inputs widen exactly. */
case class ProbeCellsExpr(child: Expression, cents: Array[Array[Double]],
                          nProbe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got $t")
  }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("c", IntegerType, nullable = false),
    StructField("s", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_probe_cells"

  def probe(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val m = cents.length
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = cents(c)
      val lim = math.min(n, cv.length)
      var s = 0.0
      var i = 0
      if (isFloat) {
        while (i < lim) { s += v.getFloat(i).toDouble * cv(i); i += 1 }
      } else {
        while (i < lim) { s += v.getDouble(i) * cv(i); i += 1 }
      }
      sims(c) = s
      c += 1
    }
    val idx = Array.tabulate(m)(identity)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val sa = sims(a.intValue()); val sb = sims(b.intValue())
        // primitive double comparison (±0.0 equal), s DESC then c ASC —
        // the literal tree's struct(−s, c) ascending order
        if (sa > sb) -1
        else if (sa < sb) 1
        else Integer.compare(a.intValue(), b.intValue())
      }
    })
    val k = math.min(math.max(nProbe, 0), m)
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val cid = boxed(j).intValue()
      out(j) = InternalRow(cid, sims(cid))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probeCells", this,
      classOf[ProbeCellsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
