package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd inner product of two ARRAY<DOUBLE> columns — the
  * double-input sibling of [[DotProduct]] (same rationale: Spark's
  * `zip_with`+`aggregate` lambdas evaluate interpreted and allocate per
  * row; this compiles to a tight primitive loop in whole-stage codegen).
  *
  * Exists for the distributed trainers ([[graft.operators.Clustering]]):
  * their per-iteration centroids live in DOUBLE precision (the quantized
  * Lloyd's recipe — means in double, replayed by oracles as DOUBLE list
  * arithmetic), so assignment dots must consume double arrays without a
  * lossy float round-trip.
  *
  * Semantics match `aggregate(zip_with(a,b,(x,y)->x*y), 0D, +)`: double
  * accumulation, left-to-right, over min(len(a), len(b)) elements.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
