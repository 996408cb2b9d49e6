package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd L2 scaling: `vec[i] = (float)((double) vec[i] / norm)`
  * for an ARRAY<FLOAT> vector and a DOUBLE norm — the compiled twin of the
  * HOF `transform(v, x => (x.cast(double) / norm).cast(float))` used by
  * `VectorFunctions.l2NormalizeWith` (identical IEEE op per element, so
  * values are bit-identical; cross-checked in VectorFunctionsSpec). The
  * output array is built with `UnsafeArrayData.fromPrimitiveArray` — no
  * per-element boxing or lambda dispatch, keeping the full normalize stage
  * of every similarity/dedup corpus scan inside compiled code.
  *
  * Null elements: a null vector element poisons the whole result to NULL
  * (matching the HOF twin, whose null element poisons downstream dots).
  * Arrays with containsNull = false skip the check entirely. */
case class L2NormalizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemsNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean = super.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got $l / $r")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "graft_l2_scale"

  override def nullSafeEval(vec: Any, norm: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val d = norm.asInstanceOf[Double]
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (elemsNullable && v.isNullAt(i)) return null
      out(i) = (v.getFloat(i).toDouble / d).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      val nullCheck =
        if (elemsNullable)
          s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $v.numElements();
         |float[] $arr = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $arr[$i] = (float) (((double) $v.getFloat($i)) / $d);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
