package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd sparse-diff kernel for the ingest write path: ONE
  * compiled pass over the dimension pairs produces everything the
  * promotion policy and delta storage need —
  *
  *   struct(idx:   ARRAY<INT>    dims where |cur−prev| ≥ threshold,
  *          val:   ARRAY<FLOAT>  the (float-cast) diffs at those dims,
  *          n_changed: INT       |idx|,
  *          raw_magnitude: DOUBLE  L2 of the WHOLE dense diff)
  *
  * Replaces four interpreted higher-order expressions per row (zip_with
  * diff, struct transform, filter, and the magnitude aggregate) with a
  * single loop. Arithmetic is bit-identical to the HOF pipeline: each
  * diff is (double)cur[i] − (double)prev[i]; the threshold test is
  * Math.abs(d) ≥ t; stored values are (float)d; the magnitude accumulates
  * d² left-to-right from 0.0 (reference semantics:
  * core/delta_computer.py:63-66 for the threshold, :74 for the raw-dense
  * magnitude). Inputs must be equal-length ARRAY<FLOAT> (the versions
  * table contract); the shorter length is used if they ever differ.
  *
  * Null elements: a null at any compared position poisons the whole
  * result to NULL (the HOF pipeline's null likewise poisons its filter
  * and magnitude). Arrays with containsNull = false skip the check
  * entirely in both eval and codegen. */
case class SparseDiffExpr(left: Expression, right: Expression,
                          threshold: Double) extends BinaryExpression {

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullable: Boolean = super.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got $l / $r")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("idx", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("val", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("n_changed", IntegerType, nullable = false),
    StructField("raw_magnitude", DoubleType, nullable = false)))

  override def prettyName: String = "graft_sparse_diff"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cur = a.asInstanceOf[ArrayData]
    val prev = b.asInstanceOf[ArrayData]
    val n = math.min(cur.numElements(), prev.numElements())
    val idx = new Array[Int](n)
    val vs = new Array[Float](n)
    var cnt = 0
    var mag = 0.0
    var i = 0
    while (i < n) {
      if (elemsNullable && (cur.isNullAt(i) || prev.isNullAt(i))) return null
      val d = cur.getFloat(i).toDouble - prev.getFloat(i).toDouble
      mag += d * d
      if (math.abs(d) >= threshold) {
        idx(cnt) = i; vs(cnt) = d.toFloat; cnt += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(idx, cnt)),
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(vs, cnt)),
      cnt, math.sqrt(mag)))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val cnt = ctx.freshName("cnt")
      val mag = ctx.freshName("mag")
      val idx = ctx.freshName("idx")
      val vs = ctx.freshName("vs")
      val fields = ctx.freshName("fields")
      val nullCheck =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int[] $idx = new int[$n];
         |float[] $vs = new float[$n];
         |int $cnt = 0;
         |double $mag = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $mag += $d * $d;
         |  if (java.lang.Math.abs($d) >= $threshold) {
         |    $idx[$cnt] = $i; $vs[$cnt] = (float) $d; $cnt++;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  Object[] $fields = new Object[4];
         |  $fields[0] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($idx, $cnt));
         |  $fields[1] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($vs, $cnt));
         |  $fields[2] = (Integer) $cnt;
         |  $fields[3] = (Double) java.lang.Math.sqrt($mag);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |    .GenericInternalRow($fields);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
