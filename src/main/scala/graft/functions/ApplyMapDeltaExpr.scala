package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Native codegen'd delta application for the reconstruction READ path:
  * `out[i] = (float)((double) base[i] + adds.getOrElse(i, 0.0))` for an
  * ARRAY<FLOAT> base and a MAP<INT, DOUBLE> of per-dimension delta sums.
  *
  * The HOF formulation — `transform(base, (x, i) => (x.cast(double) +
  * coalesce(element_at(map, i), 0.0)).cast(float))` — is interpreted AND
  * does an O(|map|) scan per dimension (ArrayBasedMapData has no hash
  * lookup), i.e. O(d·|map|) per row. This expression scatters the map
  * once into a dense double buffer and adds in one pass: O(d + |map|),
  * compiled. Values are bit-identical (same double add, same float cast;
  * out-of-range map keys ignored exactly as element_at never finds them;
  * reference out-of-range semantics core/data_structures.py:118).
  *
  * Null elements: a null base element or null map value poisons the whole
  * result to NULL. This is deliberately STRICTER than the HOF twin (whose
  * `coalesce(element_at(m, i), 0.0)` silently treats a null map VALUE as
  * a 0.0 contribution, and whose `transform` emits a null output element
  * for a null base element): in the versions-table contract null cells
  * are corruption, and a reconstruction must surface them rather than
  * fabricate values. The bit-identity cross-check with the HOF holds on
  * the contract's non-null data. Non-null schemas skip the check in both
  * eval and codegen. */
case class ApplyMapDeltaExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def baseNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  private def valuesNullable: Boolean = right.dataType match {
    case MapType(_, _, vn) => vn
    case _ => true
  }

  override def nullable: Boolean =
    super.nullable || baseNullable || valuesNullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), MapType(IntegerType, DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, map<int,double>), got $l / $r")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "graft_apply_delta"

  override def nullSafeEval(base: Any, adds: Any): Any = {
    val v = base.asInstanceOf[ArrayData]
    val m = adds.asInstanceOf[MapData]
    val n = v.numElements()
    val buf = new Array[Double](n)
    val ks = m.keyArray(); val vs = m.valueArray()
    var j = 0
    while (j < m.numElements()) {
      if (valuesNullable && vs.isNullAt(j)) return null
      val k = ks.getInt(j)
      if (k >= 0 && k < n) buf(k) = vs.getDouble(j)
      j += 1
    }
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (baseNullable && v.isNullAt(i)) return null
      out(i) = (v.getFloat(i).toDouble + buf(i)).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      val out = ctx.freshName("out")
      val ks = ctx.freshName("ks")
      val vs = ctx.freshName("vs")
      val mapNullCheck =
        if (valuesNullable)
          s"if ($vs.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      val baseNullCheck =
        if (baseNullable)
          s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $v.numElements();
         |double[] $buf = new double[$n];
         |org.apache.spark.sql.catalyst.util.ArrayData $ks = $m.keyArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $vs = $m.valueArray();
         |for (int $j = 0; $j < $m.numElements(); $j++) {
         |  $mapNullCheck
         |  int $k = $ks.getInt($j);
         |  if ($k >= 0 && $k < $n) $buf[$k] = $vs.getDouble($j);
         |}
         |float[] $out = new float[$n];
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $baseNullCheck
         |    $out[$i] = (float) (((double) $v.getFloat($i)) + $buf[$i]);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
