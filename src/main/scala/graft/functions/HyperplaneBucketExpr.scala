package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd hyperplane-LSH bucket: `nBits` sign bits of
  * dot(v, r_j) with the closed-form pseudo-random planes
  * r_j[i] = ((73·i + 179·g + 11) mod 97)/97 − 0.5, g = table·nBits + j —
  * the same engine-portable plane family as the interpreted
  * `Dedup.hyperplaneBucket` HOF formulation and the DuckDB oracle SQL.
  *
  * Bit-identical to the HOF form: each plane's dot accumulates in double,
  * left-to-right over the element index, from 0.0 — the identical IEEE op
  * sequence, just compiled instead of interpreted (the HOF lambda pays
  * per-element closure dispatch; measured ~3-5× on bulk LSH bucketing,
  * which dominates the q26/q27-family scans).
  *
  * Accepts ARRAY<FLOAT> or ARRAY<DOUBLE> input (elements promote to double
  * exactly, as `x.cast("double")` does in the HOF form).
  */
case class HyperplaneBucketExpr(child: Expression, nBits: Int, table: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hyperplane_bucket"

  /** Plane coefficient numerators: coef(j)(i % 97) pattern is periodic in
    * i with period 97, so precompute ((73·i + 179·g + 11) mod 97) for
    * i in [0, 97). */
  @transient private lazy val planeConst: Array[Int] =
    Array.tabulate(nBits)(j => (179 * (table * nBits + j) + 11) % 97)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      val c = planeConst(j)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * (((73 * i + c) % 97) / 97.0 - 0.5)
        i += 1
      }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val consts = ctx.addReferenceObj("planeConst", planeConst, "int[]")
      val get = if (isFloat) s"(double) $v.getFloat($i)"
                else s"$v.getDouble($i)"
      s"""
         |int $n = $v.numElements();
         |long $b = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  int $c = $consts[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ($get) * (((73 * $i + $c) % 97) / 97.0 - 0.5);
         |  }
         |  if ($s > 0) $b |= (1L << $j);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
