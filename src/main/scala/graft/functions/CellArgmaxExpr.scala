package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment: one compiled loop over the
  * centroid table returning struct(cell, sim) — argmax_c ⟨v, cents[c]⟩
  * with the FIRST maximum kept (ties to the lowest cell, the
  * `array_position(sims, array_max(sims))` rule every oracle replays as
  * `row_number() OVER (ORDER BY d DESC, cell) = 1`).
  *
  * Replaces the per-centroid literal expression tree
  * (`array(dot(v, lit(c0)), dot(v, lit(c1)), ...)`) that the IVF/k-means
  * assignment paths built: at 8–50 cells the tree is fine, but the 100 TB
  * sizing story ("raise nCells ~√N"; SemDeDup runs ~100k clusters) makes
  * it a planning-and-codegen wall — thousands of expression nodes,
  * method-size codegen fallback, minutes of planning (the same wall the
  * ks=256 PQ encode hit before [[PqEncodeExpr]]). One reference object +
  * one loop scales to any centroid count the driver can hold.
  *
  * Value parity with the literal formulation (and the DuckDB oracles):
  * dots accumulate in double, left-to-right in index order; float inputs
  * widen per element exactly (float→double is exact, so centroids stored
  * as doubles score float vectors identically to the old float-literal
  * dots); vectors shorter than a centroid contribute zero beyond their
  * length (dotNative's min-length rule); strict `>` keeps the first
  * maximum. */
case class CellArgmaxExpr(child: Expression, cents: Array[Array[Double]])
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

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def prettyName: String = "graft_cell_argmax"

  def assign(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val lim = math.min(n, cv.length)
      var s = 0.0
      var i = 0
      if (isFloat) {
        while (i < lim) { s += v.getFloat(i).toDouble * cv(i); i += 1 }
      } else {
        while (i < lim) { s += v.getDouble(i) * cv(i); i += 1 }
      }
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    InternalRow(best, bestSim)
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellArgmax", this,
      classOf[CellArgmaxExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
