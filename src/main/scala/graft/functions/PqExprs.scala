package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ byte-code encoder: per subspace s, the code is
  * argmin_c ||v_s − book_s[c]||² == argmin_c (||book_s[c]||² − 2·⟨v_s,
  * book_s[c]⟩) — the ||v_s||² term is constant per row. One compiled loop
  * over m×ks codebook entries replaces the m×ks-expression literal tree
  * the Column formulation builds (at ks=256 that tree is ~4096 dot
  * expressions — minutes of planning + interpreted fallback; this is a
  * single codegen'd call).
  *
  * Value parity with the declarative twin (and the DuckDB oracle): norms
  * and dots accumulate in double, left-to-right in index order; d =
  * nsq − 2.0·dot; strict `<` argmin keeps the FIRST minimum (ties to the
  * lowest code — `row_number ORDER BY d ASC, cell`). Vectors shorter than
  * m·dsub contribute zero beyond their length (dotNative's min-length
  * semantics). */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  // per-(subspace, centroid) ||c||²: double sums in index order (the same
  // values SimilaritySearch.pqNorms feeds the literal formulation)
  @transient private lazy val nsq: Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      s
    })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got $t")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  def encode(v: ArrayData): ArrayData = {
    val m = books.length
    val n = v.numElements()
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val ns = nsq(s)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val bc = book(c)
        var dot = 0.0
        var i = 0
        val lim = math.min(dsub, n - off)
        while (i < lim) {
          dot += v.getFloat(off + i).toDouble * bc(i).toDouble
          i += 1
        }
        val d = ns(c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native ADC lookup-table builder for a query vector: lut[s][c] =
  * ⟨q_s, book_s[c]⟩, double accumulation in index order — the broadcast-
  * side half of the ADC scan (computed once per query row). Compiled for
  * the same reason as [[PqEncodeExpr]]: at ks=256 the Column formulation
  * is a ~4096-expression literal tree. */
case class PqLutExpr(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got $t")
  }

  override def dataType: DataType = ArrayType(
    ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def prettyName: String = "graft_pq_lut"

  def lut(v: ArrayData): ArrayData = {
    val m = books.length
    val n = v.numElements()
    val out = new Array[ArrayData](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val dsub = book(0).length
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val bc = book(c)
        var dot = 0.0
        var i = 0
        val lim = math.min(dsub, n - off)
        while (i < lim) {
          dot += v.getFloat(off + i).toDouble * bc(i).toDouble
          i += 1
        }
        row(c) = dot
        c += 1
      }
      out(s) = UnsafeArrayData.fromPrimitiveArray(row)
      off += dsub
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    lut(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLutExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.lut($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
