package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash kernel (twin of `Dedup.minhashSignatures`'s
  * explode + min-aggregate formulation): per document, tokenize, build the
  * word n-gram shingles, hash each through md5Long mod P, and fold the
  * `numHashes` permutation minima AND the distinct shingle-hash set in one
  * compiled pass —
  *
  *   struct(sig:    ARRAY<LONG>  min_j((a_j·x + b_j) mod P) over shingles,
  *          hashes: ARRAY<LONG>  distinct shingle hashes, ascending)
  *
  * The declarative pipeline explodes every shingle (≈ tokens per doc) and
  * shuffles them through a 16-min + collect_set hash aggregate; this
  * expression makes the whole signature stage MAP-ONLY — the LSH band
  * join becomes the pipeline's only exchange.
  *
  * Value parity with the twins: tokens are `trim` + `\s+` split, shingles
  * join n consecutive tokens with single spaces (docs with fewer than n
  * tokens yield EMPTY arrays — callers filter those like the aggregate
  * formulation's absent groups), shingle hash = md5Long mod P, and minima
  * over the distinct set equal minima over the multiset (duplicates can't
  * change a min). `hashes` is sorted ascending — downstream set algebra
  * (jaccard intersect/union) is order-insensitive, and a deterministic
  * order keeps the column value-comparable across engines. */
case class MinHashExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashExpr.compute($c, $n, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashExpr {

  private val P = 2147483647L // graft.operators.Dedup.P (Mersenne prime)

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // permutation coefficients depend only on numHashes — computed once per
  // JVM, not per row (the kernel's point is removing per-row overhead)
  private val coeffs =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefficients(numHashes: Int): (Array[Long], Array[Long]) =
    coeffs.computeIfAbsent(numHashes, k =>
      (Array.tabulate(k)(j => (637543L + 104729L * j) % P),
        Array.tabulate(k)(j => (389287L + 982451L * j) % P)))

  /** One-pass signature + distinct-set; static so generated code calls
    * straight into compiled bytecode. SQL-trim (spaces only, see
    * [[SimHashExpr.trimSpaces]]) keeps tokenization identical to the
    * declarative twins. */
  def compute(text: UTF8String, n: Int, numHashes: Int): GenericInternalRow = {
    val toks = SimHashExpr.trimSpaces(text.toString).split("\\s+", -1)
    val md = digest.get()
    val set = new java.util.TreeSet[java.lang.Long]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // hash coefficients identical to Dedup.hashA/hashB
    val (as, bs) = coefficients(numHashes)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      val x = h % P
      if (set.add(x)) {
        var j = 0
        while (j < numHashes) {
          val v = (as(j) * x + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val sig =
      if (set.isEmpty) new Array[Long](0)
      else mins
    val hashes = new Array[Long](set.size)
    val it = set.iterator()
    var s = 0
    while (it.hasNext) { hashes(s) = it.next(); s += 1 }
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(sig),
      UnsafeArrayData.fromPrimitiveArray(hashes)))
  }
}
