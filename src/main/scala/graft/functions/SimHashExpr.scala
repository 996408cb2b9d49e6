package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash fingerprint (SURVEY dedup extension; twin of
  * `Dedup.simhash56` / the explode+agg `Dedup.simhashes`).
  *
  * The declarative formulations pay either interpreted higher-order
  * lambdas (simhash56) or an explode of every token plus a 56-aggregate
  * hash shuffle (simhashes) per corpus scan. This expression computes the
  * whole fingerprint per ROW — tokenize, md5 each token, accumulate the
  * 56 bit-votes, majority-pack — so bulk fingerprinting is MAP-ONLY: no
  * explode, no exchange anywhere in the scan (the 100 TB shape; at sf0.1
  * it removes the only shuffle of q24 and the fingerprint stage of q24b).
  *
  * Values are bit-identical to the declarative twins (cross-checked in
  * DedupSpec): tokenization is `trim` + split on `\s+` with Java's
  * keep-trailing-empties semantics (an all-whitespace document yields ONE
  * empty token, exactly like Spark's `split(trim(text), "\\s+")`), and
  * each token hashes to md5Long's value — the first 7 md5 bytes read
  * big-endian (== CAST(CONV(SUBSTRING(md5,1,14),16,10) AS BIGINT)).
  * Deterministic and engine-portable, so the DuckDB oracle re-derives the
  * same fingerprints from the same formula. */
case class SimHashExpr(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpr.compute($c, $nBits)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHashExpr {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Spark SQL `trim` semantics: strip leading/trailing SPACE (U+0020)
    * ONLY — Java's String.trim strips every char <= U+0020 (tabs,
    * newlines), which would silently drop a trailing "\n" token that the
    * declarative twins and the DuckDB oracle both keep. */
  private[functions] def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** One-pass fingerprint; static so generated code calls straight into
    * compiled bytecode (no lambda dispatch, no boxing per token). */
  def compute(text: UTF8String, nBits: Int): Long = {
    // same pipeline as the Column twins: SQL trim (spaces only), then
    // regex-split keeping trailing empties (Spark's split semantics)
    val toks = trimSpaces(text.toString).split("\\s+", -1)
    val votes = new Array[Int](nBits)
    val md = digest.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(
        toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 7 md5 bytes, big-endian == md5Long's 14-hex-digit value
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var j = 0
      while (j < nBits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}
