package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A compiled greedy-maxmatch vocabulary: entries bucketed by length so
  * the longest-match probe is O(maxLen) hash-set lookups per emitted
  * unit. Serializable — it ships to executors inside the expression (and
  * through the codegen references array). */
private[functions] final class BpeVocab(entries: Seq[String])
    extends Serializable {
  val maxLen: Int = if (entries.isEmpty) 0 else entries.map(_.length).max
  val byLen: Array[java.util.HashSet[String]] =
    Array.fill(maxLen + 1)(new java.util.HashSet[String]())
  entries.foreach(e => if (e.nonEmpty) byLen(e.length).add(e))
}

/** Vocab-driven greedy subword (BPE/WordPiece-style) token count: split
  * the text into whitespace pretokens (the engine's canonical `trim` +
  * `\s+` semantics), then longest-match-first encode each pretoken
  * against a FIXED vocabulary — at every position consume the longest
  * vocab entry that prefixes the rest of the word, or a single character
  * when nothing matches (the UNK fallback). Returns the emitted-unit
  * count.
  *
  * This is the real-tokenizer budget unit [[graft.operators.TextAnalysis
  * .SubtokenPattern]] approximates: training pipelines budget shards and
  * selection in tokenizer tokens, and the regex count is off by the
  * vocabulary's fertility ratio. Greedy maxmatch is DETERMINISTIC and
  * engine-replayable (a recursive CTE replays it in SQL) — the same
  * portability discipline as the engine's other kernels. For the real
  * merge-rank application algorithm see [[BpeMergeCountExpr]] (also
  * replayable, one merge per recursion step).
  *
  * Map-only: the compiled vocab rides the expression (codegen passes it
  * through the references array — executors never re-parse it), each
  * row pays one char scan with O(maxTokenLen) hash-set probes per
  * emitted unit. No shuffle, no joins, stays inside whole-stage
  * codegen. */
case class BpeCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val compiled = new BpeVocab(vocab)

  override def nullSafeEval(input: Any): Any =
    BpeCountExpr.count(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", compiled,
      classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeCountExpr.count($ref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeCountExpr {

  /** Greedy maxmatch unit count over whitespace pretokens; static so
    * generated code calls straight into compiled bytecode. */
  def count(v: BpeVocab, text: UTF8String): Long = {
    val toks = SimHashExpr.trimSpaces(text.toString).split("\\s+", -1)
    var total = 0L
    var w = 0
    while (w < toks.length) {
      val word = toks(w)
      var i = 0
      while (i < word.length) {
        var matched = 1 // UNK fallback: consume one char
        var len = math.min(v.maxLen, word.length - i)
        while (len >= 2 && matched == 1) {
          if (v.byLen(len).contains(word.substring(i, i + len)))
            matched = len
          else len -= 1
        }
        // len == 1 vocab entries count the same as the fallback (one
        // unit, one char) — no need to probe them
        i += matched
        total += 1L
      }
      w += 1
    }
    total
  }
}
