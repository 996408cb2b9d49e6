package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A compiled BPE merge table: (left, right) → rank. Serializable — it
  * ships to executors inside the expression (and through the codegen
  * references array). */
private[graft] final class BpeMerges(merges: Seq[(String, String)])
    extends Serializable {
  val ranks = new java.util.HashMap[String, Integer]()
  merges.zipWithIndex.foreach { case ((a, b), r) =>
    ranks.put(a + "\u0000" + b, r)
  }
  def rank(a: String, b: String): Int = {
    val r = ranks.get(a + "\u0000" + b)
    if (r == null) Int.MaxValue else r.intValue()
  }
}

/** MERGE-RANK BPE token count — the real tokenizer-application algorithm
  * (Sennrich et al. 2016), not the greedy-maxmatch approximation
  * [[BpeCountExpr]] ships: each whitespace pretoken starts as its
  * code-point sequence and repeatedly applies the LOWEST-RANK merge whose
  * pair is present, until none applies; the count of remaining symbols is
  * the token count. The merge list is a fixed artifact (exactly how
  * production tokenizers ship: the vocab is data, not per-corpus
  * training).
  *
  * Merge application is ONE OCCURRENCE PER STEP — the best-rank pair's
  * LEFTMOST occurrence merges, then ranks re-evaluate. For any merge list
  * respecting creation order (a merge producing symbol S precedes every
  * merge consuming S — true of every trained BPE list, enforced for
  * [[graft.operators.TextAnalysis.BpeMergesDefault]] by a spec), this is
  * equivalent to the classic all-occurrences-per-pass formulation: a
  * merge can only create pairs of LATER rank than itself, so the
  * best-rank choice is unaffected by merging one occurrence at a time.
  * The one-at-a-time form is what makes the operator ENGINE-REPLAYABLE:
  * a DuckDB recursive CTE replays it step for step (q73), which the
  * all-occurrences pass (a sequential overlap-skipping scan per step)
  * would not express in SQL.
  *
  * Map-only: the compiled merge table rides the expression; each row pays
  * O(tokens · merges-applied) hash probes. No shuffle, no joins. */
case class BpeMergeCountExpr(child: Expression,
                             merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_merge_count"

  @transient private lazy val compiled = new BpeMerges(merges)

  override def nullSafeEval(input: Any): Any =
    BpeMergeCountExpr.count(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", compiled,
      classOf[BpeMerges].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMergeCountExpr.count($ref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** MERGE-RANK BPE ENCODING — the actual token sequence
  * [[BpeMergeCountExpr]] only counts: per whitespace pretoken, the same
  * lowest-rank-leftmost merge loop, emitting the final symbols joined by
  * single spaces (symbols never contain whitespace — pretokens are
  * whitespace-split — so the join is unambiguous and the column is
  * hash-comparable / splittable downstream). This is the artifact a
  * training pipeline actually materializes (the sequences packing
  * consumes), where the count is only its budget. Same map-only cost
  * shape; q116's oracle extracts the identical terminal state from the
  * q73 recursion. */
case class BpeMergeTokensExpr(child: Expression,
                              merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_merge_tokens"

  @transient private lazy val compiled = new BpeMerges(merges)

  override def nullSafeEval(input: Any): Any =
    BpeMergeCountExpr.encode(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", compiled,
      classOf[BpeMerges].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeMergeCountExpr.encode($ref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeMergeCountExpr {

  /** The full merged token sequence, space-joined ([[BpeMergeTokensExpr]]).
    * Empty pretokens (empty/blank input) contribute nothing. */
  def encode(m: BpeMerges, text: UTF8String): UTF8String = {
    val words = SimHashExpr.trimSpaces(text.toString).split("\\s+", -1)
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val toks = wordTokens(m, words(w))
        var t = 0
        while (t < toks.length) {
          if (sb.length() > 0) sb.append(' ')
          sb.append(toks(t))
          t += 1
        }
      }
      w += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Merge-rank token count over whitespace pretokens; static so
    * generated code calls straight into compiled bytecode. Symbols are
    * code points (DuckDB's character indexing — identical on any text;
    * the fixtures are ASCII). */
  def count(m: BpeMerges, text: UTF8String): Long = {
    val words = SimHashExpr.trimSpaces(text.toString).split("\\s+", -1)
    var total = 0L
    var w = 0
    while (w < words.length) {
      total += wordTokens(m, words(w)).length
      w += 1
    }
    total
  }

  /** The merged symbol sequence for one pretoken (exposed for specs). */
  private[graft] def wordTokens(m: BpeMerges,
                                word: String): Array[String] = {
    // code-point split (matches the oracle's 1-based character indexing)
    var toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      toks += word.substring(i, i + n)
      i += n
    }
    var done = false
    while (!done && toks.length >= 2) {
      // best = lowest rank, leftmost occurrence (ties by position)
      var bestRank = Int.MaxValue
      var bestPos = -1
      var p = 0
      while (p < toks.length - 1) {
        val r = m.rank(toks(p), toks(p + 1))
        if (r < bestRank) { bestRank = r; bestPos = p }
        p += 1
      }
      if (bestPos < 0) done = true
      else {
        toks(bestPos) = toks(bestPos) + toks(bestPos + 1)
        toks.remove(bestPos + 1)
      }
    }
    toks.toArray
  }
}
