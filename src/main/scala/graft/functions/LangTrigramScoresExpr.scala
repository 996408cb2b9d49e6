package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled trigram→language table: one hash probe per text trigram,
  * hits bump every language whose profile contains it. Serializable —
  * ships inside the expression (the [[BpeMerges]] pattern). */
private[graft] final class LangProfiles(profiles: Seq[Seq[String]])
    extends Serializable {
  val nLangs: Int = profiles.size
  val table = new java.util.HashMap[String, Array[Int]]()
  profiles.zipWithIndex.foreach { case (grams, li) =>
    grams.foreach { g =>
      val prev = table.get(g)
      table.put(g,
        if (prev == null) Array(li) else prev :+ li)
    }
  }
}

/** All language-profile trigram scores in ONE pass — the compiled form
  * of `size(filter(charTrigrams(text), _.isin(profile...)))` × languages:
  * the declarative chain re-derived the trigram array once per score AND
  * once per decision branch (~8 array builds/row) and paid ~70 string
  * comparisons per trigram; here each code-point window costs one hash
  * probe. Input must be the ALREADY-LOWERCASED text (`lower(col)`) so
  * case mapping stays the engine's own — the kernel does windows and
  * probes only, making it trivially oracle-equal. Returns one count per
  * profile, in profile order; frequency semantics (duplicate trigram
  * occurrences count). Texts shorter than 3 code points score all
  * zeros. */
case class LangTrigramScoresExpr(child: Expression,
                                 profiles: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lang_trigram_scores"

  @transient private lazy val compiled = new LangProfiles(profiles)

  override def nullSafeEval(input: Any): Any =
    LangTrigramScoresExpr.scores(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langProfiles", compiled,
      classOf[LangProfiles].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangTrigramScoresExpr.scores($ref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object LangTrigramScoresExpr {

  /** One pass over code-point windows (matching `Column.substr`'s
    * code-point indexing); static so generated code calls straight into
    * compiled bytecode. */
  def scores(p: LangProfiles, text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](p.nLangs)
    val cps = text.toString.codePoints().toArray
    if (cps.length >= 3) {
      val sb = new java.lang.StringBuilder(8)
      var i = 0
      while (i <= cps.length - 3) {
        sb.setLength(0)
        sb.appendCodePoint(cps(i))
        sb.appendCodePoint(cps(i + 1))
        sb.appendCodePoint(cps(i + 2))
        val hit = p.table.get(sb.toString)
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1L; j += 1 }
        }
        i += 1
      }
    }
    new GenericArrayData(counts)
  }
}
