package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams over a token array in ONE native pass — space-joined
  * windows of `n` adjacent tokens, optionally deduplicated to
  * first-occurrence order (= array_distinct semantics). Same
  * single-pass-loop escape hatch as [[MinHashSig]] (SURVEY.md §4.3):
  * the functions-composition forms pay the interpreted lambda path
  * per ELEMENT (zip_with fold) or per element per SLICE (transform +
  * slice), measured 4-15× slower at sf0.1 — and shingle construction
  * sits under every dedup sketch and inverted-index tier, so its
  * constant factor is corpus-sized at 100 TB.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "graft_word_ngrams_distinct" else "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.WordNgrams.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

object WordNgrams {

  private val SEP = UTF8String.fromString(" ")

  /** Linear in tokens; distinct keeps first-occurrence order (the
    * array_distinct contract). Short arrays (< n tokens) yield empty.
    */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val nTok = arr.numElements()
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](nTok)
    var i = 0
    while (i < nTok) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[Any](m)
    // LinkedHashSet preserves insertion order for the distinct form
    val seen: java.util.LinkedHashSet[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String](m * 2) else null
    val window = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      val g = UTF8String.concatWs(SEP, window: _*)
      if (distinct) seen.add(g) else out.add(g)
      i += 1
    }
    if (distinct) new GenericArrayData(seen.toArray())
    else new GenericArrayData(out.toArray())
  }

  def apply(toks: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(toks), n, distinct))
}
