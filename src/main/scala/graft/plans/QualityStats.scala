package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The integer inputs of the text quality score in ONE native pass
  * over the document: code-point count, ASCII-letter count,
  * whitespace-token count, stopword hits, and summed token length.
  * The ratio arithmetic stays in (cross-engine-mirrored) column
  * expressions; this expression only replaces the per-row heavy
  * lifting — a regexp_replace plus three interpreted HOF passes over
  * re-tokenized text, each re-evaluated per referencing output column.
  * Same single-pass escape hatch as [[RepetitionStats]].
  */
case class QualityStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QualityStats.schema
  override def prettyName: String = "graft_quality_stats"

  override protected def nullSafeEval(input: Any): Any =
    QualityStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.QualityStats.compute($c);")

  override protected def withNewChildInternal(c: Expression): QualityStats =
    copy(child = c)
}

object QualityStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false)))

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFunctions.stopwords.foreach(s.add)
    s
  }

  /** n_chars/n_alpha over the ORIGINAL text (the oracle's
    * length(text) / regexp [a-zA-Z] count); tokens over the
    * LOWERCASED text split on single spaces with empties dropped
    * (the tokens() contract). Token lengths are code points, matching
    * DuckDB length(). One pass over each form of the string.
    */
  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    var nChars = 0L
    var nAlpha = 0L
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) nAlpha += 1
      i += Character.charCount(cp)
    }
    val low = s.toLowerCase.toString
    var nTok = 0L
    var nStop = 0L
    var lenSum = 0L
    var start = 0
    i = 0
    while (i <= low.length) {
      if (i == low.length || low.charAt(i) == ' ') {
        if (i > start) {
          nTok += 1
          lenSum += low.codePointCount(start, i)
          if (stopSet.contains(low.substring(start, i))) nStop += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nChars, nAlpha, nTok, nStop, lenSum))
  }

  def apply(text: Column): Column =
    Bridge.column(QualityStats(Bridge.expression(text)))
}
