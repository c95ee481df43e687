package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style within-document repetition statistics in ONE native
  * pass over the token array: token count, distinct-token count,
  * highest single-token occurrence count, duplicate-bigram count and
  * highest single-bigram occurrence count — the five integer signals
  * the repetition quality filters divide into ratios.
  *
  * Why an expression and not functions composition: the declarative
  * form needs occurrence bigrams plus two array_sort + aggregate()
  * folds, all interpreted per element (HOF lambdas don't codegen) and
  * re-evaluated per referencing output column — measured ~40× slower
  * than DuckDB's unnest+GROUP BY at sf0.1. This is the same
  * single-pass-loop escape hatch as [[MinHashSig]]/[[SimHash60]]
  * (SURVEY.md §4.3 custom-extension budget); the DuckDB oracle
  * reproduces the semantics with pure SQL counting.
  *
  * The heavy lifting lives in the static [[RepetitionStats.compute]]
  * so the generated code is ONE call — whole-stage codegen keeps its
  * span and the loop itself is precompiled, JIT-friendly JVM code.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct_tok", LongType, nullable = false),
    StructField("top_tok_cnt", LongType, nullable = false),
    StructField("dup_bigram_cnt", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false)))

  private val SEP = UTF8String.fromString(" ")

  /** One pass for token counts, one for bigram counts (bigram key =
    * the two tokens joined by a space — tokens are split ON spaces, so
    * the join is unambiguous). Linear in document length, O(distinct)
    * memory — bounded by the document's own size, never the corpus.
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val tokCnt = new java.util.HashMap[UTF8String, Array[Int]](n * 2)
    var topTok = 0
    var i = 0
    while (i < n) {
      val c = tokCnt.computeIfAbsent(arr.getUTF8String(i), _ => new Array[Int](1))
      c(0) += 1
      if (c(0) > topTok) topTok = c(0)
      i += 1
    }
    val nBigrams = math.max(n - 1, 0)
    val bgCnt = new java.util.HashMap[UTF8String, Array[Int]](nBigrams * 2)
    var topBg = 0
    i = 0
    while (i < n - 1) {
      val g = UTF8String.concat(arr.getUTF8String(i), SEP, arr.getUTF8String(i + 1))
      val c = bgCnt.computeIfAbsent(g, _ => new Array[Int](1))
      c(0) += 1
      if (c(0) > topBg) topBg = c(0)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, tokCnt.size.toLong, topTok.toLong,
      (nBigrams - bgCnt.size).toLong, topBg.toLong))
  }

  def apply(toks: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(toks)))
}
