package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → n-gram → within-row count in ONE native pass:
  * raw text → array<struct<g: string, c: long>> (first-occurrence
  * order). Semantics are EXACTLY the composition
  * `ValueCounts(ngrams(tokens(text), n))` — lowercase, split on
  * single spaces, drop empties, space-joined n-gram windows, count
  * multiplicity — fused so the intermediate token array, the
  * interpreted `filter` lambda inside tokens(), and the n-gram array
  * never materialize per row. The corpus-LM scorer reads the corpus
  * twice through this expression; its per-pass cost is the query's
  * floor, so the fusion is measured, not cosmetic (≈2× the narrow
  * pass at sf0.1).
  */
case class NgramCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_ngram_counts"

  override protected def nullSafeEval(input: Any): Any =
    NgramCounts.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramCounts.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): NgramCounts =
    copy(child = c)
}

object NgramCounts {

  private val SEP = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int): ArrayData = {
    // tokens(): lowercase, split on single space, drop empties —
    // byte-for-byte the split(lower(text), " ") + filter contract
    val parts = text.toLowerCase.split(SEP, -1)
    var nTok = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { parts(nTok) = parts(i); nTok += 1 }
      i += 1
    }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](m * 2)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      var j = 0
      while (j < n) { window(j) = parts(i + j); j += 1 }
      val g = if (n == 1) window(0) else UTF8String.concatWs(SEP, window: _*)
      val e = counts.get(g)
      if (e == null) counts.put(g, Array(1L)) else e(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(NgramCounts(Bridge.expression(text), n))
}
