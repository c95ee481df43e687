package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row value counts over a string array in ONE native pass:
  * array<string> → array<struct<g: string, c: long>> in
  * first-occurrence order. The narrow replacement for the
  * explode + groupBy(row_id, value) shuffle that per-document n-gram
  * counting otherwise pays — at 100 TB that shuffle moves every
  * n-gram OCCURRENCE across the cluster just to count within-doc
  * multiplicity that never needed to leave the row. Same single-pass
  * escape hatch family as [[WordNgrams]] (SURVEY.md §4.3); the HOF
  * composition (aggregate over map_from_entries…) pays the
  * interpreted lambda path per element.
  */
case class ValueCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_value_counts"

  override protected def nullSafeEval(input: Any): Any =
    ValueCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.ValueCounts.compute($c);")

  override protected def withNewChildInternal(c: Expression): ValueCounts =
    copy(child = c)
}

object ValueCounts {

  /** Linear in elements; first-occurrence order (deterministic). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val e = m.get(s)
      if (e == null) m.put(s, Array(1L)) else e(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(arr: Column): Column =
    Bridge.column(ValueCounts(Bridge.expression(arr)))
}
