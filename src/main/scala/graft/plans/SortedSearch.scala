package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst binary search over a SORTED numeric array: returns
  * the count of elements `<= needle` (`< needle` when `strict`) — the
  * 1-based index of the last match, 0 when nothing matches.
  *
  * This is the probe kernel of the compact as-of tier
  * ([[graft.operators.AsOf.joinLatestCompact]]): the build side's
  * per-key history is a sorted array, and each probe row finds its
  * as-of position in O(log n) INSIDE whole-stage codegen. The
  * higher-order alternative (`aggregate(filter(...))`) is O(n) per
  * row AND evaluates its lambda interpretively — both wrong for the
  * hot path (same reasoning as [[DotProduct]]).
  *
  * Contract: the array is ascending-sorted and contains no nulls
  * (the operator builds it from non-null times via
  * `sort_array(collect_list(...))`). Null array or null needle
  * returns null. NaN ordering over float/double arrays is not
  * defined by this kernel — time columns are NaN-free by contract.
  */
case class SortedCountLE(arr: Expression, needle: Expression,
    strict: Boolean) extends BinaryExpression {

  override def left: Expression = arr
  override def right: Expression = needle
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_count_le"

  private def elemType: DataType = arr.dataType match {
    case ArrayType(et, _) => et
    case other => other // surfaced by checkInputDataTypes below
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    arr.dataType match {
      case ArrayType(et, _) if et == needle.dataType =>
        et match {
          case IntegerType | LongType | FloatType | DoubleType |
               DateType | TimestampType | TimestampNTZType => TypeCheckSuccess
          case other => TypeCheckFailure(
            s"$prettyName needs an ordered primitive element type, got $other")
        }
      case ArrayType(et, _) => TypeCheckFailure(
        s"$prettyName element type $et must equal needle type ${needle.dataType}")
      case other => TypeCheckFailure(
        s"$prettyName needs array input, got $other")
    }
  }

  override protected def nullSafeEval(a: Any, n: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    var lo = 0
    var hi = ad.numElements()
    // count of elements <= needle (or < when strict): classic
    // upper/lower bound — lo converges on the first NON-matching slot
    elemType match {
      case IntegerType | DateType =>
        val nd = n.asInstanceOf[Int]
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val x = ad.getInt(mid)
          if (if (strict) x < nd else x <= nd) lo = mid + 1 else hi = mid
        }
      case LongType | TimestampType | TimestampNTZType =>
        val nd = n.asInstanceOf[Long]
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val x = ad.getLong(mid)
          if (if (strict) x < nd else x <= nd) lo = mid + 1 else hi = mid
        }
      case FloatType =>
        val nd = n.asInstanceOf[Float]
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val x = ad.getFloat(mid)
          if (if (strict) x < nd else x <= nd) lo = mid + 1 else hi = mid
        }
      case DoubleType =>
        val nd = n.asInstanceOf[Double]
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val x = ad.getDouble(mid)
          if (if (strict) x < nd else x <= nd) lo = mid + 1 else hi = mid
        }
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val (jt, getter) = elemType match {
        case IntegerType | DateType                     => ("int", "getInt")
        case LongType | TimestampType | TimestampNTZType => ("long", "getLong")
        case FloatType                                  => ("float", "getFloat")
        case DoubleType                                 => ("double", "getDouble")
      }
      val cmp = if (strict) "<" else "<="
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val x = ctx.freshName("x")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  final $jt $x = $a.$getter($mid);
         |  if ($x $cmp $n) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCountLE =
    copy(arr = newLeft, needle = newRight)
}

object SortedCountLE {
  /** Column-API entry point. */
  def apply(arr: Column, needle: Column, strict: Boolean): Column =
    Bridge.column(SortedCountLE(
      Bridge.expression(arr), Bridge.expression(needle), strict))
}
