package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

private[plans] object SortedArrayChecks {
  /** Analysis-time guard (ADVICE r20): these kernels read getLong on
    * each element and assume ASC-sorted inputs — a mistyped child must
    * fail analysis, not misread memory. Sortedness itself is a runtime
    * contract (documented on the callers); only the type is checkable
    * here.
    */
  def requireLongArrays(name: String,
      children: Seq[Expression]): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val bad = children.zipWithIndex.collectFirst {
      case (c, i) if !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != LongType => (c, i)
    }
    bad match {
      case Some((c, i)) => TypeCheckResult.TypeCheckFailure(
        s"$name requires ASC-sorted array<bigint> inputs; " +
          s"argument ${i + 1} is ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

object IntersectSumSupport {
  /** Two-pointer walk over two ASC-sorted long key arrays: sum of
    * `weightsA[i]` at every position i where `keysA[i]` also occurs in
    * `keysB`. Keys are assumed distinct within each array (a doc's
    * term set); exact BIGINT accumulation, order-free by construction.
    */
  def sortedIntersectSum(keysA: ArrayData, weightsA: ArrayData,
      keysB: ArrayData): Long = {
    val na = keysA.numElements()
    val nb = keysB.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val ka = keysA.getLong(i)
      val kb = keysB.getLong(j)
      if (ka == kb) { s += weightsA.getLong(i); i += 1; j += 1 }
      else if (ka < kb) i += 1
      else j += 1
    }
    s
  }
}

/** Native in-row verify primitive for signature-array similarity: the
  * exact weighted intersection Σ weightsA[i] · [keysA[i] ∈ keysB] over
  * two ASC-sorted key arrays — one O(|a|+|b|) merge inside whole-stage
  * codegen, replacing the (pair, shared-term) row enumeration + groupBy
  * that the postings self-join formulation pays (the same
  * rows-to-in-row restructure that took the winnowing verify from a
  * join-shaped n_shared count to `array_intersect` in-row).
  * Identical BIGINT total as SUM over the shared-term join — summation
  * order cannot change an exact integer sum.
  */
case class SortedIntersectWeightSum(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_wsum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SortedArrayChecks.requireLongArrays(prettyName, children)

  override protected def nullSafeEval(a: Any, w: Any, b: Any): Any =
    IntersectSumSupport.sortedIntersectSum(a.asInstanceOf[ArrayData],
      w.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, w, b) =>
      s"${ev.value} = graft.plans.IntersectSumSupport" +
        s".sortedIntersectSum($a, $w, $b);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SortedIntersectWeightSum =
    copy(first = f, second = s, third = t)
}

object SortedIntersectWeightSum {
  def apply(keysA: Column, weightsA: Column, keysB: Column): Column =
    Bridge.column(SortedIntersectWeightSum(Bridge.expression(keysA),
      Bridge.expression(weightsA), Bridge.expression(keysB)))
}

object IntersectCountSupport {
  /** |A ∩ B| over two ASC-sorted long arrays with DISTINCT semantics
    * (duplicate runs count once — exactly
    * `size(array_intersect(a, b))` for sorted inputs): one two-pointer
    * merge, no per-row hash-set allocation. array_intersect builds an
    * OpenHashSet per evaluation; on the dedup verify path (one call
    * per candidate pair, arrays of hundreds of shingles) the merge is
    * the same O(|a|+|b|) walk minus the allocation/hashing churn.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val ka = a.getLong(i)
      val kb = b.getLong(j)
      if (ka == kb) {
        n += 1
        // skip duplicate runs so each shared value counts once
        i += 1; j += 1
        while (i < na && a.getLong(i) == ka) i += 1
        while (j < nb && b.getLong(j) == kb) j += 1
      }
      else if (ka < kb) i += 1
      else j += 1
    }
    n
  }
}

/** `size(array_intersect(a, b))` as one codegen'd sorted merge — the
  * dedup tiers' verify kernel. Inputs must be ASC-sorted (the verify
  * paths build them with sort_array); distinct-count semantics match
  * array_intersect exactly, including when inputs carry duplicates.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SortedArrayChecks.requireLongArrays(prettyName, children)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountSupport.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCountSupport" +
        s".sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedIntersectCount = copy(left = l, right = r)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a),
      Bridge.expression(b)))
}
