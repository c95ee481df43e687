package graft.operators

import graft.plans.{TopKPerKey, TopKStrategy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Public grouped-top-k operator backed by the custom physical plan
  * (graft.plans.TopKPerKeyExec): per key, the first `k` rows in
  * `orderBy` order, computed with a bounded per-key heap instead of
  * the full per-key sort the window rank-filter form pays. At 100 TB
  * one hot key stops being a straggler: memory is O(k) per key and
  * work is O(rows·log k). High distinct-key density is guarded too:
  * past `spark.graft.topk.maxBufferedRows` buffered rows per
  * partition (default 2^20) the exec spills pruned, key-sorted runs
  * to local disk and merge-streams them, so a high-cardinality key
  * column degrades gracefully instead of OOMing a task.
  */
object TopK {

  /** Ensure the planner knows the custom node — idempotent, live
    * session (extraStrategies is the public extension point; the
    * GraftExtensions config path registers it at build time too, so
    * check the planner's FULL strategy list, not just experimental,
    * before appending — a session built withExtensions must not get
    * a second copy).
    */
  private def ensureStrategy(
      spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!org.apache.spark.sql.graft.Bridge.plannerStrategies(spark)
          .exists(_.isInstanceOf[TopKStrategy]))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ new TopKStrategy
    }

  /** Top `k` rows per `keyCols` group, ordered by `orderBy` (give a
    * total order — ties beyond it are broken arbitrarily). Output
    * carries all input columns; rows within a key come back in
    * `orderBy` order.
    *
    * `distinct = true` drops rows that TIE an already-kept row of the
    * same key under the full `orderBy` — pass an order whose ties are
    * exact duplicates (unique id last) and a bounded-duplication
    * input (an LSH band join emits ≤ nBands copies of a pair) can
    * skip its dedicated `.distinct()` exchange: duplicates ride the
    * top-k shuffle and die in an O(k) in-heap scan.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int, distinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    // route the order columns through a real Sort plan so the
    // ANALYZER resolves them into catalyst SortOrders (a raw
    // Column→Expression conversion yields lazy ColumnNode wrappers
    // that never bind to the child's attributes)
    val (sortOrders, plan) = df.sort(orderBy: _*)
      .queryExecution.analyzed match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(so, _, child, _) =>
        (so, child)
      case other => throw new IllegalStateException(
        s"expected a Sort plan from df.sort, got ${other.nodeName}")
    }
    val out = plan.output
    // resolve like the analyzer would: case-insensitive unless
    // spark.sql.caseSensitive, ambiguity is an error not a silent pick
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      val hits = out.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"key column $n not in ${out.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"key column $n is ambiguous: matches ${many.mkString(", ")}")
      }
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerKey(keyExprs, sortOrders, k, plan, distinct))
  }
}
