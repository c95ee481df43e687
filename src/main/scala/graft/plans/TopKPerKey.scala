package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY §4.3 ladder, rung c): grouped
  * bounded top-k. The declarative form —
  * `row_number() OVER (PARTITION BY k ORDER BY s) <= n` — buffers and
  * SORTS every key group in full before discarding all but n rows;
  * this operator keeps a bounded n-row heap per key instead, so
  * per-key memory is O(n) and per-row work is O(log n) regardless of
  * how hot a key is. The one operator semantics Spark's built-ins
  * genuinely cannot express without materializing the full sort.
  *
  * Logical node: resolved on construction (built against an analyzed
  * child), so it passes the analyzer untouched and the planner
  * strategy below maps it 1:1 onto the physical heap operator.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(keys.nonEmpty, "at least one key expression required")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Planner rule: TopKPerKey → TopKPerKeyExec. Registered either via
  * SparkSessionExtensions (GraftExtensions) or live through
  * `spark.experimental.extraStrategies` (operators.TopK does this).
  */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: requires clustering on `keys` (the planner
  * inserts the hash exchange), then one pass per partition holding a
  * bounded k-row max-heap per key — the row that would sort LAST is
  * evicted first. Emits each key's survivors in sort order.
  *
  * Memory envelope (the honest tradeoff vs the window form): heap
  * state is O(distinctKeysPerPartition × k) rows on the JVM heap with
  * NO spill path — the window rank-filter buffers whole key groups
  * but spills via UnsafeExternalSorter. Use this operator when k is
  * small and keys-per-partition is bounded (size shuffle partitions
  * so that holds); use the window form when distinct-key cardinality
  * per partition is unbounded.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture locals — SparkPlan itself must not enter the closure
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // max-heap in sort order: the head is the current WORST row
          heap = new java.util.PriorityQueue[InternalRow](
            limit + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy()) // rows are reused buffers — copy
        } else if (ord.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain = reverse order
        rows.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
