package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
    k: Int, child: LogicalPlan, distinct: Boolean = false)
    extends UnaryNode {
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
    case TopKPerKey(keys, order, k, child, distinct) =>
      TopKPerKeyExec(keys, order, k, planLater(child), distinct) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: requires clustering on `keys` (the planner
  * inserts the hash exchange), then one pass per partition holding a
  * bounded k-row max-heap per key — the row that would sort LAST is
  * evicted first. Emits each key's survivors in sort order.
  *
  * Memory envelope: the hot path holds O(distinctKeysPerPartition × k)
  * rows on the JVM heap. Past `spark.graft.topk.maxBufferedRows`
  * buffered rows per partition (default 2^20; VERDICT r3 item 3) it
  * degrades to a sort-merge spill instead of growing unbounded: the
  * pruned heaps are drained in (key-bytes, sort-order) order into a
  * local run file — per-run pruning is sound because a row in the
  * global top-k of its key is in the top-k of every window that saw
  * it — and emission k-way-merges the runs, streaming the first k
  * rows per key. Memory is then O(budget + openRuns + k) regardless
  * of key cardinality; `numSpills`/`spilledRows` metrics expose the
  * degradation.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, distinct: Boolean = false)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numSpills" -> SQLMetrics.createMetric(sparkContext,
      "number of spilled runs"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext,
      "rows written to spill runs"))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture locals — SparkPlan itself must not enter the closure
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val maxBuffered = conf.getConfString(
      "spark.graft.topk.maxBufferedRows", (1 << 20).toString).toLong
    val numSpills = longMetric("numSpills")
    val spilledRows = longMetric("spilledRows")
    val dedup = distinct
    child.execute().mapPartitions({ iter =>
      TopKPerKeyExec.processPartition(iter, childOutput, keyExprs,
        sortOrder, limit, maxBuffered, numSpills, spilledRows, dedup)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyExec {

  /** One partition of bounded-heap grouped top-k with the sort-merge
    * spill fallback. Pure function of its arguments so the closure
    * serializes cleanly.
    */
  /** `distinct = true` additionally drops rows that tie with an
    * already-buffered row of the same key under the FULL sort order —
    * give an order whose ties are exact duplicates (e.g. include a
    * unique id as the last tiebreak column). Lets callers skip a
    * dedicated pre-shuffle `.distinct()` when the duplicate factor is
    * bounded (LSH band joins: ≤ nBands copies of a pair): the dups
    * ride the existing exchange and die in the O(k) heap scan here.
    */
  private[plans] def processPartition(
      iter: Iterator[InternalRow],
      childOutput: Seq[Attribute],
      keyExprs: Seq[Expression],
      sortOrder: Seq[SortOrder],
      limit: Int,
      maxBuffered: Long,
      numSpills: SQLMetric,
      spilledRows: SQLMetric,
      distinct: Boolean = false): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    // identity projection: serializes arbitrary InternalRows (the
    // child may emit non-Unsafe rows) into spillable bytes
    val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
    val ord = RowOrdering.create(sortOrder, childOutput)
    val nFields = childOutput.length
    val heaps = new java.util.LinkedHashMap[UnsafeRow,
      java.util.PriorityQueue[InternalRow]]()
    var buffered = 0L
    val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    // run files die with the task, success or failure
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        spillFiles.foreach(f => { f.delete(); () })))

    // drain the pruned heaps in (key-bytes, sort-order) order — the
    // invariant that makes every spill batch a sorted run. Key order
    // only needs to be SOME total order shared by all runs; raw byte
    // comparison of the key projection is exact (equal keys have
    // equal UnsafeRow bytes for a fixed schema).
    def drainSorted(): Iterator[(Array[Byte], InternalRow)] = {
      import scala.jdk.CollectionConverters._
      val keyArr = heaps.keySet().iterator().asScala.toArray
      java.util.Arrays.sort(keyArr, (a: UnsafeRow, b: UnsafeRow) =>
        java.util.Arrays.compare(a.getBytes, b.getBytes))
      keyArr.iterator.flatMap { key =>
        val heap = heaps.get(key)
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain = reverse
        val kb = key.getBytes
        rows.iterator.map(r => (kb, r))
      }
    }

    def spill(): Unit = {
      // partition-local run file under java.io.tmpdir; a cluster
      // deployment would route this through the executor spill dirs
      val f = java.io.File.createTempFile("graft-topk-spill-", ".run")
      spillFiles += f
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16))
      var n = 0L
      drainSorted().foreach { case (kb, row) =>
        val rb = toUnsafe(row).getBytes
        out.writeInt(kb.length); out.write(kb)
        out.writeInt(rb.length); out.write(rb)
        n += 1
      }
      out.close()
      heaps.clear()
      buffered = 0L
      numSpills += 1
      spilledRows += n
    }

    // O(k) tie scan — only reached for rows that would enter the
    // heap, so the common reject path pays nothing extra
    def tiesBuffered(heap: java.util.PriorityQueue[InternalRow],
        row: InternalRow): Boolean = {
      val it = heap.iterator()
      while (it.hasNext) if (ord.compare(it.next(), row) == 0) return true
      false
    }

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
        if (!(distinct && tiesBuffered(heap, row))) {
          heap.add(row.copy()) // rows are reused buffers — copy
          buffered += 1
          if (buffered >= maxBuffered) spill()
        }
      } else if (ord.lt(row, heap.peek())) {
        if (!(distinct && tiesBuffered(heap, row))) {
          heap.poll()
          heap.add(row.copy())
        }
      }
    }

    if (spillFiles.isEmpty) {
      // hot path: everything fit — emit straight from the heaps
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
        rows.iterator
      }
    } else {
      // k-way merge of the sorted runs (the files + the final
      // in-memory map as one more run). Each key's rows arrive
      // contiguously and ascending, so the first `limit` rows per key
      // ARE its top-k — stream and count.
      abstract class Run {
        var key: Array[Byte] = _
        var row: InternalRow = _
        def advance(): Boolean
      }
      final class FileRun(f: java.io.File) extends Run {
        private val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(
            new java.io.FileInputStream(f), 1 << 16))
        def advance(): Boolean =
          try {
            val kb = new Array[Byte](in.readInt()); in.readFully(kb)
            val rb = new Array[Byte](in.readInt()); in.readFully(rb)
            val u = new UnsafeRow(nFields)
            u.pointTo(rb, rb.length)
            key = kb; row = u
            true
          } catch { case _: java.io.EOFException => in.close(); false }
      }
      final class MemRun(it: Iterator[(Array[Byte], InternalRow)])
          extends Run {
        def advance(): Boolean =
          if (it.hasNext) { val (kb, r) = it.next(); key = kb; row = r; true }
          else false
      }
      val cmp = new java.util.Comparator[Run] {
        def compare(a: Run, b: Run): Int = {
          val c = java.util.Arrays.compare(a.key, b.key)
          if (c != 0) c else ord.compare(a.row, b.row)
        }
      }
      val pq = new java.util.PriorityQueue[Run](cmp)
      (spillFiles.map(new FileRun(_)) :+ new MemRun(drainSorted()))
        .foreach(r => if (r.advance()) pq.add(r))
      // Iterator inherits a `distinct` member that would shadow the
      // parameter inside the anonymous class
      val dedupTies = distinct
      new Iterator[InternalRow] {
        private var curKey: Array[Byte] = null
        private var emitted = 0
        private var lastEmitted: InternalRow = null
        private var nextRow: InternalRow = null
        private def computeNext(): Unit = {
          while (nextRow == null && !pq.isEmpty) {
            val r = pq.poll()
            val kb = r.key
            val row = r.row
            if (r.advance()) pq.add(r) // advance allocates fresh buffers
            if (curKey == null || !java.util.Arrays.equals(curKey, kb)) {
              curKey = kb
              emitted = 0
              lastEmitted = null
            }
            // cross-run duplicates arrive adjacent in the merge (equal
            // key bytes, equal sort order) — one compare drops them
            if (emitted < limit &&
                !(dedupTies && lastEmitted != null &&
                  ord.compare(lastEmitted, row) == 0)) {
              emitted += 1
              lastEmitted = row
              nextRow = row
            }
          }
        }
        def hasNext: Boolean = {
          if (nextRow == null) computeNext()
          nextRow != null
        }
        def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty merge")
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }
}
