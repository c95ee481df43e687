package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Minimal engine observability: a QueryExecutionListener recording
  * per-action metrics (action name, wall duration, output rows when
  * the root operator exposes them) into a bounded in-memory ring —
  * the "what ran, how long, how big" hook an operated engine needs.
  * On a cluster the same records would feed the metrics sink; the
  * ring bound keeps a long-lived session from growing without limit.
  */
object Observability {

  case class ExecRecord(action: String, durationNs: Long,
      outputRows: Option[Long], failed: Boolean)

  final class Recorder(maxRecords: Int) extends QueryExecutionListener {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[ExecRecord]()
    // ConcurrentLinkedQueue.size() is O(n) — track it ourselves so
    // ring trimming stays O(1) on the listener-bus thread
    private val count = new java.util.concurrent.atomic.AtomicInteger(0)

    private def add(r: ExecRecord): Unit = {
      buf.add(r)
      var n = count.incrementAndGet()
      while (n > maxRecords) {
        n = if (buf.poll() != null) count.decrementAndGet() else maxRecords
      }
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      add(ExecRecord(funcName, durationNs,
        qe.executedPlan.metrics.get("numOutputRows").map(_.value),
        failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      add(ExecRecord(funcName, 0L, None, failed = true))

    def records: Seq[ExecRecord] = {
      val it = buf.iterator()
      val out = Seq.newBuilder[ExecRecord]
      while (it.hasNext) out += it.next()
      out.result()
    }
  }

  /** Register a recorder on the session; caller owns `detach`. */
  def attach(spark: SparkSession, maxRecords: Int = 1024): Recorder = {
    val r = new Recorder(maxRecords)
    spark.listenerManager.register(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)
}
