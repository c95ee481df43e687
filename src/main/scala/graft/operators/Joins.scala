package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-routed join planning helpers — the join-side analog of
  * [[AsOf.autoPlan]]'s disclosed routing pattern: read cheap
  * driver-side plan statistics, pick the plan shape those statistics
  * justify, never hardcode a size assumption into query code.
  *
  * Reference analog: the firmware sizes its gather loop off the fixed
  * slave registry (master/master.ino:151-168) — plan decisions come
  * from known cardinalities, not hope.
  */
object Joins {

  /** Wrap `df` in a broadcast hint when `sizeHint`'s plan-statistics
    * size is at most `maxBytes`; otherwise return `df` unchanged and
    * let the planner shuffle. Metadata-only routing: `sizeHint`
    * statistics come from file bytes (scans) or cache stats
    * (InMemoryRelation) — no Spark job runs.
    *
    * Contract: `df` must be a NON-GROWING derivation of `sizeHint` —
    * filters, projections, and joins that match each `sizeHint` row
    * at most once (e.g. an FK-side equi-join against a dimension), so
    * the single-table statistic is a true upper bound on the
    * broadcast side at ANY scale. Join-OUTPUT statistics without CBO
    * are multiplicative guesses; the input-table statistic is exact,
    * which is what makes this routing honest at 100 TB: a fact side
    * that outgrows `maxBytes` routes to the shuffle plan instead of
    * an executor OOM.
    */
  def broadcastIfSmall(df: DataFrame, sizeHint: DataFrame,
      maxBytes: Long = 256L << 20): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    val bytes = sizeHint.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= maxBytes) broadcast(df) else df
  }
}
