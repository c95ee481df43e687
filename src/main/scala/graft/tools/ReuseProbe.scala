package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scratch dev tool (this round only): does AQE reuse identical
  * shuffle stages when the shared subtree sits on top of a cached
  * relation? Prints the final plan for a cached and an uncached
  * variant of the same triple-self-join over an aggregate.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      // A/B knob: when false, does the cached-relation scan skip the
      // TableCacheQueryStage wrap and restore exchange reuse?
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_PART", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(tag: String, cached: Boolean, checkpointed: Boolean = false): Unit = {
      val base = spark.range(0, 100000L)
        .select((col("id") % 1000).as("k"), col("id"))
      val df =
        if (checkpointed) base.localCheckpoint(true)
        else if (cached) { base.cache(); base.count(); base } else base
      val agg = df.groupBy("k").agg(count(lit(1)).as("c"))
      val j = agg.select(col("k"), col("c").as("c1"))
        .join(agg.select(col("k"), col("c").as("c2")), "k")
        .join(agg.select(col("k"), col("c").as("c3")), "k")
      val exec = j.queryExecution.executedPlan
      exec.execute().foreach(_ => ())
      val fin = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val s = fin.treeString
      val n = "Exchange hashpartitioning".r.findAllIn(s).length
      val r = "(ReusedExchange|ReusedQueryStage|reuses)".r.findAllIn(s).length
      println(s"==== $tag: exchanges=$n reuse-marks=$r")
      println(s)
      if (cached) df.unpersist()
    }
    run("uncached", cached = false)
    run("cached", cached = true)
    // The round-21 central mitigation: an eagerly localCheckpoint'ed
    // frame scans as `Scan ExistingRDD` — no TableCacheQueryStage
    // wrap, identical exchanges above it canonicalize equal, and
    // reuse fires exactly as in the uncached case (while still
    // serving from materialized blocks like a cache). The .cache()
    // variant above is NOT fixable from the extension surface:
    // TableCacheQueryStageExec keeps its per-reference stage id in
    // the default canonicalization (no _canonicalized override — only
    // ExchangeQueryStageExec has one) and AQE wraps every
    // InMemoryTableScanLike unconditionally, so a shim would need a
    // core-class shadow (rejected: Bridge-only boundary).
    run("checkpointed", cached = false, checkpointed = true)

    // why: compare canonicalized pre-AQE exchanges over the cache scan
    {
      val base = spark.range(0, 100000L)
        .select((col("id") % 1000).as("k"), col("id"))
      base.cache(); base.count()
      val agg = base.groupBy("k").agg(count(lit(1)).as("c"))
      val j = agg.select(col("k"), col("c").as("c1"))
        .join(agg.select(col("k"), col("c").as("c2")), "k")
      val exec = j.queryExecution.executedPlan
      exec.execute().foreach(_ => ())
      val fin = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def allStages(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val here = p.collect {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s
        }
        here.flatMap(s => s.plan +: allStages(s.plan))
      }
      val exs = allStages(fin).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      println(s"==== final shuffle stages: ${exs.length}")
      println(fin.treeString.linesIterator.take(30).mkString("\n"))
      if (exs.length >= 2) {
        val (a, b) = (exs(0), exs(1))
        println(s"stage-plan canonical equal: ${a.canonicalized == b.canonicalized}")
        if (a.canonicalized != b.canonicalized) {
          a.canonicalized.treeString.linesIterator
            .zipAll(b.canonicalized.treeString.linesIterator, "<EOF>", "<EOF>")
            .filter { case (x, y) => x != y }.take(8)
            .foreach { case (x, y) => println(s"A: $x"); println(s"B: $y") }
        }
      }
      if (exs.length >= 2) {
        val (a, b) = (exs(0), exs(1))
        println(s"canonical equal: ${a.canonicalized == b.canonicalized}")
        if (a.canonicalized != b.canonicalized) {
          val ca = a.canonicalized.treeString
          val cb = b.canonicalized.treeString
          ca.linesIterator.zipAll(cb.linesIterator, "<EOF>", "<EOF>")
            .filter { case (x, y) => x != y }
            .take(8)
            .foreach { case (x, y) =>
              println(s"A: $x"); println(s"B: $y") }
        }
      }
      base.unpersist()
    }
    spark.stop()
  }
}
