package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: print the AQE-FINAL executed plan of one query at an
  * arbitrary sf dir under the Bench session config — the missing half
  * of the ".explain and iterate" loop. PlanDump fingerprints the
  * pre-AQE plan (stable, golden-able); sizing decisions AQE takes at
  * runtime (broadcast conversions, coalesced partitions, skew splits)
  * only show on the executed plan AFTER an action, which is what this
  * prints. `sbt "runMain graft.tools.ExplainFinal <sfDir> <query>"`.
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainFinal <sfDir> <query> [query ...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_BC", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.local.scanParallelism", "32")
      .config("spark.sql.files.openCostInBytes", "131072") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS df's own physical plan (a noop write would spawn
      // a separate QueryExecution and leave this one un-finalized,
      // printing isFinalPlan=false pre-AQE state)
      val exec = df.queryExecution.executedPlan
      exec.execute().foreach(_ => ())
      val finalPlan = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      println(s"==== $name (AQE-final) ====")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_DEBUG")) {
        println("adaptive.autoBroadcastJoinThreshold=" +
          spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold"))
        println(exec.toString)
      }
      // numberedTreeString keeps operator ids; enough to see join
      // strategies, exchanges, and coalesced partition counts
      println(finalPlan.treeString)
    }
    spark.stop()
  }
}
