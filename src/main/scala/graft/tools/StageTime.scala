package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-loop stage profiler: run one registered query and print each
  * stage's executor-side cost, so "where do the seconds go" is a
  * measurement, not a guess over the plan. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.StageTime ns_dedup_incremental"
  *
  * Prints one line per completed stage — executor run time (sum over
  * tasks), GC time, shuffle read/write bytes, task count, and the
  * stage's callsite name — then the total wall time of the action.
  * Diagnostic only; the bench record stays graft.Bench.
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageTime <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // mirror graft.Bench's session confs — a profile under different
    // join thresholds / split sizes diagnoses a plan the bench never
    // runs (first cut of this tool "found" an AQE broadcast pathology
    // that only existed because AQE_BC was not -1 here)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_BC", "-1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
      .config("spark.sql.windowExec.buffer.spill.threshold", "4194304")
      .config("spark.graft.local.scanParallelism", cpus)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v)
        case _                              => ()
      }
    })
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_STAGETIME_WARM=1 mirrors Bench's untimed warm path (catalog
    // columnar cache + shared artifacts) so the profiled stages are the
    // ones the bench's timed region actually runs — without it a rep
    // profiles raw-parquet decode the bench never pays (and at tiny
    // trend row-groups that decode dominates every stage).
    if (sys.env.get("GRAFT_STAGETIME_WARM").contains("1")) {
      graft.Catalog.tableNames.foreach { t =>
        try graft.Catalog.table(spark, sfDir, t).cache().count()
        catch { case _: Throwable => () }
      }
      try graft.queries.PipelineQueries.warmShared(spark, sfDir)
      catch { case _: Throwable => () }
    }

    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))

    case class Row(id: Int, name: String, runMs: Long, gcMs: Long,
        shRead: Long, shWrite: Long, tasks: Int,
        subMs: Long, doneMs: Long, cpuMs: Long, spillMem: Long,
        spillDisk: Long, fetchWaitMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.add(Row(i.stageId, i.name.takeWhile(_ != '\n'),
          m.executorRunTime, m.jvmGCTime,
          m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead,
          m.shuffleWriteMetrics.bytesWritten, i.numTasks,
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          m.executorCpuTime / 1000000, m.memoryBytesSpilled,
          m.diskBytesSpilled, m.shuffleReadMetrics.fetchWaitTime))
      }
    })

    for (r <- 1 to reps) {
      stages.clear()
      val t0 = System.nanoTime()
      val qe = fn(spark, sfDir).queryExecution
      val n = qe.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (r == reps && sys.env.contains("GRAFT_STAGETIME_PLAN"))
        println(qe.executedPlan.treeString)
      // listener events are posted asynchronously and waitUntilEmpty
      // is private[spark]; a fixed sleep is racy on a loaded box
      // (ADVICE r15: late events drop from rep N or leak into rep
      // N+1's cleared queue). Poll until the completion count has
      // been stable for a full grace window, bounded so a wedged bus
      // cannot hang the tool.
      var seen = -1
      var stableMs = 0
      val drainDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stableMs < 500 && System.nanoTime() < drainDeadline) {
        Thread.sleep(100)
        val now = stages.size()
        if (now == seen) stableMs += 100 else { stableMs = 0; seen = now }
      }
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_.runMs)
      println(f"== $name rep $r: wall $wall%.2f s, rows $n, " +
        f"${rows.size} stages, exec-sum ${rows.map(_.runMs).sum / 1e3}%.2f s")
      // wall view beside the exec view: per-stage [submit→complete]
      // wall span plus the offset from the rep's first submission, so
      // serial DAG latency (scheduling gaps, driver-side broadcast
      // builds BETWEEN stages) is readable — exec-sum alone hides it
      val t0Stage = rows.map(_.subMs).filter(_ > 0)
        .minOption.getOrElse(0L)
      rows.take(20).foreach { s =>
        println(f"  stage ${s.id}%4d run ${s.runMs / 1e3}%8.2f s  cpu " +
          f"${s.cpuMs / 1e3}%7.2f s  gc " +
          f"${s.gcMs / 1e3}%5.2f s  fw ${s.fetchWaitMs / 1e3}%5.2f s  " +
          f"spill ${s.spillDisk / 1e6}%6.1f MB  " +
          f"shR ${s.shRead / 1e6}%7.1f MB  shW " +
          f"${s.shWrite / 1e6}%7.1f MB  tasks ${s.tasks}%4d  " +
          f"wall ${(s.doneMs - s.subMs) / 1e3}%6.2f s  " +
          f"@${(s.subMs - t0Stage) / 1e3}%6.2f s  ${s.name}")
      }
    }
    spark.stop()
  }
}
