package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.PipelineQueries

/** Paired same-JVM A/B for minhashCandidates' chainLink backstop
  * (round 17): the mixed-bucket recall mitigation was committed on
  * recall evidence alone — this tool measures what it costs the
  * candidates+verify path, interleaved rep-by-rep per SURVEY §5.2.
  * Also prints candidate counts so a cost increase can be attributed
  * to candidate growth vs plan overhead. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.AbMinhashChain [reps]"
  */
object AbMinhashChain {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.local.scanParallelism", cpus)
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the queries read the memoized shingle artifact — warm it like
    // the bench does so the A/B measures candidates+verify, not the
    // artifact build
    PipelineQueries.warmShared(spark, sfDir)
    val sh = PipelineQueries.shinglesForAb(spark, sfDir)
    sh.cache().count()
    // the shipped query shape: banding memoized once (write-once
    // derived index), star + chain both read it
    val bk = graft.operators.Dedup.bandedWithArray(sh)
    bk.cache().count()

    def run(chain: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.verifiedPairs(sh,
          graft.operators.Dedup.minhashCandidatesFromBanded(bk,
            chainLink = chain))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // legacy on-the-fly shape (sig recomputed per consumer) for the
    // record the memoization decision rests on
    def runFly(chain: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.verifiedPairs(sh,
          graft.operators.Dedup.minhashCandidates(sh, chainLink = chain))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def candCount(chain: Boolean): Long =
      graft.operators.Dedup.minhashCandidatesFromBanded(bk,
        chainLink = chain).count()
    println(s"candidates: star=${candCount(false)} chained=${candCount(true)}")
    run(true); run(false); runFly(true) // JIT warmup
    val rows = (1 to reps).map(_ => (run(true), run(false), runFly(true)))
    val (on, off, fly) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    def fmt(xs: Seq[Double]) =
      f"med ${med(xs)}%.3f min ${xs.min}%.3f max ${xs.max}%.3f"
    println(s"sf=$sfDir reps=$reps (candidates+verify, noop sink)")
    println(s"  memo  chain ON : ${fmt(on)}")
    println(s"  memo  chain OFF: ${fmt(off)}")
    println(s"  fly   chain ON : ${fmt(fly)}")
    spark.stop()
  }
}
