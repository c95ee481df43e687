package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Catalog
import graft.operators.Curate

/** Paired same-JVM A/B for the two tokenizeWithVocab tiers (in-row
  * literal-map vs broadcast-join) — single filtered Bench runs on this
  * box swing ±40% on sub-second queries, so the SURVEY §5.2 protocol
  * applies: interleave the variants rep-by-rep in ONE session and
  * compare medians. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.AbTokenizeVocab [reps]"
  *
  * Diagnostic only; the shipped routing decision lives in
  * Curate.tokenizeWithVocab's scaladoc with this tool's numbers.
  */
object AbTokenizeVocab {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 11
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
    val docs = Catalog.table(spark, sfDir, "documents")
    docs.cache().count()

    def run(inRowMax: Int): Double = {
      val t0 = System.nanoTime()
      Curate.tokenizeWithVocab(docs, "doc_id", "text", vocabSize = 16,
          inRowMaxVocab = inRowMax)
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one throwaway each for JIT before the paired reps
    run(256); run(0)
    val (inrow, join) =
      (1 to reps).map(_ => (run(256), run(0))).unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    def fmt(xs: Seq[Double]) =
      f"med ${med(xs)}%.3f min ${xs.min}%.3f max ${xs.max}%.3f"
    println(s"sf=$sfDir reps=$reps")
    println(s"  in-row : ${fmt(inrow)}")
    println(s"  join   : ${fmt(join)}")
    spark.stop()
  }
}
