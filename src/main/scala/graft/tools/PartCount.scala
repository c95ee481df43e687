package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: planned scan-partition counts for the large tables at a
  * given sf dir under the Bench session confs.
  */
object PartCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.local.scanParallelism", "32")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "131072"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("documents", "lineitem", "orders", "events", "embeddings"))
      println(s"$t: " +
        graft.Catalog.table(spark, sfDir, t).rdd.getNumPartitions)
    spark.stop()
  }
}
