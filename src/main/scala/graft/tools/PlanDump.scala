package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: prints the normalized pre-AQE physical
  * plan of each named query (all golden picks when none named) so the
  * ".explain and iterate" loop is one sbt invocation.
  *
  * Usage: sbt "runMain graft.tools.PlanDump [sfDir] [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (dirs, names) = args.partition(_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = if (names.nonEmpty) names.toSeq else PlanGolden.picks
    for (q <- picks) {
      println(s"=== $q ===")
      println(PlanGolden.fingerprint(
        graft.queries.Registry.queries(q)(spark, sfDir)))
    }
    spark.stop()
  }
}
