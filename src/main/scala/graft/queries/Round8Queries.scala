package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 extensions: the skew-adaptive as-of join driven through
  * the differential oracle gate (not just its ScalaTest differential)
  * — [[graft.operators.AsOf.joinLatestAuto]] with a target small
  * enough that the one-aggregate skew probe routes to the BUCKETED
  * plan on the test data, so the salted window + carry-in boundary
  * fixup machinery is what DuckDB's native ASOF JOIN verifies.
  */
object Round8Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // J6 auto-routed — q59's exact semantics (events pick the user's
    // latest prior order), but through joinLatestAuto with
    // targetRowsPerTask=16: hot enough keys exist at every sf ≥ 0.01
    // that the probe picks the bucketed plan, whose results must
    // still hash-match DuckDB's ASOF. The probe's collect() is one
    // aggregated row — bounded by construction.
    QueryDef(
      "q69_asof_auto",
      Some("""WITH b AS (SELECT o_custkey k, o_orderdate tt,
                MAX(o_orderkey) AS last_order
                FROM orders GROUP BY 1, 2)
              SELECT e.event_id, b.last_order
              FROM events e ASOF LEFT JOIN b
                ON e.user_id = b.k AND b.tt <= e.ts::TIMESTAMP
              ORDER BY e.event_id"""),
      (s, dir) => {
        val probe = t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"))
        // raw build + tieBreak (see q59): the bucketed plan's
        // closing-value aggregate and in-bucket window both carry the
        // tie ordering, so THIS row now also pins the salted-window
        // tie machinery against DuckDB's pre-aggregated ASOF
        val build = t(s, dir, "orders")
          .select(col("o_custkey").as("k"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("bt"),
            col("o_orderkey").as("last_order"))
        graft.operators.AsOf.joinLatestAuto(
            probe, build, Seq("user_id"), Seq("k"), "t_us", "bt",
            valueCols = Seq("last_order"), strict = false,
            targetRowsPerTask = 16, tieBreak = Seq("last_order"))
          .select("event_id", "last_order")
          .orderBy("event_id")
      }),
  )
}
