package graft.queries

import graft.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Q01–Q19 of the declared contract (SURVEY.md §2.11): scans,
  * projections/filters, joins, aggregations, window functions, top-k,
  * and set operations, each citing the reference behavior it
  * generalizes. All plans are DataFrame-API-first so Catalyst owns
  * pushdown/pruning/join selection.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  /** Order-independent exact sum for money/qty doubles: accumulate in
    * DECIMAL(18,6) (exact, associative) then back to DOUBLE. The DuckDB
    * oracles use the same cast so both engines agree bit-for-bit.
    * The accumulator is the native 128-bit unscaled sum
    * (plans/MoneySum) — value-identical to Spark's decimal Sum, but
    * three long ops per row in codegen instead of per-row Decimal
    * allocation (~2x on the sf1 money-agg shapes, and no GC churn).
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    round(graft.plans.MoneySum.sumDec128(c.cast(DecimalType(18, 6))), scale)
      .cast("double")

  val defs: Seq[QueryDef] = Seq(

    // S1/S12/O1 — point scan with deterministic order (registry order,
    // master/master.ino:155,216).
    QueryDef(
      "q01_scan_ordered",
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
      // so every output column joins the sort key to keep order total.
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
          .limit(100)),

    // P3/P4 — missing-value + confirmation predicates
    // (master/master.ino:156-165,253-258).
    QueryDef(
      "q02_filter_predicates",
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
              WHERE l_returnflag = 'R' AND l_quantity > 0
              ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") > 0)
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")),

    // P1/F6 — calibrate + rectify: fabs(x - zero_factor)
    // (slave/slave.ino:22,141).
    QueryDef(
      "q03_calibrate_abs",
      Some("""SELECT event_id, ROUND(ABS(value - 0.5), 3) AS calibrated
              FROM events ORDER BY event_id"""),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            round(abs(col("value") - 0.5), 3).as("calibrated"))
          .orderBy("event_id")),

    // P2/F7/F20 — kg→g integer upscale: ceil(w*1000)
    // (master/master.ino:474).
    QueryDef(
      "q04_unit_upscale",
      Some("""SELECT l_orderkey, l_linenumber,
              CAST(CEIL(l_quantity * 1000) AS BIGINT) AS grams
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, grams LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            ceil(col("l_quantity") * 1000).cast("long").as("grams"))
          .orderBy("l_orderkey", "l_linenumber", "grams")
          .limit(500)),

    // J1/P7/F19 — broadcast dim join + route-by-tag CASE
    // (master/master.ino:23-26; gateway/gateway.ino:69-75).
    QueryDef(
      "q05_broadcast_join_case",
      Some("""SELECT n.n_name,
              CASE WHEN r.r_name = 'ASIA' THEN 'D' ELSE 'E' END AS tag
              FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
              ORDER BY n.n_name"""),
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_name"),
            when(col("r_name") === "ASIA", "D").otherwise("E").as("tag"))
          .orderBy("n_name")
      }),

    // J8/J1 — multi-way star join with group aggregate
    // (keyed gather generalized; master/master.ino:216-271).
    QueryDef(
      "q06_star_join",
      Some("""SELECT r.r_name, n.n_name, COUNT(*) AS cnt,
              CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2)
                   AS DOUBLE) AS total
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
          .orderBy("r_name", "n_name")
      }),

    // J4/U1 — anti-join pending set: registry minus responded
    // (master/master.ino:156-168).
    QueryDef(
      "q07_anti_join",
      Some("""SELECT c.c_custkey FROM customer c
              ANTI JOIN orders o ON c.c_custkey = o.o_custkey
              ORDER BY c.c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey").orderBy("c_custkey")
      }),

    // J5 — semi-join: any-response-present gate
    // (master/master.ino:233-244).
    QueryDef(
      "q08_semi_join",
      Some("""SELECT c.c_custkey FROM customer c
              SEMI JOIN orders o ON c.c_custkey = o.o_custkey
              ORDER BY c.c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey").orderBy("c_custkey")
      }),

    // A1/A4/A7 — aggregate suite + filtered agg (TPC-H Q1 shape; the
    // "aggregate all hive readings per round" analog,
    // hx711_calibration/hx711_calibration.ino:23; master/master.ino:555-574).
    QueryDef(
      "q09_agg_suite",
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2)
                   AS DOUBLE) AS sum_qty,
              ROUND(AVG(l_extendedprice), 2) AS avg_price,
              ROUND(MIN(l_discount), 2) AS min_disc,
              ROUND(MAX(l_tax), 2) AS max_tax,
              COUNT(*) FILTER (WHERE l_quantity > 25) AS big_cnt
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).as("sum_qty"),
            round(avg("l_extendedprice"), 2).as("avg_price"),
            round(min("l_discount"), 2).as("min_disc"),
            round(max("l_tax"), 2).as("max_tax"),
            count(when(col("l_quantity") > 25, 1)).as("big_cnt"))
          .orderBy("l_returnflag", "l_linestatus")),

    // A2/A5 — exact distinct count + all-present barrier
    // (master/master.ino:151-168 readingsDone conjunction).
    QueryDef(
      "q10_distinct_barrier",
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS nd_cust,
              CAST(MIN(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END)
                   AS INT) AS all_present
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            countDistinct(col("o_custkey")).as("nd_cust"),
            min(when(col("o_totalprice").isNotNull, 1).otherwise(0))
              .cast("int").as("all_present"))
          .orderBy("o_orderstatus")),

    // A6 — rollup (Catalyst Expand).
    QueryDef(
      "q11_rollup",
      Some("""SELECT r_name, n_name, COUNT(*) AS cnt
              FROM nation JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP(r_name, n_name)
              ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""),
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      }),

    // A6 — cube.
    QueryDef(
      "q12_cube",
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
              FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus NULLS FIRST,
                       o_orderpriority NULLS FIRST"""),
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)),

    // A6 — grouping sets (SQL surface; Spark SQL dialect).
    QueryDef(
      "q13_grouping_sets",
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              ORDER BY o_orderstatus NULLS FIRST,
                       o_orderpriority NULLS FIRST"""),
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
                 FROM orders
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 ORDER BY o_orderstatus NULLS FIRST,
                          o_orderpriority NULLS FIRST""")
      }),

    // W2/A3/J6 — latest-per-key (keyed slot overwrite,
    // master/master.ino:32,253-258).
    QueryDef(
      "q14_latest_per_key",
      Some("""SELECT user_id, event_id FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1 ORDER BY user_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id")
          .orderBy("user_id")
      }),

    // W1/W6 — rank/ntile/wraparound sequence numbering
    // (tx/tx.ino:93-100 counter mod 10).
    QueryDef(
      "q15_rank_ntile_seq",
      Some("""SELECT event_id,
              CAST(RANK() OVER (PARTITION BY event_type
                           ORDER BY value DESC, event_id) AS INT) AS rk,
              CAST(NTILE(4) OVER (PARTITION BY event_type
                             ORDER BY value DESC, event_id) AS INT) AS qtile,
              CAST((ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) - 1) % 10 AS INT) AS seq
              FROM events ORDER BY event_id"""),
      (s, dir) => {
        val byVal = Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id"))
        val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(col("event_id"),
            rank().over(byVal).as("rk"),
            ntile(4).over(byVal).as("qtile"),
            ((row_number().over(byTs) - 1) % 10).cast("int").as("seq"))
          .orderBy("event_id")
      }),

    // W3/W5 — delta vs previous + running total (the domain purpose:
    // weight change between rounds).
    QueryDef(
      "q16_lag_running",
      Some("""SELECT event_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id), 3) AS delta,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3)
                   AS DOUBLE) AS running
              FROM events ORDER BY event_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"),
            round(col("value") - lag("value", 1).over(w), 3).as("delta"),
            round(graft.plans.MoneySum.sumDec128(
                col("value").cast(DecimalType(18, 6))).over(frame), 3)
              .cast("double").as("running"))
          .orderBy("event_id")
      }),

    // S2/W4 — 3-sample moving average (prototype_1/prototype_1.ino:35).
    QueryDef(
      "q17_moving_avg",
      Some("""SELECT event_id,
              ROUND(AVG(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS smooth3
              FROM events ORDER BY event_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"),
            round(avg("value").over(w), 3).as("smooth3"))
          .orderBy("event_id")
      }),

    // O2/O3 — top-k (TakeOrderedAndProject physical op).
    QueryDef(
      "q18_topk",
      Some("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("p"),
            col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "p")),

    // U1/U2/U3 — set ops: ((A INTERSECT B) UNION ALL C) EXCEPT D
    // (pending-set difference, master/master.ino:156-168; telemetry
    // union, gateway/gateway.ino:69-75).
    QueryDef(
      "q19_set_ops",
      Some("""SELECT k FROM (
                (SELECT c_nationkey AS k FROM customer
                 INTERSECT SELECT s_nationkey FROM supplier)
                UNION ALL SELECT n_nationkey FROM nation
                EXCEPT SELECT r_regionkey FROM region)
              ORDER BY k"""),
      (s, dir) => {
        val cust = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val supp = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        val nat = t(s, dir, "nation").select(col("n_nationkey").as("k"))
        val reg = t(s, dir, "region").select(col("r_regionkey").as("k"))
        cust.intersect(supp).unionAll(nat).except(reg).orderBy("k")
      }),
  )
}
