package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q38+: OLAP-surface breadth beyond the SURVEY §2.11 contract —
  * predicate subqueries (Catalyst RewritePredicateSubquery → semi/anti
  * joins), RANGE window frames, first/last/nth window values, ordered
  * array & string aggregation, regex extraction, and null-handling
  * scalar families. Same determinism conventions as the core set.
  */
object ExtendedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // EXISTS / NOT IN predicate subqueries (planned as semi/anti joins)
    QueryDef(
      "q38_exists_subquery",
      Some("""SELECT s_suppkey FROM supplier s
              WHERE EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = s.s_nationkey
                              AND n.n_regionkey = 0)
              ORDER BY s_suppkey"""),
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT s_suppkey FROM supplier s
                 WHERE EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = s.s_nationkey
                                 AND n.n_regionkey = 0)
                 ORDER BY s_suppkey""")
      }),

    // RANGE interval frame: sum of value over [value-0.1, value] per type
    QueryDef(
      "q39_range_frame",
      Some("""SELECT event_id,
              CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY value
                   RANGE BETWEEN 0.1 PRECEDING AND CURRENT ROW) AS BIGINT)
                AS n_near
              FROM events ORDER BY event_id"""),
      (s, dir) => {
        // DataFrame rangeBetween only takes Long bounds; fractional
        // RANGE frames are a SQL-surface feature
        Catalog.registerAll(s, dir)
        s.sql("""SELECT event_id,
                 CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY value
                      RANGE BETWEEN 0.1 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_near
                 FROM events ORDER BY event_id""")
      }),

    // first_value / last_value / nth_value window functions
    QueryDef(
      "q40_first_last_value",
      Some("""SELECT event_id,
              FIRST_VALUE(event_id) OVER w AS first_id,
              LAST_VALUE(event_id) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS last_id,
              NTH_VALUE(event_id, 2) OVER w AS second_id
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wAll = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        t(s, dir, "events")
          .select(col("event_id"),
            first("event_id").over(w).as("first_id"),
            last("event_id").over(wAll).as("last_id"),
            nth_value(col("event_id"), 2).over(w).as("second_id"))
          .orderBy("event_id")
      }),

    // ordered array aggregation (relational → array, deterministic).
    // The array is built and sorted as a real array<string>; the
    // output serializes it (array_to_string) plus its cardinality
    // because the driver's pandas comparator cannot hash raw array
    // columns (round-1 q41 red, VERDICT.md item 2).
    QueryDef(
      "q41_array_agg",
      Some("""SELECT n_regionkey,
              array_to_string(list_sort(list(n_name)), ',') AS names,
              CAST(len(list(n_name)) AS BIGINT) AS n_names
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(
            array_join(array_sort(collect_list("n_name")), ",")
              .as("names"),
            // count(col) ≡ len(list(col)) (both skip nulls) without a
            // second collect_list buffer per group
            count("n_name").as("n_names"))
          .orderBy("n_regionkey")),

    // ordered string aggregation
    QueryDef(
      "q42_string_agg",
      Some("""SELECT n_regionkey,
              array_to_string(list_sort(list(n_name)), ',') AS all_names
              FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(concat_ws(",", array_sort(collect_list("n_name")))
            .as("all_names"))
          .orderBy("n_regionkey")),

    // regex extraction with capture group (F-family; gateway's
    // substring routing generalized)
    QueryDef(
      "q43_regex_extract",
      Some("""SELECT doc_id,
              regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
              CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END
                AS has_spark
              FROM documents ORDER BY doc_id LIMIT 200"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            regexp_extract(col("source"), "src([0-9]+)", 1).as("src_num"),
            when(col("text").rlike("spark"), 1).otherwise(0).as("has_spark"))
          .orderBy("doc_id")
          .limit(200)),

    // W6 completion: percent_rank / cume_dist distribution analytics
    QueryDef(
      "q50_percent_rank",
      Some("""SELECT event_id,
              ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                    ORDER BY value, event_id), 6) AS pr,
              ROUND(CUME_DIST() OVER (PARTITION BY event_type
                    ORDER BY value, event_id), 6) AS cd
              FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        t(s, dir, "events")
          .select(col("event_id"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("event_id")
          .limit(500)
      }),

    // F20 completion: chr/ascii character codec round-trip
    QueryDef(
      "q51_chr_ascii",
      Some("""SELECT doc_id,
              CAST(ascii(SUBSTRING(lang, 1, 1)) AS INT) AS a,
              chr(CAST(65 + doc_id % 26 AS INT)) AS c
              FROM documents ORDER BY doc_id LIMIT 200"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            ascii(substring(col("lang"), 1, 1)).cast("int").as("a"),
            expr("char(65 + doc_id % 26)").as("c"))
          .orderBy("doc_id")
          .limit(200)),

    // TPC-H Q1 shape: pricing summary with computed measures over a
    // date-filtered scan (predicate pushdown + partial agg).
    QueryDef(
      "q45_tpch_pricing",
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2)
                   AS DOUBLE) AS sum_qty,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                   AS DOUBLE) AS sum_base,
              CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc,
              COUNT(*) AS cnt
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <=
            lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(graft.plans.MoneySum.sumMoneyDouble(
                col("l_quantity")), 2)
              .cast("double").as("sum_qty"),
            round(graft.plans.MoneySum.sumMoneyDouble(
                col("l_extendedprice")), 2)
              .cast("double").as("sum_base"),
            round(graft.plans.MoneySum.sumMoneyDouble(
                col("l_extendedprice") * (lit(1) - col("l_discount"))),
              2).cast("double").as("sum_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // TPC-H Q3 shape: segment revenue top-N (fact-fact join + top-k).
    QueryDef(
      "q46_tpch_shipping",
      Some("""SELECT o.o_orderkey,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE c.c_mktsegment = 'BUILDING'
              GROUP BY o.o_orderkey
              ORDER BY revenue DESC, o.o_orderkey LIMIT 20"""),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // same size-routed shape as q47: (customer⋈orders) is bounded
        // by |orders|, so the orders statistic decides broadcast vs
        // shuffle — lineitem stays un-shuffled when the stat is small.
        // Width-honest hint (r13 ADVICE follow-through): after column
        // pruning the broadcast relation carries ONLY o_orderkey, so
        // the statistic is the orders scan projected to that column —
        // same row-count bound, the width the executors actually hold.
        // The lineitem probe is a LEFT SEMI against the qualifying
        // orderkeys (o_orderkey is the orders PRIMARY key, so inner
        // and semi agree row-for-row): the BHJ emits the probe row
        // unchanged instead of constructing a joined row per match,
        // and the aggregate keys on l_orderkey directly (round 20 —
        // the probe stage is this query's dominant exec cost).
        val qual = graft.operators.Joins.broadcastIfSmall(
          c.join(o, c("c_custkey") === o("o_custkey"))
            .select(o("o_orderkey")),
          o.select(col("o_orderkey")), statsKey = s"$dir#q46qual")
        l.join(qual, l("l_orderkey") === qual("o_orderkey"), "left_semi")
          .groupBy(l("l_orderkey"))
          .agg(round(graft.plans.MoneySum.sumMoneyDouble(
            l("l_extendedprice") * (lit(1) - l("l_discount"))),
            2).cast("double").as("revenue"))
          .select(col("l_orderkey").as("o_orderkey"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(20)
      }),

    // TPC-H Q5 shape: revenue by nation through the full star
    // (local supplier condition dropped — synthetic keys differ).
    QueryDef(
      "q47_tpch_local_volume",
      Some("""SELECT n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
              FROM region r
              JOIN nation n ON n.n_regionkey = r.r_regionkey
              JOIN customer c ON c.c_nationkey = n.n_nationkey
              JOIN orders o ON o.o_custkey = c.c_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE r.r_name = 'ASIA'
              GROUP BY n.n_name ORDER BY n.n_name"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // region (5 rows) and nation (25 rows) are CONSTANT-cardinality
        // dims — the same rows at any scale factor — so they are folded
        // driver-side (Joins.dimFold, hard 1024-row cap) instead of
        // spending two broadcast-build jobs on the critical path
        // (round 20: the sf1 residual was pure DAG latency — four
        // sequential broadcast jobs on a 0.22 s oracle). The fold turns
        // r⋈n⋈c into a pushed-down IN(asia nation keys) filter on the
        // customer scan, and the post-agg name join into a literal-map
        // lookup over the 5 output rows.
        val asiaRegions = graft.operators.Joins.dimFoldCached(
            s"$dir/region", t(s, dir, "region"), Seq("r_regionkey", "r_name"))
          .filter(_.getString(1) == "ASIA").map(_.getInt(0)).toSet
        val asiaNations = graft.operators.Joins.dimFoldCached(
            s"$dir/nation", t(s, dir, "nation"),
            Seq("n_nationkey", "n_regionkey", "n_name"))
          .filter(r => asiaRegions.contains(r.getInt(1)))
        val nameMap = asiaNations.map(r => r.getInt(0) -> r.getString(2)).toMap
        val asiaKeys = asiaNations.map(r => Int.box(r.getInt(0)))
        // Build-side LADDER (round 15, VERDICT r14 what's-wrong #3):
        // the sf1 profile showed the right join ORDER but the wrong
        // build sides — Spark's static threshold chose the 10×-bigger
        // ORDERS scan as the c⋈o build side (a 4.5 M-row driver
        // collect + hash build; at cluster scale an OOM shape), so
        // the query serialized on driver-side broadcast builds.
        // Every level routes the DIM-BOUNDED side as the build via
        // broadcastIfSmall, so the fact tables (orders, lineitem)
        // only ever STREAM:
        //   customer filtered by the folded ASIA key set builds the
        //   (c_custkey, n_nationkey) side → ⋈o builds on the
        //   (o_orderkey, n_nationkey) side. Hint widths are honest
        //   OVER-estimates of the broadcast rows (VERDICT r15 #6):
        //   custSide actual (bigint+int = 12 B) vs hint
        //   (c_custkey, c_nationkey) = 12 B; ordSide actual
        //   (bigint+int = 12 B) vs hint (o_orderkey, o_custkey) =
        //   16 B — the hint never understates, so it spends none of
        //   broadcastIfSmall's inflation margin. Row-count bounds
        //   |customer| / |orders| are table statistics, so the
        //   100 TB shuffle fallback still fires level by level.
        // The ladder carries the INT nation key, not the n_name
        // string: the fact-side probe rows, the broadcast build
        // bytes, and the 6 M-row partial-agg hash keys all shrink to
        // 4 B, and n_name is resolved AFTER aggregation via the
        // folded 25-entry literal map (5 post-agg rows).
        val custSide = graft.operators.Joins.broadcastIfSmall(
          c.filter(col("c_nationkey").isin(asiaKeys: _*))
            .select(col("c_custkey"), col("c_nationkey").as("n_nationkey")),
          c.select(col("c_custkey"), col("c_nationkey")),
          statsKey = s"$dir#q47cust")
        val ordFits = graft.operators.Joins.fitsBroadcast(
          o.select(col("o_orderkey"), col("o_custkey")),
          statsKey = s"$dir#q47ord")
        val ordSideIn = custSide.join(o, o("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("n_nationkey"))
        val ordSide =
          if (ordFits) broadcast(ordSideIn) else ordSideIn
        val money = l("l_extendedprice") * (lit(1) - l("l_discount"))
        val agged =
          if (ordFits)
            // broadcast ladder: lineitem streams un-shuffled through
            // the BHJ probe straight into the 25-key partial aggregate
            ordSide.join(l, l("l_orderkey") === col("o_orderkey"))
              .groupBy(col("n_nationkey"))
              .agg(round(graft.plans.MoneySum.sumMoneyDouble(money),
                2).cast("double").as("revenue"))
          else
            // Shuffle fallback: when the qualifying-orders side
            // outgrows the broadcast budget the last join exchanges
            // both sides — and Spark's default sort-merge then SORTS
            // the 18M-row lineitem side (the r20 sf3 profile: 267 MB
            // exchange + a 265 MB reduce-side sort SPILL). The join is
            // FK-shaped — per reduce partition the qualifying-orders
            // build is |orders|/(5·parts) keys, trivially hash-table
            // sized at any scale that reaches this route — so a
            // shuffled-HASH join (guide §3.1) streams lineitem through
            // a per-partition build instead of sorting it: same
            // exchanges, zero sorts, zero spill. (An A/B of guide
            // §2.3's aggregate-before-the-shuffle rewrite — pre-agg by
            // l_orderkey, join partials — measured 4× WORSE here:
            // ~4 lines/order compresses the exchange only 267→199 MB
            // while the 4.5M-group two-phase aggregate adds a full
            // reduce stage and map-side hash pressure. Rejected.)
            ordSide.hint("shuffle_hash")
              .join(l, l("l_orderkey") === col("o_orderkey"))
              .groupBy(col("n_nationkey"))
              .agg(round(graft.plans.MoneySum.sumMoneyDouble(money),
                2).cast("double").as("revenue"))
        agged
          .select(element_at(typedLit(nameMap), col("n_nationkey"))
            .as("n_name"), col("revenue"))
          // output cardinality is dim-bounded (≤25 nations), so a
          // single-partition sort replaces orderBy's range-partition
          // SAMPLING job — one fewer job on the critical path
          .coalesce(1).sortWithinPartitions("n_name")
      }),

    // pivot: event counts per user across the five event types
    // (groupBy().pivot() → conditional-agg oracle)
    QueryDef(
      "q48_pivot",
      Some("""SELECT user_id,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click,
              COUNT(*) FILTER (WHERE event_type = 'error') AS error,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
              COUNT(*) FILTER (WHERE event_type = 'view') AS view
              FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy("user_id")),

    // unpivot: wide metrics back to (key, metric, value) rows
    QueryDef(
      "q49_unpivot",
      Some("""SELECT c_custkey, metric,
              CAST(ROUND(val, 2) AS DOUBLE) AS val FROM (
                SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val
                FROM customer
                UNION ALL
                SELECT c_custkey, 'nationkey', c_nationkey::DOUBLE
                FROM customer)
              ORDER BY c_custkey, metric"""),
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            col("c_nationkey").cast("double"))
          .unpivot(Array(col("c_custkey")),
            Array(col("c_acctbal").as("acctbal"),
              col("c_nationkey").as("nationkey")),
            "metric", "raw")
          .select(col("c_custkey"), col("metric"),
            round(col("raw"), 2).cast("double").as("val"))
          .orderBy("c_custkey", "metric")),

    // null-handling scalar family: coalesce / nullif / nvl2-style
    QueryDef(
      "q44_null_funcs",
      Some("""SELECT event_id,
              COALESCE(NULLIF(event_type, 'click'), 'filtered') AS et,
              CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                   THEN 'has_k' ELSE 'no_k' END AS k_state
              FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            coalesce(nullif(col("event_type"), lit("click")), lit("filtered"))
              .as("et"),
            when(get_json_object(col("props"), "$.k").isNotNull, "has_k")
              .otherwise("no_k").as("k_state"))
          .orderBy("event_id")
          .limit(500)),

    // Ingest hygiene: error-safe casts — dirty fields become NULL
    // instead of failing the job (the only sane semantics when one
    // malformed row in 100 TB must not kill a pipeline).
    QueryDef(
      "q58_try_cast",
      Some("""SELECT doc_id,
              TRY_CAST(regexp_extract(source, '[0-9]+', 0) AS BIGINT)
                AS src_num,
              TRY_CAST(lang AS BIGINT) AS not_a_number,
              TRY_CAST(n_chars AS SMALLINT) AS maybe_small
              FROM documents ORDER BY doc_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            expr("try_cast(regexp_extract(source, '[0-9]+', 0) AS BIGINT)")
              .as("src_num"),
            expr("try_cast(lang AS BIGINT)").as("not_a_number"),
            expr("try_cast(n_chars AS SMALLINT)").as("maybe_small"))
          .orderBy("doc_id")
          .limit(500)),

    // F9-F11 completeness: calendar arithmetic (truncation, month-end
    // clamping, day arithmetic) over the order dates.
    QueryDef(
      "q56_date_funcs",
      Some("""SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
              last_day(o_orderdate) AS mend,
              CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
              CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                   AS BIGINT) AS d_from_95
              FROM orders ORDER BY o_orderkey LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
            last_day(col("o_orderdate")).as("mend"),
            add_months(col("o_orderdate"), 2).as("plus2m"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .cast("long").as("d_from_95"))
          .orderBy("o_orderkey")
          .limit(500)),

    // A-family completeness: boolean aggregates (the all-present
    // barrier generalized: bool_and ≡ "every device reported").
    QueryDef(
      "q57_bool_agg",
      Some("""SELECT o_orderstatus,
              bool_and(o_totalprice > 1000) AS all_over_1k,
              bool_or(o_totalprice > 400000) AS any_jumbo,
              CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
                AS n_large
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
            bool_or(col("o_totalprice") > 400000).as("any_jumbo"),
            count(when(col("o_totalprice") > 200000, 1)).as("n_large"))
          .orderBy("o_orderstatus")),

    // U-family multiset forms: INTERSECT ALL / EXCEPT ALL preserve
    // duplicate cardinality (q19 covers the distinct variants).
    QueryDef(
      "q54_set_ops_all",
      Some("""SELECT k FROM (
                (SELECT c_nationkey AS k FROM customer
                 INTERSECT ALL SELECT s_nationkey FROM supplier)
                EXCEPT ALL SELECT n_nationkey FROM nation)
              ORDER BY k"""),
      (s, dir) => {
        val cust = t(s, dir, "customer").select(col("c_nationkey").as("k"))
        val supp = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
        val nat = t(s, dir, "nation").select(col("n_nationkey").as("k"))
        cust.intersectAll(supp).exceptAll(nat).orderBy("k")
      }),

    // A6 companion: GROUPING() disambiguates rollup-generated NULLs
    // from data NULLs (the standard report-total marker).
    QueryDef(
      "q55_grouping_id",
      Some("""SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
              CAST(COUNT(*) AS BIGINT) AS cnt
              FROM orders
              GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus NULLS FIRST,
                       o_orderpriority NULLS FIRST, g_status, g_prio"""),
      (s, dir) =>
        t(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(grouping("o_orderstatus").cast("int").as("g_status"),
            grouping("o_orderpriority").cast("int").as("g_prio"),
            count(lit(1)).as("cnt"))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("g_status"), col("g_prio"), col("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first,
            col("g_status"), col("g_prio"))),

    // §4 SQL surface: correlated LATERAL subquery with per-row top-k
    // (Catalyst DecorrelateInnerQuery; the "top-2 per group" shape a
    // report engine serves constantly).
    QueryDef(
      "q53_lateral_topk",
      Some("""SELECT r.r_name, l.c_name, l.bal FROM region r,
              LATERAL (SELECT c.c_name, ROUND(c.c_acctbal, 2) bal
                       FROM customer c JOIN nation n
                         ON c.c_nationkey = n.n_nationkey
                       WHERE n.n_regionkey = r.r_regionkey
                       ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2) l
              ORDER BY r.r_name, bal DESC, c_name"""),
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT r.r_name, l.c_name, l.bal FROM region r,
                 LATERAL (SELECT c.c_name, ROUND(c.c_acctbal, 2) bal
                          FROM customer c JOIN nation n
                            ON c.c_nationkey = n.n_nationkey
                          WHERE n.n_regionkey = r.r_regionkey
                          ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2) l
                 ORDER BY r.r_name, bal DESC, c_name""")
      }),

    // J2 first-class: per-sensor calibration dimension join
    // (hx711_calibration.ino:8 — each scale has its own S/N-keyed
    // calibration factor + zero offset; q03 applies constants only).
    // The dim is derived deterministically from the user_id key space
    // (md5-based factor/zero — identical on both engines), standing in
    // for a real per-S/N calibration table; the fact side joins it
    // BROADCAST: a fleet's calibration dim is tiny vs the readings.
    QueryDef(
      "q52_calibration_dim_join",
      Some("""WITH dim AS (SELECT DISTINCT user_id,
                1.0 + (('0x' || substring(md5('cf:' || user_id::VARCHAR),
                       1, 15))::BIGINT % 1000) / 1000.0 AS factor,
                (('0x' || substring(md5('z:' || user_id::VARCHAR),
                  1, 15))::BIGINT % 100) / 10.0 AS zero
              FROM events)
              SELECT e.event_id, e.user_id,
                ROUND(d.factor, 4) AS factor,
                ROUND((e.value - d.zero) / d.factor, 4) AS calibrated_v
              FROM events e JOIN dim d ON e.user_id = d.user_id
              ORDER BY e.event_id LIMIT 1000"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dim = ev.select(col("user_id")).distinct()
          .withColumn("factor", lit(1.0) +
            (graft.functions.TextFunctions.hex60(
              concat(lit("cf:"), col("user_id").cast("string"))) % 1000)
              .cast("double") / 1000.0)
          .withColumn("zero",
            (graft.functions.TextFunctions.hex60(
              concat(lit("z:"), col("user_id").cast("string"))) % 100)
              .cast("double") / 10.0)
        ev.join(broadcast(dim), Seq("user_id"))
          .select(col("event_id"), col("user_id"),
            round(col("factor"), 4).as("factor"),
            round((col("value") - col("zero")) / col("factor"), 4)
              .as("calibrated_v"))
          .orderBy("event_id")
          .limit(1000)
      }),
  )
}
