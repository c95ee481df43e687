package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q29–Q35: as-of join, embedding similarity top-k, explode/word-count,
  * exact dedup by content hash, range/theta joins, and correlated
  * scalar subquery (SURVEY.md §2.3 J6-J7, §2.8 F15-F18, §2.11).
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  /** Latest prior event of a DIFFERENT type per row: (event_id,
    * prior_b) over an (event_id, event_type, user_id, ts) frame.
    *
    * Two regimes, picked by a BOUNDED cardinality probe (VERDICT r3
    * item 7 — the probe collects at most maxTypes+1 rows, never the
    * full distinct set):
    *
    *  - |types| <= maxTypes (the enum case): linear per-type window
    *    decomposition — ONE shuffle+sort on (user_id, ts), a running
    *    max of event_id per type over the strictly-prior RANGE frame,
    *    prior_b = greatest over the other types' running maxes. The
    *    naive inequality self-join is O(rows²) within each user key —
    *    one hot user kills it at 100×.
    *
    *  - beyond maxTypes: fall back to the range-join form (the
    *    oracle's own shape). A decomposition over thousands of types
    *    would emit one window column per type and the PLAN becomes
    *    the bottleneck; the join regime shuffles on user_id only.
    */
  private[graft] def priorOtherTypeMax(ev: DataFrame,
      maxTypes: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL types can't seed a per-type column (and the reference
    // semantics b.event_type <> a.event_type drop NULL b-rows anyway)
    val types = ev.select("event_type")
      .filter(col("event_type").isNotNull).distinct()
      .limit(maxTypes + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    if (types.length > maxTypes) {
      val b = ev.select(col("user_id").as("b_uid"), col("ts").as("b_ts"),
        col("event_type").as("b_type"), col("event_id").as("b_id"))
      ev.join(b,
          col("user_id") === col("b_uid") && col("b_ts") < col("ts") &&
            col("b_type") =!= col("event_type"), "left")
        .groupBy(col("event_id"))
        .agg(max(col("b_id")).as("prior_b"))
    } else {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(Window.unboundedPreceding, -1)
      val withMaxes = ev.select(
        col("event_id") +: col("event_type") +: col("user_id") +:
          types.zipWithIndex.map { case (tp, i) =>
            max(when(col("event_type") === tp, col("event_id")))
              .over(w).as(s"m_$i")
          }: _*)
      // greatest() requires ≥2 args — a 0/1-type dataset must yield
      // NULL / the single other-type max, not a plan-build error
      val priorExprs = types.zipWithIndex.map { case (tp, i) =>
        when(col("event_type") =!= tp, col(s"m_$i"))
      }
      val priorB = priorExprs match {
        case Seq() => lit(null).cast(ev.schema("event_id").dataType)
        case Seq(one) => one
        case many => greatest(many: _*)
      }
      withMaxes
        // the window groups NULL user_ids into one partition; the
        // equi-join semantics never match NULLs → NULL out
        .select(col("event_id"),
          when(col("user_id").isNotNull, priorB).as("prior_b"))
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // J6 — as-of: latest prior event of a different type per row
    // (display shows most recent reading, prototype_2:49-70).
    QueryDef(
      "q29_asof_prior",
      Some("""SELECT a.event_id, MAX(b.event_id) AS prior_b
              FROM events a LEFT JOIN events b
                ON a.user_id = b.user_id AND b.ts < a.ts
                AND b.event_type <> a.event_type
              GROUP BY a.event_id ORDER BY a.event_id LIMIT 500"""),
      (s, dir) =>
        // Linear as-of plan (VERDICT r1 item 5) with a cardinality
        // guard (VERDICT r3 item 7): event_type here is a 5-value
        // enum, so priorOtherTypeMax picks the per-type window
        // decomposition; see its doc for the two regimes.
        priorOtherTypeMax(t(s, dir, "events"))
          .orderBy("event_id")
          .limit(500)),

    // X4/F15/F16/O3 — brute-force cosine-ish (dot product) top-k against
    // one probe vector; higher-order array functions, accumulation in
    // float64 on both engines (FIXTURES.md caveat).
    QueryDef(
      "q30_embedding_topk",
      Some("""SELECT e1.vec_id,
              ROUND(list_dot_product(e1.embedding::DOUBLE[],
                                     e2.embedding::DOUBLE[]), 4) AS dot
              FROM embeddings e1 JOIN embeddings e2
                ON e2.vec_id = 0 AND e1.vec_id <> 0
              ORDER BY dot DESC, e1.vec_id LIMIT 10"""),
      (s, dir) => {
        val e1 = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
        val probe = t(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>").as("probe"))
        e1.crossJoin(broadcast(probe))
          .select(col("vec_id"),
            round(aggregate(
              zip_with(col("embedding"), col("probe"), (x, y) => x * y),
              lit(0.0), (acc, z) => acc + z), 4).as("dot"))
          .orderBy(col("dot").desc, col("vec_id"))
          .limit(10)
      }),

    // F17/X3 — explode to words + count (telemetry map relationalized;
    // master/master.ino:465-480 shape).
    QueryDef(
      "q31_word_count",
      Some("""SELECT w AS word, COUNT(*) AS cnt FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS w
                FROM documents) t
              WHERE w <> '' GROUP BY w ORDER BY cnt DESC, word LIMIT 20"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(lower(col("text")), " ", -1)).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20)),

    // F18/X6 — exact near-dup tier: content-hash groupBy
    // (dedup key = md5(text); SURVEY.md §2.10 X6).
    QueryDef(
      "q32_exact_dup",
      Some("""SELECT MD5(text) AS h, COUNT(*) AS copies FROM documents
              GROUP BY MD5(text) HAVING COUNT(*) > 1 ORDER BY h"""),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(count(lit(1)).as("copies"))
          .filter(col("copies") > 1)
          .orderBy("h")),

    // J7 — range join: events within 7 days of each order
    // (interval matching; BASELINE.json north_star).
    QueryDef(
      "q33_range_join",
      Some("""SELECT o.o_orderkey, COUNT(e.event_id) AS ev
              FROM orders o LEFT JOIN events e
                ON e.ts::TIMESTAMP >= o.o_orderdate
                AND e.ts::TIMESTAMP < o.o_orderdate + INTERVAL 7 DAY
              GROUP BY o.o_orderkey ORDER BY o.o_orderkey LIMIT 500"""),
      (s, dir) => {
        // Range-join bucketing: a pure range predicate would plan as a
        // BroadcastNestedLoopJoin (O(|orders|·|events|) — 15G pairs at
        // sf0.1, unusable at 100 TB). Exploding each order into its 8
        // covering day-buckets turns it into an equi-join on the
        // bucket date + residual range filter; each event matches
        // exactly one bucket so counts are unchanged.
        val o = t(s, dir, "orders")
          .withColumn("o_end", col("o_orderdate") + expr("INTERVAL 7 DAY"))
        val e = t(s, dir, "events")
          .withColumn("bucket", to_date(col("ts")))
        val ob = o.withColumn("bucket",
          explode(sequence(to_date(col("o_orderdate")), to_date(col("o_end")))))
        ob.join(e,
            ob("bucket") === e("bucket") &&
              e("ts") >= ob("o_orderdate") && e("ts") < ob("o_end"),
            "left")
          .groupBy("o_orderkey")
          .agg(count(e("event_id")).as("ev"))
          .orderBy("o_orderkey")
          .limit(500)
      }),

    // J7 — theta join (inequality pairing).
    QueryDef(
      "q34_theta_join",
      Some("""SELECT a.r_regionkey AS rk_a, b.r_regionkey AS rk_b
              FROM region a JOIN region b
                ON a.r_regionkey < b.r_regionkey
              ORDER BY rk_a, rk_b"""),
      (s, dir) => {
        val a = t(s, dir, "region").alias("a")
        val b = t(s, dir, "region").alias("b")
        a.join(b, col("a.r_regionkey") < col("b.r_regionkey"))
          .select(col("a.r_regionkey").as("rk_a"),
            col("b.r_regionkey").as("rk_b"))
          .orderBy("rk_a", "rk_b")
      }),

    // A-family extra: exact interpolated median + p90 per group
    // (distribution analytics over the weight-reading analog).
    QueryDef(
      "q36_median_percentile",
      Some("""SELECT event_type,
              ROUND(quantile_cont(value, 0.5), 4) AS med,
              ROUND(quantile_cont(value, 0.9), 4) AS p90
              FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("med"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"))
          .orderBy("event_type")),

    // F-family extra: edit distance as a near-dup gate (string
    // similarity tier below shingle Jaccard).
    QueryDef(
      "q37_levenshtein",
      Some("""SELECT a.doc_id,
              CAST(levenshtein(SUBSTRING(a.text, 1, 30),
                               SUBSTRING(b.text, 1, 30)) AS BIGINT) AS dist
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
              ORDER BY a.doc_id LIMIT 200"""),
      (s, dir) => {
        val a = t(s, dir, "documents").alias("a")
        val b = t(s, dir, "documents").alias("b")
        a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("doc_id"),
            levenshtein(substring(col("a.text"), 1, 30),
              substring(col("b.text"), 1, 30)).cast("long").as("dist"))
          .orderBy("doc_id")
          .limit(200)
      }),

    // §4 — correlated scalar subquery (Catalyst decorrelation;
    // RewriteCorrelatedScalarSubquery).
    QueryDef(
      "q35_correlated_subquery",
      Some("""SELECT o_orderkey FROM orders o
              WHERE o_totalprice > (SELECT AVG(o2.o_totalprice)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
              ORDER BY o_orderkey"""),
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT o_orderkey FROM orders o
                 WHERE o_totalprice > (SELECT AVG(o2.o_totalprice)
                                       FROM orders o2
                                       WHERE o2.o_custkey = o.o_custkey)
                 ORDER BY o_orderkey""")
      }),
  )
}
