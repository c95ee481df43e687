package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Q20–Q28: scalar function families (string/format/date/JSON/base64),
  * the reference's time semantics (epoch assembly, boundary-aligned
  * alarm, hourly buckets), and the batch analogs of the streaming
  * session/dedup operators (SURVEY.md §2.8–§2.9).
  */
object ScalarQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // F1-F5/P5/P6/S11 — string build/probe/format surface
    // (JSON assembly master/master.ino:465-480; strstr AT matching
    // master/master.ino:378; display padding prototype_1:35-36).
    QueryDef(
      "q20_string_funcs",
      Some("""SELECT doc_id,
              CONCAT(lang, ':', SUBSTRING(source, 1, 3)) AS tag,
              CAST(LENGTH(text) AS BIGINT) AS len,
              CAST(STRPOS(text, 'e') AS BIGINT) AS epos,
              UPPER(lang) AS lang_u,
              LPAD(lang, 5, ' ') AS padded
              FROM documents ORDER BY doc_id LIMIT 200"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("lang"), lit(":"), substring(col("source"), 1, 3))
              .as("tag"),
            length(col("text")).cast("long").as("len"),
            instr(col("text"), "e").cast("long").as("epos"),
            upper(col("lang")).as("lang_u"),
            lpad(col("lang"), 5, " ").as("padded"))
          .orderBy("doc_id")
          .limit(200)),

    // F9/F11/P8 — epoch assembly + timestamp threshold
    // (master/master.ino:700-712,122-124).
    QueryDef(
      "q21_epoch_extract",
      Some("""SELECT event_id,
              CAST(EXTRACT(HOUR FROM ts) AS INT) AS h,
              epoch_us(ts::TIMESTAMP) // 1000000 AS epoch
              FROM events WHERE ts > TIMESTAMP '2020-01-01 00:00:00'
              ORDER BY event_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("ts") > lit("2020-01-01 00:00:00").cast("timestamp"))
          .select(col("event_id"),
            hour(col("ts")).cast("int").as("h"),
            unix_timestamp(col("ts")).as("epoch"))
          .orderBy("event_id")
          .limit(500)),

    // F8/F10 — boundary-aligned next alarm: (ts/i + 1) * i, the exact
    // firmware formula incl. skip-on-exact-boundary
    // (master/master.ino:673-679).
    QueryDef(
      "q22_next_alarm",
      Some("""SELECT event_id,
              (epoch_us(ts::TIMESTAMP) // 1000000 // 3600 + 1) * 3600
                AS next_alarm
              FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            ((unix_timestamp(col("ts")).divide(lit(3600)))
              .cast("long") + 1).multiply(3600).as("next_alarm"))
          .orderBy("event_id")
          .limit(500)),

    // F13 — JSON extract from the opaque props payload (gateway
    // forwards opaque JSON, gateway/gateway.ino:83).
    QueryDef(
      "q23_json_extract",
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k
              FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k"))
          .orderBy("event_id")
          .limit(500)),

    // F14 — base64 transport encoding (gateway/gateway.ino:83-84).
    QueryDef(
      "q25_base64",
      Some("""SELECT doc_id, to_base64(encode(SUBSTRING(text, 1, 16))) AS b64
              FROM documents ORDER BY doc_id LIMIT 200"""),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            base64(substring(col("text"), 1, 16).cast("binary")).as("b64"))
          .orderBy("doc_id")
          .limit(200)),

    // T1-batch/F10/A8 — tumbling 1 h bucket aggregate, the batch analog
    // of the hourly alarm round (master/master.ino:27,670-698).
    QueryDef(
      "q26_hourly_window",
      Some("""SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 1000000
                AS wstart,
              event_type, COUNT(*) AS cnt,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 3) AS DOUBLE)
                AS sv
              FROM events GROUP BY 1, 2 ORDER BY wstart, event_type"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            unix_timestamp(date_trunc("HOUR", col("ts"))).as("wstart"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            round(graft.plans.MoneySum.sumDec128(
                col("value").cast(DecimalType(18, 6))), 3)
              .cast("double").as("sv"))
          .orderBy("wstart", "event_type")),

    // T6-batch — session windows with 60 s gap, the slave awake-session
    // timeout (slave/slave.ino:121-124): count sessions per user.
    QueryDef(
      "q27_sessionize",
      Some("""WITH g AS (SELECT user_id,
                CASE WHEN epoch_us(ts::TIMESTAMP) // 1000000
                     - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id)::TIMESTAMP) // 1000000 > 60
                     OR LAG(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS brk
                FROM events)
              SELECT user_id, CAST(SUM(brk) AS BIGINT) AS sessions
              FROM g GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(col("user_id"),
            when(
              unix_timestamp(col("ts")) -
                unix_timestamp(lag("ts", 1).over(w)) > 60 ||
                lag("ts", 1).over(w).isNull, 1)
              .otherwise(0).as("brk"))
          .groupBy("user_id")
          .agg(sum("brk").cast("long").as("sessions"))
          .orderBy("user_id")
      }),

    // T3-batch — dedup-keep-first per key, the effectively-once retry
    // semantics (master/master.ino:218-220).
    QueryDef(
      "q28_dedup_first",
      Some("""SELECT user_id, event_type, MIN(event_id) AS first_id
              FROM events GROUP BY user_id, event_type
              ORDER BY user_id, event_type"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id", "event_type")
          .agg(min("event_id").as("first_id"))
          .orderBy("user_id", "event_type")),
  )
}
