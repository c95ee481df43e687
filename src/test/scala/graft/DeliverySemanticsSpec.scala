package graft

import java.sql.Timestamp

import graft.streaming.TelemetryPipeline
import org.apache.spark.sql.functions._

/** t3 goldens for the delivery-semantics rows T4/T5/T7 (VERDICT r1
  * "partial" set): at-least-once replay against an idempotent sink,
  * at-most-once fire-and-forget, and the 1-week clock-skew bound.
  */
class DeliverySemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("T4: idempotent batch write survives a foreachBatch replay without dups") {
    val dir = java.nio.file.Files.createTempDirectory("t4_idem").toString
    val batch = Seq(("H0001", 32100.0), ("H0002", 28450.0))
      .toDF("device_code", "weight_g")
    // first delivery, then the at-least-once replay of the SAME batchId
    TelemetryPipeline.idempotentBatchWrite(batch, 7L, dir)
    TelemetryPipeline.idempotentBatchWrite(batch, 7L, dir)
    val out = spark.read.parquet(dir)
    assert(out.count() == 2, "replayed batch must not duplicate rows")
    assert(out.columns.contains("batch_id"), "partition col on read")
    // a different batchId appends without touching batch 7
    TelemetryPipeline.idempotentBatchWrite(
      Seq(("H0003", 30000.0)).toDF("device_code", "weight_g"), 8L, dir)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("T5: fire-and-forget sends each row at most once, drops failures, never throws") {
    // accumulators: task closures are serialized even in local mode,
    // so driver-side collections would never see executor sends
    val sent = spark.sparkContext.collectionAccumulator[String]("t5_sent")
    val attempts = spark.sparkContext.longAccumulator("t5_attempts")
    val dropped = spark.sparkContext.longAccumulator("t5_dropped")
    val batch = Seq("H0001", "H0002", "FAIL1", "H0003", "FAIL2")
      .toDF("device_code")
    TelemetryPipeline.fireAndForget(batch, r => {
      attempts.add(1L)
      val d = r.getString(0)
      if (d.startsWith("FAIL")) sys.error("radio tx failed")
      sent.add(d)
    }, Some(dropped))
    val sentSet = new java.util.HashSet(sent.value)
    assert(sentSet.size == 3, s"sent: $sentSet")
    assert(attempts.value == 5L, "exactly one attempt per row — no retry")
    assert(dropped.value == 2L, "failures counted, not propagated")
  }

  test("T7 boundary: exactly 1 week of skew is still within the bound (strict >)") {
    val rows = Seq(
      ("H0001", ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")), // = 7d
      ("H0002", ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:01"))) // 7d+1s
      .toDF("device_code", "device_ts", "ingest_ts")
    val out = TelemetryPipeline
      .withSkewPolicy(rows, "device_ts", "ingest_ts")
      .select("device_code", "skew_exceeded")
      .as[(String, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("H0001", false), ("H0002", true)))
  }

  test("T7: skew within the 1-week bound keeps event time; beyond is re-stamped + flagged") {
    val rows = Seq(
      // resynced device: 3-day-old event time (inside the bound)
      ("H0001", ts("2024-01-04 00:00:00"), ts("2024-01-07 00:00:00")),
      // never-resynced device: 2 weeks of skew
      ("H0002", ts("2023-12-24 00:00:00"), ts("2024-01-07 00:00:00")))
      .toDF("device_code", "device_ts", "ingest_ts")
    val out = TelemetryPipeline
      .withSkewPolicy(rows, "device_ts", "ingest_ts")
      .select("device_code", "skew_exceeded", "effective_ts")
      .as[(String, Boolean, Timestamp)].collect().sortBy(_._1)
    assert(out(0) == (("H0001", false, ts("2024-01-04 00:00:00"))))
    assert(out(1) == (("H0002", true, ts("2024-01-07 00:00:00"))))
    // and the within-bound row buckets into its EVENT-time hour window
    val win = TelemetryPipeline.withSkewPolicy(rows, "device_ts", "ingest_ts")
      .filter(!col("skew_exceeded"))
      .groupBy(window(col("effective_ts"), "1 hour"))
      .count().select(col("window.start")).as[Timestamp].collect()
    assert(win.toSeq == Seq(ts("2024-01-04 00:00:00")))
  }
}
