package graft

import graft.operators.Telemetry
import org.apache.spark.sql.functions._

/** t3 golden for the SURVEY §3.3 calibration lifecycle (hx711_
  * calibration/hx711_calibration.ino:28-47): the REPL loop converges
  * a per-sensor factor, MERGE-upserts the factor row into the
  * standing calibration dim, and the production join then reads the
  * updated dim — previously declared but untested (VERDICT r14
  * what's-missing #2).
  */
class CalibrationUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def dim0 = Seq(
    ("sn-01", 420.0, 12.5),
    ("sn-02", 380.0, 3.0),
    ("sn-03", 455.0, 7.25)).toDF("sn", "factor", "zero")

  test("upsertRows: MERGE semantics — matched keys update, new keys " +
      "insert, untouched rows survive byte-identical") {
    val updates = Seq(
      ("sn-02", 390.0, 3.0),  // WHEN MATCHED UPDATE
      ("sn-04", 500.0, 0.5))  // WHEN NOT MATCHED INSERT
      .toDF("sn", "factor", "zero")
    val merged = Telemetry.upsertRows(dim0, updates, Seq("sn"))
      .as[(String, Double, Double)].collect().toSet
    assert(merged == Set(
      ("sn-01", 420.0, 12.5),
      ("sn-02", 390.0, 3.0),
      ("sn-03", 455.0, 7.25),
      ("sn-04", 500.0, 0.5)), merged.toString)
  }

  test("the REPL loop converges a factor, upserts it into the " +
      "parquet dim, and the production join reads the update") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-calib-").toString + "/calibration"
    dim0.coalesce(1).write.parquet(dir)

    // readings from sn-02 whose true scale factor is 400 (raw =
    // grams * 400): with the standing factor 380 the calibrated
    // weights read high — the operator runs the ±10 search the
    // sketch's +/- serial commands drive, against the MEAN reading
    val rawMean = 400.0 * 100.0 // 100 g object on a factor-400 scale
    def readingAt(factor: Double): Double = rawMean / factor
    var factor = spark.read.parquet(dir)
      .filter(col("sn") === "sn-02")
      .select("factor").as[Double].head()
    val target = 100.0
    var guard = 0
    while (math.abs(readingAt(factor) - target) >
        math.abs(readingAt(factor + 10) - target) && guard < 50) {
      factor += 10; guard += 1
    }
    assert(factor == 400.0, s"REPL search converged to $factor")

    // MERGE-upsert the converged row; zero re-derived like setup's
    // read_average tare
    val updated = Telemetry.upsertCalibrationTable(spark, dir,
      Seq(("sn-02", factor, 3.0)).toDF("sn", "factor", "zero"),
      Seq("sn"))
    assert(updated.count() == 3)

    // the production q52-shaped join now applies the UPDATED factor
    val readings = Seq(
      ("sn-01", 42000.0), ("sn-02", rawMean), ("sn-03", 4550.0))
      .toDF("sn", "raw")
    val got = readings.join(broadcast(updated), Seq("sn"))
      .select(col("sn"),
        round(Telemetry.calibrated(col("raw"), col("factor"),
          col("zero")), 2).as("w"))
      .as[(String, Double)].collect().toMap
    assert(got("sn-02") == 97.0, // 40000/400 - 3.0
      s"updated factor must drive the join: $got")
    assert(got("sn-01") == 87.5 && got("sn-03") == 2.75,
      s"untouched rows unchanged: $got")

    // idempotence: re-upserting the same row is a no-op. (Collect the
    // first state BEFORE the rewrite: the returned frame pins its
    // file listing, so a reference held across a later overwrite
    // must not be re-read — the lifecycle reloads via the operator's
    // return value each time.)
    val stateBefore =
      updated.as[(String, Double, Double)].collect().toSet
    val again = Telemetry.upsertCalibrationTable(spark, dir,
      Seq(("sn-02", factor, 3.0)).toDF("sn", "factor", "zero"),
      Seq("sn"))
    assert(again.as[(String, Double, Double)].collect().toSet ==
      stateBefore)
  }
}
