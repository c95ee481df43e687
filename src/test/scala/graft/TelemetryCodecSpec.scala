package graft

import graft.operators.Telemetry
import graft.streaming.TelemetryPipeline
import org.apache.spark.sql.functions._

/** Golden round-trips for the three telemetry document kinds and the
  * tagged-frame codec, using the exact fixture strings from the
  * reference wire formats (FIXTURES.md §A4-A5; master/master.ino:
  * 465-480,555-574; gsm/gsm.ino:10-11; gateway/gateway.ino:69-84).
  */
class TelemetryCodecSpec extends SparkSpec {
  import spark.implicits._

  val dataDoc = """{"H0001":{"w":32100},"H0002":{"w":28450}}"""
  val extendedDoc = """{"H1":{"w":12345,"t":37.5},"H2":{"w":23456,"t":40.1}}"""
  val errorDoc =
    """{"H0001":{"w":32100,"p":1,"s":1},"H0002":{"w":0,"p":0,"s":0}}"""

  test("data document parses to device→metrics rows") {
    val df = Seq(dataDoc).toDF("json")
      .select(Telemetry.parseDoc($"json").as("doc"))
    val rows = Telemetry.explodeDoc(df, "doc")
      .select($"device_code", $"metrics.w")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("H0001", 32100L), ("H0002", 28450L)))
  }

  test("extended document carries temperature") {
    val df = Seq(extendedDoc).toDF("json")
      .select(Telemetry.parseDoc($"json").as("doc"))
    val rows = Telemetry.explodeDoc(df, "doc")
      .select($"device_code", $"metrics.t")
      .as[(String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("H1", 37.5), ("H2", 40.1)))
  }

  test("frame decode: tag, route, payload; zero weight becomes null") {
    val frames = Seq(
      (s"D$dataDoc", "2024-01-01 00:00:00"),
      (s"E$errorDoc", "2024-01-01 00:00:01"),
      ("S" + """{"H1":true,"H2":true}""", "2024-01-01 00:00:02"))
      .toDF("frame", "ts")
      .select($"frame", $"ts".cast("timestamp").as("device_ts"))
    val decoded = TelemetryPipeline.decode(frames)
    val byTag = decoded.groupBy("tag", "endpoint").count()
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(byTag.toSeq == Seq(
      ("D", "/data/", 2L), ("E", "/error-report/", 2L),
      ("S", "/setup-notification/", 2L)))
    // H0002 in the error report has w=0 → null at ingest (P3)
    val nullRows = decoded.filter($"tag" === "E" && $"weight_g".isNull)
      .select($"device_code").as[String].collect()
    assert(nullRows.toSeq == Seq("H0002"))
  }

  test("round-trip: readings → JSON data document → parse back") {
    val doc = Seq(("H0001", 32100L), ("H0002", 28450L))
      .toDF("device_code", "grams")
      .agg(Telemetry.buildDataDoc($"device_code", $"grams").as("json"))
      .as[String].head()
    val back = Seq(doc).toDF("json")
      .select(Telemetry.parseDoc($"json").as("doc"))
    val rows = Telemetry.explodeDoc(back, "doc")
      .select($"device_code", $"metrics.w").as[(String, Long)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("H0001", 32100L), ("H0002", 28450L)))
  }

  test("base64 transport re-encode matches gateway behavior") {
    val out = Seq(dataDoc).toDF("p")
      .select(Telemetry.fromBase64(Telemetry.toBase64($"p")).as("rt"))
      .as[String].head()
    assert(out == dataDoc)
  }

  test("calibration: fabs(raw/factor - zero), grams upscale") {
    val out = Seq((415000.0, 20750.0, -0.5)).toDF("raw", "f", "z")
      .select(
        Telemetry.calibrated($"raw", $"f", $"z").as("kg"))
      .withColumn("g", Telemetry.toGrams($"kg"))
      .as[(Double, Long)].head()
    assert(math.abs(out._1 - 20.5) < 1e-9)
    assert(out._2 == 20500L)
  }
}
