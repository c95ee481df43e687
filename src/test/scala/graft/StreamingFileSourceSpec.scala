package graft

import java.nio.file.{Files, Paths}

import graft.streaming.TelemetryPipeline
import org.apache.spark.sql.functions._

/** S5/S9 end-to-end: line-framed text file source (the serial-line
  * analog, master/master.ino:601-650) → frame decode → tag-partitioned
  * parquet sink with checkpointing — the full production ingest shape,
  * driven through real files.
  */
class StreamingFileSourceSpec extends SparkSpec {
  import spark.implicits._

  test("file stream: frames land tag-partitioned with exactly-once checkpointing") {
    val base = Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(inDir))
    Files.writeString(Paths.get(s"$inDir/batch1.txt"),
      """D{"H0001":{"w":32100},"H0002":{"w":28450}}
        |E{"H0001":{"w":32100,"p":1,"s":1},"H0002":{"w":0,"p":0,"s":0}}
        |S{"H1":true,"H2":true}""".stripMargin)

    val frames = spark.readStream
      .format("text")
      .load(inDir)
      .select($"value".as("frame"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("device_ts"))

    val q = TelemetryPipeline.decode(frames)
      .writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .partitionBy("tag")
      .start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(outDir)
    val counts = out.groupBy("tag").count().as[(String, Long)]
      .collect().sortBy(_._1)
    assert(counts.toSeq == Seq(("D", 2L), ("E", 2L), ("S", 2L)))
    // zero-weight sentinel nulled at ingest, data weights intact
    assert(out.filter($"tag" === "D" && $"weight_g" === 32100.0).count() == 1)
    assert(out.filter($"weight_g".isNull && $"tag" === "E").count() == 1)

    // restart from the checkpoint: no reprocessing (exactly-once per file)
    val q2 = TelemetryPipeline.decode(frames)
      .writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .partitionBy("tag")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(outDir).count() == 6)
  }

  test("Trigger.AvailableNow drains the backlog then terminates on its own") {
    // the batch-backfill operational pattern: process everything
    // currently in the source, commit, and STOP — how a 100 TB
    // pipeline replays history with streaming (checkpointed,
    // incremental) semantics but batch (bounded) lifecycle
    val base = Files.createTempDirectory("graft_avnow").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(inDir))
    (1 to 3).foreach { i =>
      Files.writeString(Paths.get(s"$inDir/f$i.txt"),
        s"""D{"H000$i":{"w":${i}000}}""")
    }
    val frames = spark.readStream.format("text").load(inDir)
      .select($"value".as("frame"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("device_ts"))
    val q = TelemetryPipeline.decode(frames)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow terminates by itself once the backlog is drained
    assert(q.awaitTermination(120000), "query should self-terminate")
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("socket source: frames decode from a live TCP line stream (S3/S4 gateway ingest)") {
    // the gateway's real ingest is a network byte stream
    // (gateway/gateway.ino:51-66), not files — prove the same decode
    // path over Spark's TCP line source. A writer thread keeps
    // re-sending the frame set until the query has caught them (the
    // socket source only sees bytes sent AFTER it connects), so the
    // assertion is on the distinct decoded shapes, not exact counts.
    // The server LOOPS on accept: the socket source may drop and
    // re-dial after a transient error, and a single-accept server
    // would strand the reconnect and burn the whole deadline (flake
    // vector flagged in the r7 advice).
    val server = new java.net.ServerSocket(
      0, 4, java.net.InetAddress.getByName("127.0.0.1"))
    val port = server.getLocalPort
    @volatile var done = false
    val writer = new Thread(() => {
      while (!done) {
        try {
          val sock = server.accept() // serve every (re)connection until done
          val out = new java.io.PrintWriter(
            sock.getOutputStream, true)
          while (!done && !out.checkError()) {
            out.println("""D{"H0001":{"w":32100},"H0002":{"w":28450}}""")
            out.println("""E{"H0001":{"w":32100,"p":1,"s":1}}""")
            out.println("""S{"H1":true}""")
            Thread.sleep(100)
          }
          sock.close()
        } catch { case _: Throwable => // closed under us on cleanup
          if (!done) Thread.sleep(50) // don't spin if accept fails early
        }
      }
    })
    writer.setDaemon(true)
    writer.start()
    val frames = spark.readStream
      .format("socket")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("includeTimestamp", "true")
      .load()
      .select($"value".as("frame"), $"timestamp".as("device_ts"))
    val q = TelemetryPipeline.decode(frames)
      .writeStream.format("memory").queryName("socket_golden")
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def tags(): Set[String] = spark.table("socket_golden")
        .select("tag").distinct().as[String].collect().toSet
      while (tags() != Set("D", "E", "S") && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(tags() == Set("D", "E", "S"),
        "all three frame kinds must decode off the wire")
      val snap = spark.table("socket_golden")
        .select($"tag", $"device_code", $"weight_g").collect()
      // payload survived the wire: a data frame decoded to its reading
      assert(snap.exists(r => r.getString(0) == "D" &&
        r.getString(1) == "H0001" && r.getDouble(2) == 32100.0))
      // zero-weight sentinel nulled at the ingest boundary, as on files
      assert(snap.exists(r => r.getString(0) == "E" && !r.isNullAt(2)))
    } finally {
      q.stop()
      done = true
      server.close()
    }
  }

  test("rate source drives the decode pipeline at a configured throughput") {
    // the load-generator shape for throughput testing: the built-in
    // rate source synthesizes (timestamp, value) rows at a target
    // rows/sec; mapped into telemetry frames it exercises the same
    // decode path as production without any files. At scale this is
    // how the pipeline's ingest ceiling is measured before pointing a
    // real bus (Kafka/kinesis-shaped) at it.
    val rows = spark.readStream
      .format("rate")
      .option("rowsPerSecond", "500")
      .load()
      .select(
        concat(lit("D{\"H"), lpad(($"value" % 4).cast("string"), 4, "0"),
          lit("\":{\"w\":"), ($"value" % 50000).cast("string"),
          lit("}}")).as("frame"),
        $"timestamp".as("device_ts"))
    val q = TelemetryPipeline.decode(rows)
      .writeStream.format("memory").queryName("rate_golden")
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def count(): Long = spark.table("rate_golden").count()
      while (count() < 100 && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(count() >= 100, "rate source should sustain the decode path")
      // snapshot ONCE — the sink keeps growing while we assert
      val decoded = spark.table("rate_golden")
        .select($"tag", $"weight_g").collect()
      assert(decoded.forall(_.getString(0) == "D"))
      assert(decoded.exists(!_.isNullAt(1)))
    } finally q.stop()
  }
}
