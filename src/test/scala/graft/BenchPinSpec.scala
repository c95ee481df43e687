package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Canonical-capture pinning (VERDICT r16 #3): the pin must bind a
  * capture to an EXACT source tree and sf — any drift (file edited,
  * different sf, contended capture, malformed file) must fall back to
  * the live run. No SparkSession needed: these are pure file/JSON
  * helpers.
  */
class BenchPinSpec extends AnyFunSuite {

  private def tmpDir(): Path = Files.createTempDirectory("benchpin")

  private def write(p: Path, s: String): Path = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, s)
    p
  }

  test("treeFingerprint: deterministic, content-sensitive, cwd-stable") {
    val d1 = tmpDir()
    write(d1.resolve("src/main/scala/A.scala"), "object A")
    write(d1.resolve("src/main/scala/sub/B.scala"), "object B")
    val bs1 = write(d1.resolve("build.sbt"), "name := \"x\"")
    val fp1 = Bench.treeFingerprint(d1.resolve("src/main"), bs1)
    val fp1b = Bench.treeFingerprint(d1.resolve("src/main"), bs1)
    assert(fp1.nonEmpty && fp1 == fp1b)

    // identical tree rooted elsewhere → same fingerprint (the driver
    // and the pinning dev run may use different absolute paths)
    val d2 = tmpDir()
    write(d2.resolve("src/main/scala/A.scala"), "object A")
    write(d2.resolve("src/main/scala/sub/B.scala"), "object B")
    val bs2 = write(d2.resolve("build.sbt"), "name := \"x\"")
    assert(Bench.treeFingerprint(d2.resolve("src/main"), bs2) == fp1)

    // one changed byte → different fingerprint
    write(d2.resolve("src/main/scala/A.scala"), "object A2")
    assert(Bench.treeFingerprint(d2.resolve("src/main"), bs2) != fp1)

    // missing tree → pinning disabled
    assert(Bench.treeFingerprint(d1.resolve("no/such"), bs1) == "")
  }

  test("readPinned: accepts only same-sf quiet captures of this tree") {
    val d = tmpDir()
    def pin(fp: String, sf: String, contended: Boolean): Path =
      write(d.resolve("BENCH_PINNED.json"),
        s"""{"metric":"total","value":41.59,"contended":$contended,
           |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"$fp",
           |"sf":"$sf"}""".stripMargin)

    val p = pin("fp1", "/data/sf0.1", contended = false)
    val ok = Bench.readPinned(p, "/data/sf0.1", "fp1")
    assert(ok.exists(r => r.value == 41.59 && !r.contended &&
      r.sha256.length == 64 && r.loadavgStart == "0.5 0.4 0.3"))

    // wrong tree, wrong sf, contended, missing, malformed → None
    assert(Bench.readPinned(p, "/data/sf0.1", "fp2").isEmpty)
    assert(Bench.readPinned(p, "/data/sf1", "fp1").isEmpty)
    assert(Bench.readPinned(pin("fp1", "/data/sf0.1", contended = true),
      "/data/sf0.1", "fp1").isEmpty)
    assert(Bench.readPinned(d.resolve("nope.json"), "/data/sf0.1", "fp1").isEmpty)
    assert(Bench.readPinned(write(d.resolve("BENCH_PINNED.json"), "{oops"),
      "/data/sf0.1", "fp1").isEmpty)
  }

  test("readPinned: env fingerprint gates acceptance; quiet capture list parsed") {
    val d = tmpDir()
    val p = write(d.resolve("BENCH_PINNED.json"),
      """{"metric":"total","value":41.59,"contended":false,
        |"quiet_values_sec":[41.59,43.2,42.0],
        |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"fp1",
        |"env_fingerprint":"env1","sf":"/data/sf0.1"}""".stripMargin)
    // matching env → accepted, mom basis carried
    val ok = Bench.readPinned(p, "/data/sf0.1", "fp1", "env1")
    assert(ok.exists(_.quietValues == Seq(41.59, 43.2, 42.0)))
    // env drift (different cpus/confs/JVM/dataset) → no pin
    assert(Bench.readPinned(p, "/data/sf0.1", "fp1", "env2").isEmpty)
    // empty envFp (legacy caller) skips the env check
    assert(Bench.readPinned(p, "/data/sf0.1", "fp1", "").isDefined)
    // a pin WITHOUT env_fingerprint is rejected by env-aware readers
    val legacy = write(d.resolve("BENCH_PINNED.json"),
      """{"metric":"total","value":41.59,"contended":false,
        |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"fp1",
        |"sf":"/data/sf0.1"}""".stripMargin)
    assert(Bench.readPinned(legacy, "/data/sf0.1", "fp1", "env1").isEmpty)
    // legacy pin without the list falls back to its own value as basis
    assert(Bench.readPinned(legacy, "/data/sf0.1", "fp1", "")
      .exists(_.quietValues == Seq(41.59)))
  }

  test("pinWritable: same-tree foreign-env/sf pins are protected (VERDICT r20 #4)") {
    val d = tmpDir()
    val p = write(d.resolve("BENCH_PINNED.json"),
      """{"metric":"total","value":41.59,"contended":false,
        |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"fp1",
        |"env_fingerprint":"env32","sf":"/data/sf0.1"}""".stripMargin)
    // same tree + same env + same sf → a better quiet capture may replace
    assert(Bench.pinWritable(p, "/data/sf0.1", "env32", "fp1"))
    // same tree, DIFFERENT env (the driver's c8 scaling pass) → protected
    assert(!Bench.pinWritable(p, "/data/sf0.1", "env8", "fp1"))
    // same tree, different sf (trend run) → protected
    assert(!Bench.pinWritable(p, "/data/sf1", "env32", "fp1"))
    // STALE tree → replaceable by any env (the old pin guards nothing)
    assert(Bench.pinWritable(p, "/data/sf0.1", "env8", "fp2"))
    // missing / malformed file → nothing to protect
    assert(Bench.pinWritable(d.resolve("nope.json"), "/data/sf0.1", "e", "f"))
    assert(Bench.pinWritable(write(d.resolve("BENCH_PINNED.json"), "{oops"),
      "/data/sf0.1", "e", "f"))
  }

  test("cpu calibration gates pin COMPARABILITY, not acceptance (VERDICT r18 #7)") {
    // the env fingerprint passed across a 20-25% host-speed shift in
    // r18 — the calibration number is the in-band signal that flags
    // such cross-shift comparisons without rejecting the pin
    val d = tmpDir()
    val p = write(d.resolve("BENCH_PINNED.json"),
      """{"metric":"total","value":41.59,"contended":false,
        |"cpu_calib_mops":250.0,
        |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"fp1",
        |"env_fingerprint":"env1","sf":"/data/sf0.1"}""".stripMargin)
    val pin = Bench.readPinned(p, "/data/sf0.1", "fp1", "env1")
    // the calibration rides in the parsed pin...
    assert(pin.exists(_.cpuCalib == 250.0))
    // ...and STILL parses (acceptance untouched) when hosts differ
    assert(pin.isDefined)
    // comparability: within 10% → true; a 20-25% shift → self-flag
    assert(Bench.calibComparable(live = 245.0, pinned = 250.0))
    assert(Bench.calibComparable(live = 270.0, pinned = 250.0))
    assert(!Bench.calibComparable(live = 195.0, pinned = 250.0)) // -22%
    assert(!Bench.calibComparable(live = 320.0, pinned = 250.0)) // +28%
    // legacy pin without the field: comparable-by-default (unknown)
    assert(Bench.calibComparable(live = 245.0, pinned = Double.NaN))
    val legacy = write(d.resolve("BENCH_PINNED.json"),
      """{"metric":"total","value":41.59,"contended":false,
        |"loadavg_start":"0.5 0.4 0.3","tree_fingerprint":"fp1",
        |"sf":"/data/sf0.1"}""".stripMargin)
    assert(Bench.readPinned(legacy, "/data/sf0.1", "fp1", "")
      .exists(_.cpuCalib.isNaN))
    // the burn itself returns something positive and finite
    val c = Bench.cpuCalibration()
    assert(c > 0 && c < 1e6, s"calibration $c")
  }
}
