package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Snapshot-isolated commit protocol (VERDICT r17 next #3): readers
  * resolve one manifest and see exactly that snapshot — old or new,
  * never a mix — under concurrent compaction, partition overwrite,
  * TTL, and GC.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-snap-$name-").toString +
      "/tbl"

  test("replace/append/read round-trip with time travel") {
    val root = tmp("rt")
    val v1 = Snapshot.writeReplace(spark,
      (1 to 10).toDF("x"), root)
    assert(v1 == 1L)
    val v2 = Snapshot.append(spark, (11 to 15).toDF("x"), root)
    assert(v2 == 2L)
    assert(Snapshot.read(spark, root).count() == 15)
    assert(Snapshot.readVersion(spark, root, 1).count() == 10)
    assert(Snapshot.read(spark, root).agg(sum("x")).as[Long].head() ==
      (1 to 15).sum)
  }

  test("reader pinned before compaction keeps its snapshot; gc respects retention") {
    val root = tmp("compact")
    Snapshot.writeReplace(spark,
      (1 to 1000).toDF("x").repartition(8), root)
    val m1 = Snapshot.latest(spark, root).get
    assert(m1.files.size >= 8)
    // the pinned reader: file list resolved NOW
    val pinned = Snapshot.readVersion(spark, root, m1.version)
    val nFiles = Snapshot.compact(spark, root, targetFileBytes = 1L << 30)
    assert(nFiles == 1, s"one ~GB target file expected, got $nFiles")
    // gc retaining both versions must not touch the pinned reader
    Snapshot.gc(spark, root, keepVersions = 2)
    assert(pinned.count() == 1000, "pinned snapshot intact after compact+gc")
    assert(Snapshot.read(spark, root).count() == 1000)
    // gc to 1 version reclaims the old files
    val removed = Snapshot.gc(spark, root, keepVersions = 1)
    assert(removed >= 8, s"old snapshot's files reclaimed, got $removed")
    assert(Snapshot.read(spark, root).count() == 1000)
  }

  test("partition overwrite and TTL are metadata commits; old readers unaffected") {
    val root = tmp("parts")
    val df = Seq(("2026-01-01", 1L), ("2026-01-02", 2L), ("2026-01-03", 3L))
      .toDF("day", "v")
    Snapshot.writeReplace(spark, df, root, partCols = Seq("day"))
    val old = Snapshot.read(spark, root)
    // overwrite day=2026-01-02 only
    Snapshot.overwritePartitions(spark,
      Seq(("2026-01-02", 20L)).toDF("day", "v"), root, "day")
    // partition columns come back appended after data columns —
    // select into a fixed order before typing
    val now = Snapshot.read(spark, root).select("day", "v")
      .as[(String, Long)].collect().toMap
    assert(now == Map("2026-01-01" -> 1L, "2026-01-02" -> 20L,
      "2026-01-03" -> 3L), now.toString)
    val oldMap = old.select("day", "v").as[(String, Long)].collect().toMap
    assert(oldMap("2026-01-02") == 2L,
      "pre-overwrite reader still sees the old partition")
    // TTL below 2026-01-02: drops exactly one partition, data files
    // survive until gc (the old reader's contract)
    val dropped = Snapshot.expirePartitions(spark, root, "day", "2026-01-02")
    assert(dropped == 1)
    assert(Snapshot.read(spark, root).count() == 2)
    assert(old.count() == 3, "expire is metadata-only until gc")
  }

  test("concurrent appends serialize via the version claim; nothing lost") {
    val root = tmp("race")
    Snapshot.writeReplace(spark, Seq(0L).toDF("x"), root)
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = (1 to 4).map(i => Future {
      Snapshot.append(spark, Seq(i.toLong).toDF("x"), root)
    })
    val vs = futs.map(Await.result(_, 2.minutes))
    assert(vs.toSet.size == 4, s"distinct versions claimed: $vs")
    assert(Snapshot.read(spark, root).as[Long].collect().toSet ==
      Set(0L, 1L, 2L, 3L, 4L), "every racer's rows present after retries")
  }

  test("racing partition overwrites on DIFFERENT partitions both land") {
    val root = tmp("powrace")
    Snapshot.writeReplace(spark,
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("part", "v"),
      root, partCols = Seq("part"))
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = Seq("a" -> 10L, "c" -> 30L).map { case (p, v) => Future {
      Snapshot.overwritePartitions(spark,
        Seq((p, v)).toDF("part", "v"), root, "part")
    }}
    futs.foreach(Await.result(_, 2.minutes))
    val now = Snapshot.read(spark, root).select("part", "v")
      .as[(String, Long)].collect().toMap
    assert(now == Map("a" -> 10L, "b" -> 2L, "c" -> 30L),
      s"both racers' partitions must land, untouched partition kept: $now")
  }

  test("golden: reader concurrent with compaction sees old or new snapshot, never a mix") {
    val root = tmp("golden")
    // two distinguishable states: state A (all v=1), state B (all v=2);
    // writers alternate full replaces + compactions while readers
    // hammer — every read must be PURE state A or B and full-count
    def state(tag: Long) =
      spark.range(0, 500).select(col("id"), lit(tag).as("v"))
    Snapshot.writeReplace(spark, state(1), root)
    @volatile var stop = false
    @volatile var violation: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && violation.isEmpty) {
        val snap = Snapshot.read(spark, root)
          .agg(count(lit(1)), countDistinct(col("v")))
          .as[(Long, Long)].head()
        if (snap._1 != 500L || snap._2 != 1L)
          violation = Some(s"mixed snapshot read: $snap")
      }
    })
    reader.start()
    for (i <- 2 to 6) {
      Snapshot.writeReplace(spark, state(i.toLong), root)
      Snapshot.compact(spark, root, targetFileBytes = 1L << 30)
      // retention horizon longer than any in-flight read
      Snapshot.gc(spark, root, keepVersions = 4)
    }
    stop = true
    reader.join(120000)
    assert(violation.isEmpty, violation.toString)
    assert(Snapshot.read(spark, root).agg(max("v")).as[Long].head() == 6L)
  }
}
