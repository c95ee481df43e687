package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB write path: the read-side
  * plans (DPP, pushdown, bucketing) only pay off if the data is laid
  * out to support them, and streaming sinks continuously degrade that
  * layout with small files.
  */
object Layout {

  /** Write a fact table partitioned by the date of `tsCol` — the
    * layout that makes dynamic partition pruning and date-range scans
    * touch only the queried days (ScaleOpsSpec DPP proof reads this
    * layout). Rows are pre-shuffled on the partition value so each
    * task writes few partitions (avoids the many-small-files explosion
    * of one file per task × per day).
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("part_date", to_date(col(tsCol)))
      .repartition(col("part_date"))
      .write.mode("overwrite").partitionBy("part_date").parquet(path)

  /** Retention/TTL: drop hive partitions (`partCol=value` dirs) whose
    * value sorts strictly below `cutoff` — the maintenance job that
    * bounds a date-partitioned fact table's history (ISO dates sort
    * lexicographically, so string compare is date compare). Partition
    * deletes are O(dirs) metadata operations — no data rewrite, the
    * reason retention wants the date-partitioned layout in the first
    * place. Returns the number of partitions dropped.
    */
  def expirePartitions(spark: SparkSession, path: String,
      partCol: String, cutoff: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partCol="
    val doomed = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter(_.getPath.getName.stripPrefix(prefix) < cutoff)
    doomed.foreach(st => fs.delete(st.getPath, true))
    doomed.length
  }

  /** Compact a parquet directory to approximately `targetFileBytes`
    * per file — the maintenance job that undoes streaming-sink
    * small-file accumulation (every micro-batch writes ≥1 file per
    * partition; a day of 1-minute batches is 1440+ files whose open/
    * footer cost dominates scans). Flat layouts rewrite into
    * ceil(bytes/target) files; hive-partitioned layouts (k=v dirs)
    * keep their partition structure and compact to one file per
    * partition directory. Returns the new data-file count.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    // size by DATA bytes only — getContentSummary would count
    // _SUCCESS/metadata/hidden files into the target math
    val files = fs.listFiles(p, true)
    var bytes = 0L
    while (files.hasNext) {
      val f = files.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) bytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // A hive-partitioned layout (k=v subdirectories — e.g.
    // writeDatePartitioned output) must be rewritten WITH partitionBy,
    // or the inferred partition columns become data columns and the
    // DPP directory structure this file exists to support is silently
    // flattened (ADVICE r2). Walk the first child chain to recover the
    // ordered partition-column names.
    def partitionCols(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val sub = fs.listStatus(dir).filter(st =>
        st.isDirectory && st.getPath.getName.contains("="))
      if (sub.isEmpty) Nil
      else sub.head.getPath.getName.split("=", 2)(0) +:
        partitionCols(sub.head.getPath)
    }
    val partCols = partitionCols(p)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    val df = spark.read.parquet(path)
    if (partCols.isEmpty)
      df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    else
      // hash on the partition values co-locates each partition's rows
      // into one task ⇒ one compacted file per partition dir (the
      // writeDatePartitioned write shape); partitionBy preserves the
      // k=v layout
      df.repartition(partCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partCols: _*)
        .parquet(tmp.toString)
    // swap via rename-aside, never delete-before-rename: a crash at
    // any point leaves either the old or the new data at a recoverable
    // path, and rename results are checked (HDFS rename returns false
    // instead of throwing)
    fs.delete(old, true)
    if (!fs.rename(p, old))
      sys.error(s"compact: failed to move $p aside to $old")
    if (!fs.rename(tmp, p)) {
      if (fs.rename(old, p))
        sys.error(s"compact: failed to move $tmp into place at $p; " +
          s"original data restored at $p, compacted copy left at $tmp")
      else
        sys.error(s"compact: failed to move $tmp into place AND the " +
          s"rollback failed — original data is at $old, compacted " +
          s"copy at $tmp; $p is missing and needs manual recovery")
    }
    fs.delete(old, true)
    // report what was actually written (per-partition counts differ
    // from the flat ceil(bytes/target) estimate)
    val written = fs.listFiles(p, true)
    var n = 0
    while (written.hasNext) {
      val name = written.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }
}
