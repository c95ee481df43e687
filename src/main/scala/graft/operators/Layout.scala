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

  /** Compact a parquet directory to approximately `targetFileBytes`
    * per file — the maintenance job that undoes streaming-sink
    * small-file accumulation (every micro-batch writes ≥1 file per
    * partition; a day of 1-minute batches is 1440+ files whose open/
    * footer cost dominates scans). Rewrites into ceil(bytes/target)
    * files; returns the new file count.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
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
    nFiles
  }
}
