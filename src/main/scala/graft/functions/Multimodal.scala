package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md NS multimodal; builder
  * prompt): image/audio/video travel as opaque `binary` columns with a
  * typed metadata struct. The Spark-side machinery — schema,
  * partition-friendly batch iteration, deterministic outputs — is
  * real and tested; the codec calls themselves are STUBS (no
  * image/audio libraries ship in this environment) that produce a
  * deterministic fake so pipelines exercise end-to-end.
  *
  * At 100 TB: media rows are large — keep them in their own column
  * family (parquet binary column), repartition by byte-size budget
  * before decode (maxPartitionBytes), and never collect. Decode is
  * mapPartitions (one iterator pass, no per-row task overhead).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // STUB features — deterministic byte statistics standing in for
      // real decode (mean pixel value / audio RMS / frame count).
      mean_byte: Double,
      byte_hist4: Array[Long],
      frames_sampled: Int)

  /** Attach metadata columns to an opaque binary payload column —
    * pure expressions, no decode needed (always real, even at 100 TB).
    */
  def withMetadata(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("sha", sha2(col(payloadCol), 256))

  case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: byte-subsample the payload to a target "resolution"
    * (every k-th byte, k = ceil(len / (w*h))) — deterministic stand-in
    * for an image resize kernel; the mapPartitions shape, the
    * (payload, dims) schema, and the size contract are the production
    * pattern.
    */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val target = math.max(1, w * h)
        val bytes = rec.payload
        val out =
          if (bytes.length <= target) bytes
          else {
            val step = math.ceil(bytes.length.toDouble / target).toInt
            bytes.indices.collect { case i if i % step == 0 => bytes(i) }.toArray
          }
        ResizedMedia(rec.media_id, rec.kind, w, h, out)
      }
    }
  }

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame-sample: emit every `everyN`-th 4-KiB block of a video
    * payload as a "frame" — one row per sampled frame (flatMap shape:
    * a 2 GB video becomes ~500 frame rows, never one huge row
    * downstream).
    */
  def frameSampleStub(ds: Dataset[MediaRecord], everyN: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    val block = 4096
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val nBlocks = math.max(1, rec.payload.length / block)
        (0 until nBlocks by math.max(1, everyN)).iterator.map { b =>
          val from = b * block
          val until = math.min(rec.payload.length, from + block)
          Frame(rec.media_id, b, java.util.Arrays.copyOfRange(
            rec.payload, from, math.max(from, until)))
        }
      }
    }
  }

  /** STUB decode + feature extraction. A real deployment swaps the
    * body for an image/audio codec; the iterator shape (mapPartitions,
    * streaming over rows, no materialization) is the production
    * pattern and is what the spec tests.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val bytes = rec.payload
        val hist = new Array[Long](4)
        var sum = 0L
        bytes.foreach { b =>
          val u = b & 0xff
          sum += u
          hist(u / 64) += 1
        }
        val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        // STUB: "frame sampling" = one fake frame per 4 KiB of payload.
        val frames = math.max(1, bytes.length / 4096)
        MediaFeatures(rec.media_id, rec.kind, bytes.length.toLong,
          mean, hist, frames)
      }
    }
  }
}
