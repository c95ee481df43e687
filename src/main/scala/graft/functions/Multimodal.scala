package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md NS multimodal; builder
  * prompt): image/audio/video travel as opaque `binary` columns with a
  * typed metadata struct. The Spark-side machinery — schema,
  * partition-friendly batch iteration, deterministic outputs — is
  * real and tested. IMAGE decode is REAL (`javax.imageio`, in the
  * JDK: PNG/BMP/GIF/JPEG → width/height/exact fixed-point luma sum,
  * see [[decodeImageFeatures]]). AUDIO decode is REAL
  * (`javax.sound.sampled`, also in the JDK: WAV/AIFF/AU 16-bit PCM →
  * sample rate / frames / duration / exact energy sum, see
  * [[decodeAudioFeatures]]). Only the VIDEO codec call remains a STUB
  * (no video libraries ship in this environment) producing a
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

  /** Real image decode + feature extraction over opaque binary
    * payloads: `javax.imageio.ImageIO` (ships in the JDK — PNG, BMP,
    * GIF, JPEG) decodes each payload to pixels; features are the
    * decoded dimensions plus an EXACT fixed-point luminance sum
    * `Σ_pixels (299·R + 587·G + 114·B)` (Rec.601 weights ×1000, pure
    * BIGINT — order-independent and cross-engine hashable, per the
    * repo's no-float-aggregation parity rule). Undecodable payloads
    * (corrupt bytes, audio/video kinds) yield `decode_ok = false`
    * with -1 dims rather than failing the task — at 100 TB a corrupt
    * row must never kill a 10⁶-row partition.
    *
    * Scale shape: mapPartitions (one iterator pass, no
    * materialization); decode is CPU-bound per row, so parallelism =
    * input partitions — repartition by byte budget upstream
    * (maxPartitionBytes) for even work.
    */
  def decodeImageFeatures(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          catch { case _: java.io.IOException => null }
        if (img == null)
          ImageFeatures(rec.media_id, rec.kind, -1, -1, 0L, 0L, decode_ok = false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          // one bulk getRGB: converts any source model (palette, gray,
          // 24-bit BGR) to packed sRGB ints — exact for lossless formats
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var luma = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            luma += 299L * ((p >> 16) & 0xff) +
              587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
            i += 1
          }
          ImageFeatures(rec.media_id, rec.kind, w, h, px.length.toLong,
            luma, decode_ok = true)
        }
      }
    }
  }

  case class ImageFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_px: Long,
      luma_fp: Long,
      decode_ok: Boolean)

  /** Deterministic image encoder for fixtures/tests: pixel (x,y) gets
    * the RGB triple `rgb(x, y)`; `format` is an ImageIO writer name
    * ("png", "bmp", "gif", "jpg"). Lossless formats round-trip the
    * exact pixels through [[decodeImageFeatures]].
    */
  def encodeImage(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
      format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  case class AudioFeatures(
      media_id: Long,
      kind: String,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_us: Long,
      sq_sum: Long,
      peak: Int,
      decode_ok: Boolean)

  /** Real audio decode + feature extraction over opaque binary
    * payloads: `javax.sound.sampled.AudioSystem` (ships in the JDK —
    * WAV, AIFF, AU containers) parses the header and streams PCM
    * frames. Features are the container-declared sample rate / channel
    * count plus, from the decoded samples themselves: frame count,
    * integer microsecond duration `n_frames·10⁶ / rate`, the EXACT
    * energy sum `Σ s²` over all channel samples, and the peak
    * amplitude `max |s|` — all pure BIGINT/INT (order-independent and
    * cross-engine hashable, per the repo's no-float-aggregation parity
    * rule; RMS = sqrt(sq_sum / n) is one float away for callers).
    *
    * Supports signed 16-bit PCM (either endianness, any channel
    * count) — the universal interchange format WAV/AIFF default to.
    * Other encodings (u-law, float PCM, 8/24-bit) and corrupt or
    * non-audio payloads yield `decode_ok = false` with -1 fields
    * rather than failing the task — at 100 TB a corrupt row must
    * never kill a 10⁶-row partition.
    *
    * Scale shape: mapPartitions, one streaming pass per payload, no
    * materialization beyond the row's own bytes.
    */
  def decodeAudioFeatures(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val bad = AudioFeatures(rec.media_id, rec.kind, -1, -1, -1L, -1L,
          -1L, -1, decode_ok = false)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          try {
            val fmt = ais.getFormat
            // rate/channels > 0 guards a corrupt-yet-parseable header
            // (sampleRate=0 or channels=0) from reaching the divisions
            // below — such payloads must yield decode_ok=false, not an
            // ArithmeticException that kills the task
            val is16BitPcm =
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16 &&
                fmt.getChannels > 0 && fmt.getSampleRate > 0f
            if (!is16BitPcm) bad
            else {
              val channels = fmt.getChannels
              val rate = math.round(fmt.getSampleRate)
              val pcm = ais.readAllBytes()
              val nSamples = pcm.length / 2
              val nFrames = nSamples.toLong / channels
              var sqSum = 0L
              var peak = 0
              var i = 0
              val big = fmt.isBigEndian
              while (i + 1 < pcm.length) {
                val s =
                  if (big) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort.toInt
                  else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort.toInt
                sqSum += s.toLong * s
                val a = math.abs(s)
                if (a > peak) peak = a
                i += 2
              }
              AudioFeatures(rec.media_id, rec.kind, rate, channels, nFrames,
                nFrames * 1000000L / rate, sqSum, peak, decode_ok = true)
            }
          } finally ais.close()
        } catch {
          // the expected cases are named; NonFatal backstops any other
          // parser edge case — the contract is that a corrupt row
          // never kills the partition
          case _: javax.sound.sampled.UnsupportedAudioFileException => bad
          case _: java.io.IOException => bad
          case scala.util.control.NonFatal(_) => bad
        }
      }
    }
  }

  /** Deterministic audio encoder for fixtures/tests: signed 16-bit PCM
    * samples (interleaved when `channels > 1`) wrapped in a WAV or
    * AIFF container via `AudioSystem.write`. PCM is lossless, so
    * [[decodeAudioFeatures]] must round-trip the exact samples.
    */
  def encodeAudio(sampleRate: Int, channels: Int, samples: Array[Short],
      aiff: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    // WAV is little-endian by convention, AIFF big-endian
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /*signed=*/ true, /*bigEndian=*/ aiff)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (aiff) { pcm(2 * i) = (s >> 8).toByte; pcm(2 * i + 1) = s.toByte }
      else { pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais,
      if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** STUB decode + feature extraction for VIDEO payloads (no video
    * codec libraries in this environment): deterministic byte
    * statistics stand in for frame features. The iterator shape
    * (mapPartitions, streaming over rows, no materialization) is the
    * production pattern and is what the spec tests. For images use
    * [[decodeImageFeatures]] and for audio [[decodeAudioFeatures]] —
    * both real.
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
