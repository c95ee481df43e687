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
  * [[decodeAudioFeatures]]). VIDEO decode is REAL for the AVI
  * container (pure-JVM RIFF demux + per-frame decode: MJPEG frames
  * via `javax.imageio`, uncompressed DIB frames via a raw BGR24
  * walk, see [[decodeVideoFeatures]]/[[sampleVideoFrames]]); only
  * NON-AVI video codecs remain a STUB (no general video library
  * ships in this environment) producing a deterministic fake so
  * pipelines exercise end-to-end.
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

  /** STUB frame-sample for NON-AVI payloads: emit every `everyN`-th
    * 4-KiB block of a video payload as a "frame" — one row per
    * sampled frame (flatMap shape: a 2 GB video becomes ~500 frame
    * rows, never one huge row downstream). AVI containers get REAL
    * demux-based sampling via [[sampleVideoFrames]].
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

  // ── Video: REAL AVI (RIFF) demux + frame decode ─────────────────
  //
  // No general video codec ships with the JVM, but the AVI container
  // is a plain RIFF chunk walk and two of its payload conventions are
  // fully decodable with what the JDK provides: MJPEG ('..dc' chunks,
  // each frame an ordinary JPEG javax.imageio reads) and uncompressed
  // DIB ('..db' chunks, raw bottom-up BGR24 rows). decodeVideoFeatures
  // and sampleVideoFrames below are REAL for those; frameSampleStub /
  // decodeFeatures remain the DISCLOSED stubs for every other codec.

  case class VideoFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      us_per_frame: Long,
      n_frames_declared: Long,
      n_frames_found: Long,
      n_frames_decoded: Long,
      frame_bytes: Long,
      luma_fp: Long,
      decode_ok: Boolean)

  /** A demuxed AVI: header fields plus the raw frame payloads in
    * stream order. `compressed` = the chunk id was '..dc' (codec
    * bytes, MJPG here); '..db' frames are raw bottom-up BGR24 DIB
    * bitmaps.
    */
  private[graft] final case class AviVideo(
      width: Int, height: Int, usPerFrame: Long, declaredFrames: Long,
      handler: String, frames: Vector[(Boolean, Array[Byte])])

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an AVI (RIFF) container — a pure-JVM chunk walk reading
    * exactly the structures the feature tier needs: `avih` (dims,
    * frame timing, declared count), the first `vids` `strh` (codec
    * handler), and the `movi` frame chunks. Returns None on ANY
    * structural violation — a corrupt payload must map to
    * decode_ok=false, never a task kill.
    */
  private[graft] def parseAvi(b: Array[Byte]): Option[AviVideo] = {
    try {
      if (b.length < 12 || cc(b, 0) != "RIFF" || cc(b, 8) != "AVI ")
        return None
      var width = -1; var height = -1; var usPf = -1L; var declared = -1L
      var handler = ""
      val frames = Vector.newBuilder[(Boolean, Array[Byte])]
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = cc(b, p)
          val size = u32le(b, p + 4)
          val dataStart = p + 8
          if (size > to - dataStart)
            throw new IllegalArgumentException("chunk overruns container")
          val dataEnd = dataStart + size.toInt
          if (id == "LIST" && size >= 4) {
            // recurse into the lists that hold headers and frames
            val listType = cc(b, dataStart)
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              walk(dataStart + 4, dataEnd)
          } else if (id == "avih" && size >= 40) {
            usPf = u32le(b, dataStart)
            declared = u32le(b, dataStart + 16)
            width = u32le(b, dataStart + 32).toInt
            height = u32le(b, dataStart + 36).toInt
          } else if (id == "strh" && size >= 8 &&
              cc(b, dataStart) == "vids" && handler.isEmpty) {
            handler = cc(b, dataStart + 4)
          } else if (id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            frames += ((id.endsWith("dc"),
              java.util.Arrays.copyOfRange(b, dataStart, dataEnd)))
          }
          p = dataEnd + (size.toInt & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, b.length)
      if (width <= 0 || height <= 0 || usPf < 0) None
      else Some(AviVideo(width, height, usPf, declared, handler,
        frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact Rec.601×1000 luma sum of one raw bottom-up BGR24 DIB frame
    * (rows padded to 4 bytes); -1 when the byte count contradicts the
    * container dims. Row order can't matter for a sum.
    */
  private def dibLuma(frame: Array[Byte], w: Int, h: Int): Long = {
    val stride = ((w * 3) + 3) & ~3
    if (w <= 0 || h <= 0 || frame.length != stride * h) return -1L
    var luma = 0L
    var y = 0
    while (y < h) {
      val row = y * stride
      var x = 0
      while (x < w) {
        val off = row + x * 3
        luma += 299L * (frame(off + 2) & 0xff) +
          587L * (frame(off + 1) & 0xff) + 114L * (frame(off) & 0xff)
        x += 1
      }
      y += 1
    }
    luma
  }

  /** REAL video decode + feature extraction for AVI payloads: demux
    * the container ([[parseAvi]]) and decode every frame —
    * `javax.imageio` for MJPEG ('..dc') frames, the raw BGR24 walk
    * for uncompressed DIB ('..db') frames. Features are the container
    * dims/timing/frame counts plus, per decoded frame, byte totals
    * and (for LOSSLESS DIB streams only) the exact Rec.601×1000 luma
    * sum — lossy JPEG pixel values are decoder-defined, so the
    * contract reports `luma_fp = -1` for compressed streams while
    * still requiring every frame to actually DECODE with dims
    * matching the header (`n_frames_decoded`). Corrupt or non-AVI
    * payloads yield `decode_ok = false` with -1 fields rather than
    * failing the task.
    *
    * Scale shape: mapPartitions, one streaming pass, frames decoded
    * one at a time — a row's cost is its own bytes; nothing is
    * collected.
    */
  def decodeVideoFeatures(ds: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        parseAvi(rec.payload) match {
          case None =>
            VideoFeatures(rec.media_id, rec.kind, -1, -1, -1L, -1L, -1L,
              -1L, -1L, -1L, decode_ok = false)
          case Some(avi) =>
            var decoded = 0L
            var fbytes = 0L
            var luma = 0L
            var lossless = true
            avi.frames.foreach { case (compressedFrame, bytes) =>
              fbytes += bytes.length
              if (compressedFrame) {
                lossless = false
                val img =
                  try javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(bytes))
                  catch { case _: java.io.IOException => null }
                if (img != null && img.getWidth == avi.width &&
                    img.getHeight == avi.height) decoded += 1
              } else {
                val l = dibLuma(bytes, avi.width, avi.height)
                if (l >= 0) { decoded += 1; luma += l }
              }
            }
            VideoFeatures(rec.media_id, rec.kind, avi.width, avi.height,
              avi.usPerFrame, avi.declaredFrames, avi.frames.size.toLong,
              decoded, fbytes, if (lossless) luma else -1L,
              decode_ok = true)
        }
      }
    }
  }

  /** REAL frame sampling for AVI payloads: demux and emit every
    * `everyN`-th frame's payload as its own row (flatMap shape — a
    * long video becomes many small frame rows, never one huge row
    * downstream). Non-AVI / corrupt payloads emit nothing; other
    * container formats go through [[frameSampleStub]] (disclosed
    * stub).
    */
  def sampleVideoFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[Frame] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        parseAvi(rec.payload) match {
          case None => Iterator.empty
          case Some(avi) =>
            avi.frames.iterator.zipWithIndex.collect {
              case ((_, bytes), idx) if idx % everyN == 0 =>
                Frame(rec.media_id, idx, bytes)
            }
        }
      }
    }
  }

  /** Deterministic AVI encoder for fixtures/tests: wraps the given
    * frame payloads in a minimal RIFF/AVI container (avih + one
    * 'vids' stream + movi). `compressed = true` writes '..dc' chunks
    * with handler MJPG (payloads should be JPEGs, e.g. from
    * [[encodeImage]]); `false` writes '..db' chunks with handler
    * "DIB " (payloads should be raw bottom-up BGR24 from
    * [[dibFrame]]). [[decodeVideoFeatures]] must round-trip the
    * container fields exactly, and the pixels exactly for DIB.
    */
  def encodeAvi(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]], compressed: Boolean): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def tag(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      tag(id) ++ le32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, parts: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST", tag(listType) ++ parts.flatten.toArray)

    val handler = if (compressed) "MJPG" else "DIB "
    val n = frames.size.toLong
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(n) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val rate = math.max(1L, 1000000L / math.max(1L, usPerFrame))
    val strh = tag("vids") ++ tag(handler) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(rate) ++
      le32(0) ++ le32(n) ++ le32(0) ++ le32(10000) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val stride = ((w * 3) + 3) & ~3
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le16(1) ++ le16(24) ++
      (if (compressed) tag("MJPG") else le32(0)) ++
      le32(stride.toLong * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f =>
      chunk(if (compressed) "00dc" else "00db", f)))
    val body = tag("AVI ") ++ hdrl ++ movi
    tag("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Raw bottom-up BGR24 DIB frame (rows padded to 4 bytes) from a
    * pixel formula — the uncompressed-AVI twin of [[encodeImage]];
    * lossless, so [[decodeVideoFeatures]] recovers the exact luma.
    */
  def dibFrame(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3) + 3) & ~3
    val a = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val off = (h - 1 - y) * stride + x * 3 // bottom-up row order
        val (r, g, b) = rgb(x, y)
        a(off) = b.toByte; a(off + 1) = g.toByte; a(off + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    a
  }

  /** STUB decode + feature extraction for NON-AVI video payloads (no
    * general video codec ships with the JVM): deterministic byte
    * statistics stand in for frame features. The iterator shape
    * (mapPartitions, streaming over rows, no materialization) is the
    * production pattern and is what the spec tests. For AVI
    * containers use [[decodeVideoFeatures]]/[[sampleVideoFrames]],
    * for images [[decodeImageFeatures]], for audio
    * [[decodeAudioFeatures]] — all real.
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
