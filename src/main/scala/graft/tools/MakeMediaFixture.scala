package graft.tools

import graft.functions.Multimodal
import org.apache.spark.sql.{SaveMode, SparkSession}

/** One-shot generator for the checked-in media fixture table
  * (`fixtures/media/`), the input of the `ns_multimodal_decode`
  * oracle query and MultimodalSpec's decode golden.
  *
  * 48 images in three families (PNG-grayscale, PNG-RGB, BMP-RGB — all
  * lossless, so decode must recover the exact pixels) with varying
  * dimensions. The truth columns (`true_width/true_height/true_n_px/
  * true_luma_fp`) are computed ARITHMETICALLY from the pixel formula,
  * never from a decoder — so a decoder that fakes features (byte
  * statistics) cannot match them, and the oracle row genuinely proves
  * `javax.imageio` decode correctness.
  *
  * Pixel formulas (shared with MultimodalSpec):
  *   gray family (i % 3 == 0): v = (7x + 13y + 31i) mod 256, R=G=B=v
  *   rgb families (i % 3 != 0): R=(3x+i) G=(5y+i) B=(x+y+i), mod 256
  * luma_fp per pixel = 299R + 587G + 114B (Rec.601 ×1000, exact BIGINT).
  */
object MakeMediaFixture {

  case class FixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_width: Int,
      true_height: Int,
      true_n_px: Long,
      true_luma_fp: Long)

  def grayPx(i: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val v = (7 * x + 13 * y + 31 * i) % 256
    (v, v, v)
  }

  def rgbPx(i: Int)(x: Int, y: Int): (Int, Int, Int) =
    ((3 * x + i) % 256, (5 * y + i) % 256, (x + y + i) % 256)

  def row(i: Int): FixtureRow = {
    val w = 8 + (i % 13)
    val h = 8 + (i % 7)
    val (kind, fmt, px) = i % 3 match {
      case 0 => ("image/png", "png", grayPx(i) _)
      case 1 => ("image/png", "png", rgbPx(i) _)
      case _ => ("image/bmp", "bmp", rgbPx(i) _)
    }
    var luma = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      luma += 299L * r + 587L * g + 114L * b
    }
    FixtureRow(i.toLong, kind, Multimodal.encodeImage(w, h, px, fmt),
      w, h, (w.toLong * h), luma)
  }

  def rows: Seq[FixtureRow] = (0 until 48).map(row)

  // ── Resize fixture family (`fixtures/media_resize`), input of the
  // ns_multimodal_resize oracle row (round 17, VERDICT r16 next #5).
  // CONSTANT-COLOR images: bilinear interpolation weights sum to 1,
  // so ANY correct resize of a constant image is the same constant at
  // every output pixel — making
  //   true_resized_luma_fp = outW · outH · (299R + 587G + 114B)
  // an ANALYTIC pixel truth, independent of Java2D's (implementation-
  // defined) sub-pixel phase and rounding for non-constant content.
  // Sizes span genuine down- AND up-scaling against the 16×12 target;
  // corrupt rows pin the sentinel contract.

  case class ResizeFixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_width: Int,
      true_height: Int,
      true_resized_luma_fp: Long,
      true_ok: Boolean)

  val resizeTargetW = 16
  val resizeTargetH = 12

  def resizeColor(i: Int): (Int, Int, Int) =
    ((17 * i + 11) % 256, (43 * i + 5) % 256, (71 * i + 23) % 256)

  def resizeRow(i: Int): ResizeFixtureRow = {
    val w = 6 + (i * 5) % 37
    val h = 5 + (i * 3) % 29
    val (r, g, b) = resizeColor(i)
    val (kind, fmt) =
      if (i % 2 == 0) ("image/png", "png") else ("image/bmp", "bmp")
    val luma = resizeTargetW.toLong * resizeTargetH *
      (299L * r + 587L * g + 114L * b)
    ResizeFixtureRow(i.toLong, kind,
      Multimodal.encodeImage(w, h, (_, _) => (r, g, b), fmt),
      w, h, luma, true_ok = true)
  }

  def resizeCorruptRow(i: Int): ResizeFixtureRow =
    ResizeFixtureRow(100L + i, "application/octet-stream",
      s"not an image payload $i ${"x" * (40 + i)}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      -1, -1, -1L, true_ok = false)

  def resizeRows: Seq[ResizeFixtureRow] =
    (0 until 20).map(resizeRow) ++ (0 until 4).map(resizeCorruptRow)

  // ── Audio fixture family (`fixtures/audio/`), the input of the
  // `ns_multimodal_audio` oracle query (round-8 upgrade: real
  // javax.sound.sampled decode, same truth-from-formula discipline).
  // 24 clips, WAV (even ids, little-endian) and AIFF (odd ids,
  // big-endian), mono with stereo every 4th row, varying sample rates
  // and lengths. Truth columns are computed ARITHMETICALLY from the
  // sample formula — a decoder faking features from byte statistics
  // cannot match the per-sample energy sum of the decoded PCM.
  //
  // Sample formula (shared with MultimodalSpec):
  //   s(j, i) = ((7i² + 31i + 997j) mod 65536) − 32768   (16-bit signed)

  case class AudioFixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_sample_rate: Int,
      true_channels: Int,
      true_n_frames: Long,
      true_duration_us: Long,
      true_sq_sum: Long,
      true_peak: Int)

  def audioSample(j: Int)(i: Int): Short =
    (((7L * i * i + 31L * i + 997L * j) % 65536L) - 32768L).toShort

  def audioRow(j: Int): AudioFixtureRow = {
    val rates = Array(8000, 11025, 16000, 22050, 44100)
    val rate = rates(j % rates.length)
    val channels = if (j % 4 == 3) 2 else 1
    val nFrames = 800 + 463 * j
    val samples = Array.tabulate(nFrames * channels)(audioSample(j))
    var sqSum = 0L
    var peak = 0
    samples.foreach { s =>
      sqSum += s.toLong * s
      val a = math.abs(s.toInt)
      if (a > peak) peak = a
    }
    val aiff = j % 2 == 1
    AudioFixtureRow(j.toLong, if (aiff) "audio/aiff" else "audio/wav",
      Multimodal.encodeAudio(rate, channels, samples, aiff),
      rate, channels, nFrames.toLong, nFrames.toLong * 1000000L / rate,
      sqSum, peak)
  }

  def audioRows: Seq[AudioFixtureRow] = (0 until 24).map(audioRow)

  // ── Video fixture family (`fixtures/video/`), the input of the
  // `ns_multimodal_video` oracle query (round-13 upgrade: real AVI
  // demux + frame decode, same truth-from-formula discipline).
  // 18 AVIs: ids with i % 3 == 1 are MJPEG (each frame a JPEG from
  // Multimodal.encodeImage), the rest uncompressed DIB (raw BGR24);
  // plus 2 corrupt rows (truncated container, garbage bytes). Truth
  // columns are computed ARITHMETICALLY from the frame formula and
  // the encoder inputs — pixel luma truth only for the LOSSLESS DIB
  // family (lossy JPEG pixel values are decoder-defined; those rows
  // pin true_luma_fp = -1, the feature contract's sentinel), while
  // MJPEG rows still require every frame to DECODE with dims matching
  // the header (true_n_frames_decoded).
  //
  // Frame pixel formula (shared with MultimodalSpec):
  //   R=(3x+5f+i) G=(5y+7f+i) B=(x+y+11f+i), mod 256  (f = frame idx)

  case class VideoFixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_width: Int,
      true_height: Int,
      true_us_per_frame: Long,
      true_n_frames: Long,
      true_n_frames_decoded: Long,
      true_frame_bytes: Long,
      true_luma_fp: Long,
      true_ok: Boolean)

  def videoPx(i: Int, f: Int)(x: Int, y: Int): (Int, Int, Int) =
    ((3 * x + 5 * f + i) % 256, (5 * y + 7 * f + i) % 256,
      (x + y + 11 * f + i) % 256)

  def videoRow(i: Int): VideoFixtureRow = {
    val w = 8 + (i % 5) * 3 // not a multiple of 4: exercises DIB row padding
    val h = 6 + (i % 4) * 2
    val n = 2 + (i % 4)
    val usPf = 40000L + 1000L * i
    val mjpg = i % 3 == 1
    val frames: Seq[Array[Byte]] =
      if (mjpg) (0 until n).map(f =>
        Multimodal.encodeImage(w, h, videoPx(i, f), "jpg"))
      else (0 until n).map(f => Multimodal.dibFrame(w, h, videoPx(i, f)))
    var luma = -1L
    if (!mjpg) {
      luma = 0L
      for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = videoPx(i, f)(x, y)
        luma += 299L * r + 587L * g + 114L * b
      }
    }
    VideoFixtureRow(i.toLong,
      if (mjpg) "video/avi-mjpeg" else "video/avi-dib",
      Multimodal.encodeAvi(w, h, usPf, frames, compressed = mjpg),
      w, h, usPf, n.toLong, n.toLong,
      frames.map(_.length.toLong).sum, luma, true_ok = true)
  }

  def videoRows: Seq[VideoFixtureRow] = {
    val good = (0 until 18).map(videoRow)
    // corrupt rows: a truncated container and plain garbage — truth is
    // the decode_ok=false sentinel row (never a task kill)
    val truncated = good.head.payload.take(40)
    val garbage = Array.tabulate(512)(j => ((j * 37 + 11) % 256).toByte)
    val bad = Seq((18L, truncated), (19L, garbage)).map { case (id, p) =>
      VideoFixtureRow(id, "video/avi-corrupt", p,
        -1, -1, -1L, -1L, -1L, -1L, -1L, true_ok = false)
    }
    good ++ bad
  }

  // ── MP4 fixture family (`fixtures/video_mp4/`), the input of the
  // `ns_multimodal_video_mp4` oracle query (round-14: real ISO BMFF
  // demux). Payloads are minimal MP4 containers from
  // Multimodal.encodeMp4 holding deterministic synthetic access
  // units — the demux NEVER interprets codec bytes, so synthetic AUs
  // prove exactly what a demuxer proves: dims, timing, sample
  // count/sizes, and byte-exact sample extraction (true_au_sha =
  // sha256 of the in-order AU concatenation, computed ARITHMETICALLY
  // from the encoder inputs; the Spark side must demux and extract
  // the samples to reproduce it). Pixel decode of mp4 codecs is the
  // disclosed gap (no JVM H.264 decoder) — there is no pixel truth
  // column, by design. Plus 2 corrupt rows (truncated container,
  // garbage) pinning the never-kill-the-task sentinel contract.

  case class Mp4FixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_width: Int,
      true_height: Int,
      true_us_per_frame: Long,
      true_n_frames: Long,
      true_n_frames_decoded: Long,
      true_frame_bytes: Long,
      true_au_sha: String,
      true_ok: Boolean)

  def mp4Sample(i: Int, f: Int): Array[Byte] =
    Array.tabulate(90 + (i * 13 + f * 7) % 120)(j =>
      ((j * 31 + f * 17 + i * 5 + 3) % 256).toByte)

  private def mp4RowFrom(id: Long, kind: String, codec: String, w: Int,
      h: Int, usPf: Long, samples: Seq[Array[Byte]],
      decoded: Long): Mp4FixtureRow = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(samples.flatten.toArray)
      .map(b => f"${b & 0xff}%02x").mkString
    Mp4FixtureRow(id, kind,
      Multimodal.encodeMp4(w, h, usPf, samples, codec),
      w, h, usPf, samples.size.toLong, decoded,
      samples.map(_.length.toLong).sum, sha, true_ok = true)
  }

  def mp4Row(i: Int): Mp4FixtureRow = {
    val w = 16 + (i % 7) * 5
    val h = 12 + (i % 5) * 4
    val n = 3 + (i % 5)
    val usPf = 33333L + 111L * i
    // synthetic access units — avc1 rows prove demux only
    // (true_n_frames_decoded = 0: H.264 pixel decode is the
    // disclosed env-blocked gap)
    mp4RowFrom(i.toLong, "video/mp4-avc1", "avc1", w, h, usPf,
      (0 until n).map(f => mp4Sample(i, f)), decoded = 0L)
  }

  /** Photo-JPEG-in-MP4 rows (round 15): samples are REAL JPEGs (the
    * image fixture's pixel formulas), so the Spark side must demux
    * AND pixel-decode every sample — true_n_frames_decoded = n.
    * luma truth stays out by design (lossy pixel values are
    * decoder-defined, as in the AVI MJPG family).
    */
  def mp4JpegRow(id: Long, i: Int): Mp4FixtureRow = {
    val w = 32 + (i % 5) * 8
    val h = 24 + (i % 3) * 8
    val n = 2 + (i % 4)
    val usPf = 40000L + 97L * i
    val samples = (0 until n).map(f =>
      Multimodal.encodeImage(w, h, rgbPx(i * 7 + f) _, "jpg"))
    mp4RowFrom(id, "video/mp4-jpeg", "jpeg", w, h, usPf, samples,
      decoded = n.toLong)
  }

  def mp4Rows: Seq[Mp4FixtureRow] = {
    val good = (0 until 14).map(mp4Row)
    val truncated = good.head.payload.take(60)
    val garbage = Array.tabulate(400)(j => ((j * 41 + 7) % 256).toByte)
    val bad = Seq((14L, truncated), (15L, garbage)).map { case (id, p) =>
      Mp4FixtureRow(id, "video/mp4-corrupt", p,
        -1, -1, -1L, -1L, -1L, -1L, "", true_ok = false)
    }
    val jpeg = (0 until 6).map(i => mp4JpegRow(16L + i, i))
    good ++ bad ++ jpeg
  }

  // ── MP4 audio fixture family (`fixtures/audio_mp4/`), the input of
  // the `ns_multimodal_audio_mp4` oracle query (round-16, VERDICT r15
  // missing #4: a multimodal corpus is mostly MP4/AAC — the audio
  // tier must read the container the corpus has, not only WAV).
  // Truth columns mirror the WAV contract shape exactly. 12 PCM rows
  // ('sowt' little-endian on even ids, 'twos' big-endian on odd —
  // the QuickTime PCM fourccs, fully decodable pure-JVM, so the
  // truth is the EXACT per-sample energy/peak from the same
  // audioSample formula as the WAV family), 2 AAC rows (synthetic
  // mp4a packets — no JVM decoder, so truth is the demux level:
  // header rate/channels, packet count, stts duration, energy
  // sentinels -1), and 2 corrupt rows (full -1 sentinel).

  case class AudioMp4FixtureRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      true_sample_rate: Int,
      true_channels: Int,
      true_n_frames: Long,
      true_duration_us: Long,
      true_sq_sum: Long,
      true_peak: Int,
      true_ok: Boolean)

  def audioMp4Row(j: Int): AudioMp4FixtureRow = {
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    val rate = rates(j % rates.length)
    val channels = if (j % 3 == 2) 2 else 1
    val nFrames = 600 + 331 * j
    val shorts = Array.tabulate(nFrames * channels)(audioSample(100 + j))
    var sqSum = 0L
    var peak = 0
    shorts.foreach { s =>
      sqSum += s.toLong * s
      val a = math.abs(s.toInt)
      if (a > peak) peak = a
    }
    val big = j % 2 == 1 // 'twos' big-endian; 'sowt' little-endian
    val frames: Seq[Array[Byte]] = (0 until nFrames).map { f =>
      val a = new Array[Byte](2 * channels)
      var c = 0
      while (c < channels) {
        val s = shorts(f * channels + c)
        if (big) { a(2 * c) = (s >> 8).toByte; a(2 * c + 1) = s.toByte }
        else { a(2 * c) = s.toByte; a(2 * c + 1) = (s >> 8).toByte }
        c += 1
      }
      a
    }
    AudioMp4FixtureRow(j.toLong,
      if (big) "audio/mp4-twos" else "audio/mp4-sowt",
      Multimodal.encodeMp4Audio(rate, channels, 16,
        if (big) "twos" else "sowt", frames, sttsDelta = 1L,
        timescale = rate.toLong, samplesPerChunk = 256),
      rate, channels, nFrames.toLong, nFrames.toLong * 1000000L / rate,
      sqSum, peak, true_ok = true)
  }

  /** Synthetic AAC packet — the demux never interprets codec bytes
    * (same discipline as [[mp4Sample]] for video access units). */
  def aacPacket(j: Int, p: Int): Array[Byte] =
    Array.tabulate(60 + (j * 11 + p * 5) % 90)(i =>
      ((i * 29 + p * 13 + j * 7 + 1) % 256).toByte)

  def audioMp4AacRow(id: Long, j: Int): AudioMp4FixtureRow = {
    val rate = if (j % 2 == 0) 44100 else 48000
    val channels = 2
    val nPackets = 20 + 7 * j
    val packets = (0 until nPackets).map(p => aacPacket(j, p))
    AudioMp4FixtureRow(id, "audio/mp4-aac",
      Multimodal.encodeMp4Audio(rate, channels, 16, "mp4a", packets,
        sttsDelta = 1024L, timescale = rate.toLong, samplesPerChunk = 16),
      rate, channels, nPackets.toLong,
      nPackets.toLong * 1024L * 1000000L / rate,
      -1L, -1, true_ok = false)
  }

  /** ITU-T G.711 compressors (µ-law / A-law, the published
    * reference algorithm) — the ENCODE half lives only in this
    * fixture generator; the engine only ever decodes.
    */
  def g711Encode(alaw: Boolean, sIn: Short): Byte = {
    var pcm = sIn.toInt
    val neg = pcm < 0
    if (neg) pcm = -pcm
    if (pcm > 32635) pcm = 32635
    if (!alaw) {
      pcm += 0x84 // µ-law bias
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
      val man = (pcm >> (exp + 3)) & 0x0f
      (~((if (neg) 0x80 else 0) | (exp << 4) | man)).toByte
    } else {
      var exp = 7
      var mask = 0x4000
      while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
      val man =
        if (exp == 0) (pcm >> 4) & 0x0f
        else (pcm >> (exp + 3)) & 0x0f
      (((if (neg) 0 else 0x80) | (exp << 4) | man) ^ 0x55).toByte
    }
  }

  /** G.711 rows (round 18): `ulaw`/`alaw` QuickTime sample entries,
    * REAL-decoded through the seam's built-in [[graft.functions
    * .G711PacketDecoder]]. Truth = the ITU expansion of the exact
    * bytes the payload carries (decode ∘ encode is the quantized
    * sample — the same truth-from-payload discipline as the PCM
    * rows; the expansion tables themselves are pinned to published
    * spec vectors in MultimodalSpec, independent of this generator).
    */
  def audioMp4G711Row(id: Long, j: Int): AudioMp4FixtureRow = {
    val alaw = j % 2 == 1
    val codec = if (alaw) "alaw" else "ulaw"
    val rate = if (j % 2 == 0) 8000 else 16000
    val channels = if (j >= 2) 2 else 1
    val nFrames = 500 + 137 * j
    val shorts = Array.tabulate(nFrames * channels)(audioSample(200 + j))
    val bytes = shorts.map(g711Encode(alaw, _))
    val decoded = graft.functions.G711PacketDecoder
      .decodePacket(codec, bytes, channels, rate).get
    var sqSum = 0L
    var peak = 0
    decoded.foreach { s =>
      sqSum += s.toLong * s
      val a = math.abs(s.toInt)
      if (a > peak) peak = a
    }
    val frames: Seq[Array[Byte]] = (0 until nFrames).map(f =>
      java.util.Arrays.copyOfRange(bytes, f * channels, (f + 1) * channels))
    AudioMp4FixtureRow(id, s"audio/mp4-$codec",
      Multimodal.encodeMp4Audio(rate, channels, 8, codec, frames,
        sttsDelta = 1L, timescale = rate.toLong, samplesPerChunk = 128),
      rate, channels, nFrames.toLong, nFrames.toLong * 1000000L / rate,
      sqSum, peak, true_ok = true)
  }

  def audioMp4Rows: Seq[AudioMp4FixtureRow] = {
    val pcm = (0 until 12).map(audioMp4Row)
    val aac = (0 until 2).map(j => audioMp4AacRow(12L + j, j))
    val truncated = pcm.head.payload.take(50)
    val garbage = Array.tabulate(300)(j => ((j * 43 + 19) % 256).toByte)
    val bad = Seq((14L, truncated), (15L, garbage)).map { case (id, p) =>
      AudioMp4FixtureRow(id, "audio/mp4-corrupt", p,
        -1, -1, -1L, -1L, -1L, -1, true_ok = false)
    }
    val g711 = (0 until 4).map(j => audioMp4G711Row(16L + j, j))
    pcm ++ aac ++ bad ++ g711
  }

  private def stripBookkeeping(outDir: String): Unit = {
    // strip Spark's bookkeeping files so only the .parquet is committed
    val dir = new java.io.File(outDir)
    dir.listFiles().foreach { f =>
      if (f.getName.startsWith(".") || f.getName == "_SUCCESS") f.delete()
    }
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "fixtures"
    val mediaDir = s"$base/media"
    val audioDir = s"$base/audio"
    val videoDir = s"$base/video"
    val mp4Dir = s"$base/video_mp4"
    val audioMp4Dir = s"$base/audio_mp4"
    val resizeDir = s"$base/media_resize"
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(mediaDir)
    audioRows.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(audioDir)
    videoRows.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(videoDir)
    mp4Rows.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(mp4Dir)
    audioMp4Rows.toDF().coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(audioMp4Dir)
    resizeRows.toDF().coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(resizeDir)
    spark.stop()
    stripBookkeeping(mediaDir)
    stripBookkeeping(audioDir)
    stripBookkeeping(videoDir)
    stripBookkeeping(mp4Dir)
    stripBookkeeping(audioMp4Dir)
    stripBookkeeping(resizeDir)
    println(s"wrote ${rows.size} image rows to $mediaDir, " +
      s"${audioRows.size} audio rows to $audioDir, " +
      s"${videoRows.size} video rows to $videoDir, " +
      s"${mp4Rows.size} mp4 rows to $mp4Dir, " +
      s"${audioMp4Rows.size} mp4-audio rows to $audioMp4Dir, " +
      s"${resizeRows.size} resize rows to $resizeDir")
  }
}
