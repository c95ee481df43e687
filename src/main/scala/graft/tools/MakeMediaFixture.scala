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

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "fixtures/media"
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(outDir)
    spark.stop()
    // strip Spark's bookkeeping files so only the .parquet is committed
    val dir = new java.io.File(outDir)
    dir.listFiles().foreach { f =>
      if (f.getName.startsWith(".") || f.getName == "_SUCCESS") f.delete()
    }
    println(s"wrote ${rows.size} fixture rows to $outDir")
  }
}
