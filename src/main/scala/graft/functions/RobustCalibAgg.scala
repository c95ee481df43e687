package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** X5 (SURVEY.md §2.10): the one genuine custom aggregate — an
  * outlier-resistant mean for calibration samples, generalizing the
  * reference's N-sample averaging (hx711_calibration/
  * hx711_calibration.ino:23, prototype_1/prototype_1.ino:35) to a
  * min/max-trimmed mean: drop the single lowest and highest sample,
  * average the rest (falls back to the plain mean below 3 samples —
  * trimming would discard everything).
  *
  * Exactly (sum - min - max) / (count - 2) — SQL-expressible on both
  * engines, so the oracle can check the custom-UDAF path.
  *
  * Buffer is 4 numbers regardless of group size (partial-aggregable,
  * merge-associative) — safe at any scale.
  */
object RobustCalibAgg {

  case class Buf(sum: Double, min: Double, max: Double, count: Long)

  // Output is plain Double: groupBy groups always hold ≥1 row, so the
  // empty case can't reach finish().
  //
  // Known bounded risk: `sum` accumulates Double in partition-merge
  // order, so the last ~ulp (≈1e-13 for these magnitudes) is
  // order-dependent vs the oracle's sequential SUM. The oracle rounds
  // to 4 dp, so a mismatch needs a group mean within ~1e-13 of a
  // 0.00005 boundary (~1e-9 per group). A DECIMAL buffer would remove
  // it but introduces per-value cast-rounding divergence instead.
  val aggregator: Aggregator[Double, Buf, Double] =
    new Aggregator[Double, Buf, Double] {
      def zero: Buf = Buf(0.0, Double.PositiveInfinity,
        Double.NegativeInfinity, 0L)
      def reduce(b: Buf, x: Double): Buf =
        Buf(b.sum + x, math.min(b.min, x), math.max(b.max, x), b.count + 1)
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.sum + b.sum, math.min(a.min, b.min),
          math.max(a.max, b.max), a.count + b.count)
      def finish(b: Buf): Double =
        if (b.count < 3) b.sum / b.count
        else (b.sum - b.min - b.max) / (b.count - 2)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form for DataFrame groupBy().agg(...). */
  def robustMean(c: Column): Column = udaf(aggregator).apply(c)
}
