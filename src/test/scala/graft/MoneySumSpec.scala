package graft

import graft.plans.MoneySum.sumDec128
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen

/** The 128-bit unscaled money sum must be VALUE-IDENTICAL to Spark's
  * built-in decimal Sum in every position the query layer uses it:
  * group aggregate, window frame, nulls, empty input, negatives, and
  * magnitudes that overflow the low 64-bit word (the carry path).
  */
class MoneySumSpec extends SparkSpec {
  import org.scalacheck.rng.Seed
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 6))

  test("group sums equal built-in decimal Sum on random signed values") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.choose(0, 7),
      Gen.choose(-1e9, 1e9)))
    samples(gen, 4).foreach { rows =>
      val df = rows.toDF("k", "v")
      val want = df.groupBy("k").agg(sum(dec(col("v"))).cast("string"))
        .as[(Int, String)].collect().toMap
      val got = df.groupBy("k").agg(sumDec128(dec(col("v"))).cast("string"))
        .as[(Int, String)].collect().toMap
      assert(got == want)
    }
  }

  test("carry path: magnitudes that wrap the low word sum exactly") {
    // 9e11 * 1e6 unscaled = 9e17; eleven of them pass 2^63 ≈ 9.2e18,
    // so the 128-bit carry MUST fire for the total to come back right
    val df = Seq.fill(40)(9.99999e11).toDF("v")
    val want = df.agg(sum(dec(col("v"))).cast("string")).head.getString(0)
    val got = df.agg(sumDec128(dec(col("v"))).cast("string")).head.getString(0)
    assert(got == want, s"$got vs $want")
    // and mirrored negatives cancel exactly through the carry
    val mixed = (Seq.fill(25)(9.99999e11) ++ Seq.fill(25)(-9.99999e11))
      .toDF("v")
    assert(mixed.agg(sumDec128(dec(col("v"))).cast("string"))
      .head.getString(0) == "0.000000")
  }

  test("null handling: nulls ignored, all-null and empty groups -> NULL") {
    val df = Seq[(Int, Option[Double])]((1, Some(2.5)), (1, None),
      (2, None), (2, None)).toDF("k", "v")
    val got = df.groupBy("k").agg(sumDec128(dec(col("v"))).as("s"))
      .orderBy("k").collect()
    assert(got(0).getDecimal(1).toPlainString == "2.500000")
    assert(got(1).isNullAt(1), "all-null group must sum to NULL")
    val empty = spark.emptyDataset[Double].toDF("v")
    assert(empty.agg(sumDec128(dec(col("v")))).head.isNullAt(0))
  }

  test("sumMoneyDouble equals the decimal-cast form on the money grid") {
    // The contract: true values with <= 6 fractional decimal digits
    // and |v| < 1e12. Build the grid the lineitem queries actually
    // produce — 2-decimal prices x (1 - 2-decimal discounts), i.e.
    // 4-decimal products — plus negatives and nulls, and require
    // BIT-IDENTICAL output (string compare of the Decimal(38,6)).
    val gen = Gen.listOfN(300, Gen.zip(Gen.choose(0, 5), Gen.zip(
      Gen.choose(-10499999L, 10499999L),   // price cents (signed)
      Gen.choose(0L, 10L))))               // discount in hundredths
    samples(gen, 4).foreach { rows =>
      val data = rows.map { case (k, (cents, disc)) =>
        (k, cents / 100.0 * (1 - disc / 100.0)) }
      val df = data.toDF("k", "v")
      val want = df.groupBy("k")
        .agg(sumDec128(dec(col("v"))).cast("string"))
        .as[(Int, String)].collect().toMap
      val got = df.groupBy("k")
        .agg(graft.plans.MoneySum.sumMoneyDouble(col("v")).cast("string"))
        .as[(Int, String)].collect().toMap
      assert(got == want)
    }
    // nulls / all-null / empty behave like SQL SUM
    val dfn = Seq[(Int, Option[Double])]((1, Some(-2.53)), (1, None),
      (2, None)).toDF("k", "v")
    val gotN = dfn.groupBy("k")
      .agg(graft.plans.MoneySum.sumMoneyDouble(col("v")).as("s"))
      .orderBy("k").collect()
    assert(gotN(0).getDecimal(1).toPlainString == "-2.530000")
    assert(gotN(1).isNullAt(1))
  }

  test("window frame: running sum equals built-in over the same frame") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = (1 to 100).map(i => (i, i * 1.01 - 51)).toDF("i", "v")
    val want = df.select(sum(dec(col("v"))).over(w).cast("string"))
      .as[String].collect().toSeq
    val got = df.select(sumDec128(dec(col("v"))).over(w).cast("string"))
      .as[String].collect().toSeq
    assert(got == want)
  }
}
