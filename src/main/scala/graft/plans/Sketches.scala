package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen sketch expressions (SURVEY.md §4.3 custom-extension
  * budget): single-pass loops over a pre-hashed token/shingle array.
  * The higher-order-function forms evaluate lambdas interpretively per
  * element (~100× these loops at sf0.1); semantics are identical and
  * the DuckDB oracles reproduce them with pure SQL arithmetic.
  */

/** MinHash signature over 31-bit shingle hashes: slot i is
  * min((a_i * h + b_i) mod p) with p = 2^31 - 1. One md5 per shingle
  * (outside), k multiply-adds per shingle (in here) — vs k md5s per
  * shingle in the naive form.
  */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_minhash_sig"

  private val P = MinHashSig.P

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j) % P // accept 60-bit hashes; keep a*h in i64
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j) % ${P}L;
         |  for (int $i = 0; $i < ${as.length}; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Deterministic seed constants, derived with the same md5-based
    * hex60 both engines use, so the DuckDB oracle re-derives them in
    * SQL: a_i = hex60("a:i") % (p-1) + 1, b_i = hex60("b:i") % p.
    */
  def seedsA(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      graft.functions.SimilarityFunctions.hex60Local(s"a:$i") % (P - 1) + 1)
  def seedsB(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      graft.functions.SimilarityFunctions.hex60Local(s"b:$i") % P)

  def apply(hashes31: Column, k: Int): Column =
    Bridge.column(MinHashSig(
      Bridge.expression(hashes31), seedsA(k), seedsB(k)))
}

/** 60-bit SimHash from an array of 60-bit token hashes: per bit b,
  * count +1 if set else -1 over all tokens; output bit b = 1 iff the
  * count is positive.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](60)
    var j = 0
    while (j < hs.numElements()) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (cnt(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cnt = ctx.freshName("cnt")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $cnt = new int[60];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($cnt[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {
  def apply(hashes: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(hashes)))
}
