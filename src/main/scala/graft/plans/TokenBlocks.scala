package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass paragraph blocker for the paragraph-dedup tier
  * (Curate.dedupParagraphs): raw text → array<struct<pid: int,
  * ptext: string>> of non-overlapping `k`-token blocks, where the
  * token/assembly contract is EXACTLY the compositional
  * `tokens(text)` + `slice` + `concat_ws(" ", …)` chain it replaces
  * (lowercase, split on single 0x20, drop empties, join with one
  * space) — the oracle hash pins the equivalence.
  *
  * Why a kernel: the compositional chain materializes the full token
  * ARRAY (one UTF8String per token), then re-slices and re-concats
  * it per block — three allocation passes over every byte. This
  * walks the lowercased UTF-8 bytes once (0x20 never occurs inside a
  * multi-byte sequence, so byte-splitting IS space-splitting — the
  * same argument as [[NgramHashCounts]]), records token spans, and
  * copies each block's spans straight into one output buffer.
  * Zero-token text returns an empty array (the caller's
  * explode_outer keeps the doc alive with a NULL block).
  */
case class TokenBlocks(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"block size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("ptext", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_token_blocks"

  override protected def nullSafeEval(input: Any): Any =
    TokenBlocks.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.TokenBlocks.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): TokenBlocks =
    copy(child = c)
}

object TokenBlocks {

  def compute(text: UTF8String, k: Int): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val len = bytes.length
    // token spans: starts(i) inclusive, ends(i) exclusive
    var starts = new Array[Int](math.max(8, len / 8))
    var ends = new Array[Int](starts.length)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20) i += 1
      else {
        val s = i
        while (i < len && bytes(i) != 0x20) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])

    val nBlocks = (nTok + k - 1) / k
    val out = new Array[Any](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val from = b * k
      val until = math.min(nTok, from + k)
      var size = until - from - 1 // single-space separators
      var t = from
      while (t < until) { size += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      t = from
      while (t < until) {
        if (t > from) { buf(pos) = 0x20; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, l)
        pos += l
        t += 1
      }
      out(b) = new GenericInternalRow(
        Array[Any](b, UTF8String.fromBytes(buf)))
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int): Column =
    Bridge.column(TokenBlocks(Bridge.expression(text), k))
}
