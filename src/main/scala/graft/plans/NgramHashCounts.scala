package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.unsafe.Platform
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** [[NgramCounts]] with the gram key emitted as a 64-bit hash instead
  * of the gram string: raw text → array<struct<g: long, c: long>>
  * (first-occurrence order). The corpus-LM scorer never outputs the
  * gram itself — only per-doc sums — so the string key is pure
  * overhead end to end; this kernel drops it at the source:
  *
  *  - each TOKEN is xxhash64'd once (not re-hashed per window as a
  *    post-explode `xxhash64(g)` projection effectively does via the
  *    concat), and window keys combine token hashes with a
  *    mix-and-avalanche (murmur3 fmix64) — no gram string is ever
  *    materialized;
  *  - within-row counting runs on a primitive open-addressing
  *    long→long table (linear probing, power-of-2 sizing) instead of
  *    a boxed LinkedHashMap keyed by UTF8String.
  *
  * Collision semantics are the scorer's disclosed contract (see
  * Curate.scoreByNgramFreq): a collision merges two grams' corpus
  * counts, probability ~(distinct grams)²/2⁶⁵ — the key never
  * reaches the output, so this stays an internal representation
  * choice. The A/B evidence for the hashed-key exchange is the
  * shape table in [[graft.operators.Curate.scoreByNgramFreq]]'s
  * scaladoc (paired same-box medians at sf0.1/sf1/sf3).
  */
case class NgramHashCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_ngram_hash_counts"

  override protected def nullSafeEval(input: Any): Any =
    NgramHashCounts.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NgramHashCounts.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): NgramHashCounts =
    copy(child = c)
}

object NgramHashCounts {

  /** murmur3 fmix64 — the standard 64-bit avalanche finalizer. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // tokens(): lowercase, split on single space, drop empties — the
    // split(lower(text), " ") + filter contract, walked directly over
    // the UTF-8 bytes (0x20 never occurs inside a multi-byte
    // sequence, so byte-splitting IS space-splitting); each token
    // span is XXH64'd in place — no per-token UTF8String allocates.
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val len = bytes.length
    val tokHash = new Array[Long](len / 2 + 1)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20) i += 1
      else {
        val start = i
        while (i < len && bytes(i) != 0x20) i += 1
        tokHash(nTok) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        nTok += 1
      }
    }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // `cap` sizing below is Int pow-2 arithmetic: past 2^29 windows
    // (a single row holding ~1 GiB of text) `m * 2` would overflow
    // and the probe loop could spin on a full table — fail fast with
    // a diagnosable error instead of hanging the task.
    require(m < (1 << 29),
      s"NgramHashCounts: $m n-gram windows in one row exceeds the " +
        "2^29 single-row bound; split the document upstream")

    // open-addressing long→count table; capacity = next pow2 ≥ 2m so
    // load factor stays ≤ 0.5; key 0 remapped (0 is the empty slot)
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Long](cap)
    val order = new Array[Int](m) // slot indices in first-occurrence order
    var nDistinct = 0

    i = 0
    while (i < m) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { h = (h ^ tokHash(i + j)) * 0xc2b2ae3d27d4eb4fL; j += 1 }
      h = fmix64(h)
      if (h == 0L) h = 1L
      var slot = (h & mask).toInt
      while (keys(slot) != 0L && keys(slot) != h) slot = (slot + 1) & mask
      if (keys(slot) == 0L) {
        keys(slot) = h
        order(nDistinct) = slot
        nDistinct += 1
      }
      cnts(slot) += 1L
      i += 1
    }

    val out = new Array[Any](nDistinct)
    var k = 0
    while (k < nDistinct) {
      val slot = order(k)
      out(k) = new GenericInternalRow(Array[Any](keys(slot), cnts(slot)))
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(NgramHashCounts(Bridge.expression(text), n))
}
