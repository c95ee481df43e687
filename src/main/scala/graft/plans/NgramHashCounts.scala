package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
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
  *  - each TOKEN is hashed once (not re-hashed per window as a
  *    post-explode `xxhash64(g)` projection effectively does via the
  *    concat) with an xxh64-form hash whose lane loads FOLD ASCII
  *    case in place (SWAR), read zero-copy off the UTF8String — for
  *    ASCII rows no lowercase copy, no getBytes copy, and no
  *    allocation happens before the count table (round-19 kernel-CPU
  *    cut; non-ASCII rows fall back to Unicode toLowerCase and hash
  *    the lowered bytes with the same function, so equal grams hash
  *    equal across paths). Window keys combine token hashes with a
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

  // xxh64 primes (public spec); the token hash below is xxh64's
  // short-input form with ASCII case folding fused into the lane
  // loads, applied uniformly to any length — a deterministic strong
  // hash, NOT required to equal reference XXH64 (gram keys are
  // internal equality classes that never reach any output).
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  /** SWAR per-byte ASCII toLower over a 64-bit lane: bytes in
    * [0x41,0x5A] gain 0x20, every other byte (including ≥ 0x80
    * UTF-8 continuation/lead bytes) passes through untouched.
    */
  private def lower8(w: Long): Long = {
    val high = w & 0x8080808080808080L
    val w7 = w & 0x7f7f7f7f7f7f7f7fL
    val gtZ = w7 + 0x2525252525252525L // per-byte high bit: x > 'Z'
    val geA = w7 + 0x3f3f3f3f3f3f3f3fL // per-byte high bit: x >= 'A'
    w | ((geA & ~gtZ & ~high & 0x8080808080808080L) >>> 2)
  }

  /** Hash of the ASCII-LOWERCASED bytes at [off, off+len): case
    * folding costs three adds and three ands per 8-byte lane instead
    * of a whole-text toLowerCase copy. Reading through Platform makes
    * the kernel zero-copy over the UTF8String's own storage.
    */
  private def hashLower(base: AnyRef, off: Long, len: Int): Long = {
    var acc = 42L + P5 + len
    var i = 0
    while (i + 8 <= len) {
      var k = lower8(Platform.getLong(base, off + i))
      k *= P2
      k = java.lang.Long.rotateLeft(k, 31)
      k *= P1
      acc ^= k
      acc = java.lang.Long.rotateLeft(acc, 27) * P1 + P4
      i += 8
    }
    while (i < len) {
      var b = (Platform.getByte(base, off + i) & 0xff).toLong
      if (b >= 0x41L && b <= 0x5aL) b |= 0x20L
      acc ^= b * P5
      acc = java.lang.Long.rotateLeft(acc, 11) * P1
      i += 1
    }
    acc ^= acc >>> 33
    acc *= P2
    acc ^= acc >>> 29
    acc *= P3
    acc ^= acc >>> 32
    acc
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(text: UTF8String, n: Int): ArrayData = {
    // tokens(): lowercase, split on single space, drop empties — the
    // split(lower(text), " ") + filter contract. ASCII rows (the
    // overwhelming case) take a ZERO-COPY path: bytes are read in
    // place off the UTF8String and case folding happens inside the
    // hash's lane loads — no lowercase copy, no getBytes copy, no
    // allocation before the count table. Rows containing any byte
    // ≥ 0x80 fall back to UTF8String.toLowerCase (Unicode folding can
    // change byte LENGTH — ß, İ — so it cannot fuse), then hash the
    // lowered bytes with the SAME function: ASCII folding is
    // idempotent and lower8 passes non-ASCII bytes through, so equal
    // grams hash equal across the two paths.
    val len0 = text.numBytes
    val base0 = text.getBaseObject
    val off0 = text.getBaseOffset
    var ascii = true
    var s = 0
    while (ascii && s + 8 <= len0) {
      if ((Platform.getLong(base0, off0 + s) & 0x8080808080808080L) != 0L)
        ascii = false
      s += 8
    }
    while (ascii && s < len0) {
      if (Platform.getByte(base0, off0 + s) < 0) ascii = false
      s += 1
    }
    if (ascii) computeFrom(base0, off0, len0, n)
    else {
      val bytes = text.toLowerCase.getBytes
      computeFrom(bytes, Platform.BYTE_ARRAY_OFFSET.toLong, bytes.length, n)
    }
  }

  private def computeFrom(base: AnyRef, off: Long, len: Int,
      n: Int): ArrayData = {
    val tokHash = new Array[Long](len / 2 + 1)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) i += 1
      else {
        val start = i
        while (i < len && Platform.getByte(base, off + i) != 0x20) i += 1
        tokHash(nTok) = hashLower(base, off + start, i - start)
        nTok += 1
      }
    }
    val m = nTok - n + 1
    if (m <= 0) return Empty
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

    // Emit as ONE flat UnsafeArrayData byte image instead of a
    // GenericInternalRow (+ boxed longs) per distinct gram: at corpus
    // scale the per-gram row objects were the kernel's dominant
    // allocation (millions of short-lived objects per pass), and the
    // downstream explode reads UnsafeArrayData structs without
    // conversion. Layout per the UnsafeArrayData contract: 8-byte
    // count, null bitmap (all clear), one (offset<<32|size) long per
    // element, then each element as an UnsafeRow image (8-byte null
    // bits + two long fields = 24 bytes).
    // size the image in LONG first: the 2^29-window guard above
    // bounds m, but nDistinct·(8+24)+header passes Int.MaxValue from
    // ~89M DISTINCT grams — fail diagnosably instead of letting Int
    // wrap-around throw NegativeArraySizeException
    val headerInBytes = 8 + ((nDistinct + 63) / 64) * 8
    val fixedSizeL = headerInBytes.toLong + nDistinct.toLong * 8
    val totalL = fixedSizeL + nDistinct.toLong * 24
    require(totalL <= Int.MaxValue - 16,
      s"NgramHashCounts: $nDistinct distinct grams in one row need " +
        s"$totalL bytes, past the single-row array bound; split the " +
        "document upstream")
    val fixedSize = fixedSizeL.toInt
    val data = new Array[Byte](totalL.toInt)
    val baseOff = Platform.BYTE_ARRAY_OFFSET.toLong
    Platform.putLong(data, baseOff, nDistinct.toLong)
    var k = 0
    while (k < nDistinct) {
      val elemOffset = fixedSize + k * 24
      Platform.putLong(data, baseOff + headerInBytes + k * 8,
        (elemOffset.toLong << 32) | 24L)
      val slot = order(k)
      Platform.putLong(data, baseOff + elemOffset + 8, keys(slot))
      Platform.putLong(data, baseOff + elemOffset + 16, cnts(slot))
      k += 1
    }
    val arr = new UnsafeArrayData
    arr.pointTo(data, baseOff, data.length)
    arr
  }

  def apply(text: Column, n: Int): Column =
    Bridge.column(NgramHashCounts(Bridge.expression(text), n))
}
