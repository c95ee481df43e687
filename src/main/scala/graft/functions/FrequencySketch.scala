package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (frequency) sketch — the third leg of the
  * corpus-profiling trio beside the HLL distinct-count and KLL
  * quantile sketches: per-shard `freqAgg` at write time,
  * `freqUnionAgg` over stored sketch columns at query time, exact-ish
  * top tokens out of the union without ever rescanning history.
  *
  * Algorithm: Misra-Gries (the classic deterministic frequent-items
  * summary; mergeable form per Agarwal et al., "Mergeable Summaries",
  * PODS'12 — both public): keep ≤ k counters; an unseen key with the
  * summary full decrements every counter (dropping zeros); MERGE adds
  * counter maps then subtracts the (k+1)-th largest count so ≤ k
  * survive. Estimates are under-counts with error ≤ n/(k+1), and the
  * union of shard sketches carries the same bound as a single pass.
  *
  * Exactness contract (what the oracle row pins): while every sketch
  * — and any union of sketches — has tracked ≤ k DISTINCT keys, no
  * decrement has ever fired and counts are EXACT, independent of row
  * and merge order. The ns_profile_heavyhitters oracle row runs in
  * that regime (k = 2¹⁷ vs ≤50k distinct corpus tokens at oracle
  * sfs); the lossy bound is pinned by a PropertySpec golden.
  */
object FrequencySketch {

  final class MGSketch(var k: Int) extends Serializable {
    val counts = new java.util.HashMap[String, Long]()
    /** Total decrement depth — the upper bound on any key's
      * undercount; 0 ⇔ lossless so far.
      */
    var decrements: Long = 0L

    def insert(key: String): Unit = {
      val cur = counts.get(key)
      if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + 1)
      else if (counts.size < k) counts.put(key, 1L)
      else {
        // classic MG step: new key with a full summary decrements all
        decrements += 1
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }

    def merge(o: MGSketch): Unit = {
      if (k <= 0) k = o.k
      decrements += o.decrements
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > k) {
        // mergeable-summaries step: subtract the (k+1)-th largest
        // count, drop non-positives — back to ≤ k counters with the
        // additive error bounds of a single-pass summary
        val vals = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
        decrements += cut
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= cut) eit.remove()
          else e.setValue(e.getValue - cut)
        }
      }
    }

    /** Canonical bytes: entries sorted by key, so equal summaries
      * serialize equal regardless of hash-map iteration order.
      */
    def serialize(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(k); out.writeLong(decrements); out.writeInt(counts.size)
      val keys = new java.util.ArrayList[String](counts.keySet())
      java.util.Collections.sort(keys)
      val kit = keys.iterator()
      while (kit.hasNext) {
        val key = kit.next()
        val b = key.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(counts.get(key))
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): MGSketch = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val s = new MGSketch(in.readInt())
    s.decrements = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    s
  }

  /** freq_agg: fold a string column into one serialized summary. */
  case class FreqAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MGSketch] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_freq_sketch_agg"
    override def createAggregationBuffer(): MGSketch = new MGSketch(k)
    override def update(b: MGSketch, row: InternalRow): MGSketch = {
      val v = child.eval(row)
      if (v != null) b.insert(v.asInstanceOf[UTF8String].toString)
      b
    }
    override def merge(b: MGSketch, o: MGSketch): MGSketch = { b.merge(o); b }
    override def eval(b: MGSketch): Any = b.serialize()
    override def serialize(b: MGSketch): Array[Byte] = b.serialize()
    override def deserialize(bytes: Array[Byte]): MGSketch =
      FrequencySketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): FreqAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): FreqAgg = copy(child = c.head)
  }

  /** freq_union_agg: fold serialized summaries into their union. */
  case class FreqUnionAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MGSketch] {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_freq_sketch_union_agg"
    override def createAggregationBuffer(): MGSketch = new MGSketch(0)
    override def update(b: MGSketch, row: InternalRow): MGSketch = {
      val v = child.eval(row)
      if (v != null)
        b.merge(FrequencySketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def merge(b: MGSketch, o: MGSketch): MGSketch = { b.merge(o); b }
    override def eval(b: MGSketch): Any = b.serialize()
    override def serialize(b: MGSketch): Array[Byte] = b.serialize()
    override def deserialize(bytes: Array[Byte]): MGSketch =
      FrequencySketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): FreqUnionAgg = copy(child = c.head)
  }

  /** Top-n entries of a serialized summary by (count DESC, key ASC),
    * as array<struct<token, cnt, cnt_max>> — cnt is the guaranteed
    * lower bound, cnt_max (= cnt + decrements) the upper.
    */
  case class FreqTopK(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"n must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("cnt_max", LongType, nullable = false))), false)
    override def prettyName: String = "graft_freq_sketch_topk"
    override protected def nullSafeEval(bin: Any): Any = {
      val s = FrequencySketch.deserialize(bin.asInstanceOf[Array[Byte]])
      import scala.jdk.CollectionConverters._
      val top = s.counts.entrySet().asScala.toSeq
        .sortBy(e => (-e.getValue, e.getKey)).take(n)
      new GenericArrayData(top.map(e => InternalRow(
        UTF8String.fromString(e.getKey), e.getValue,
        e.getValue + s.decrements)).toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): FreqTopK =
      copy(child = c)
  }

  /** Column forms. */
  def freqAgg(c: Column, k: Int = 1 << 17): Column =
    Bridge.column(FreqAgg(Bridge.expression(c), k).toAggregateExpression())
  def freqUnionAgg(c: Column): Column =
    Bridge.column(FreqUnionAgg(Bridge.expression(c)).toAggregateExpression())
  def freqTopK(c: Column, n: Int): Column =
    Bridge.column(FreqTopK(Bridge.expression(c), n))
}
