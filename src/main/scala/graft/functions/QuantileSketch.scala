package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (VERDICT r17 missing #3): the
  * never-rescan-history pattern the HLL distinct-count sketches
  * already prove, for percentiles — per-shard `sketchAgg` at write
  * time, `sketchUnionAgg` over stored sketch columns at query time,
  * quantiles read out of the union. Spark's own `approx_percentile`
  * aggregates rows but its digest is not exposed as a mergeable
  * column value, which is the whole point at 100 TB.
  *
  * The sketch is a KLL-style compactor ladder (Karnin/Lang/Liberty,
  * FOCS'16 — public algorithm): level i holds items of weight 2^i;
  * a level past `k` items sorts itself and promotes every other item
  * to level i+1 (the compaction parity alternates per level, a
  * deterministic variant of KLL's random coin; total weight is
  * preserved exactly). Rank error is O(log(n/k)/k) with O(k·log(n/k))
  * memory.
  *
  * Exactness contract (what the oracle row pins): while a sketch —
  * or any union of sketches — holds ≤ k items, NO compaction has
  * happened and the sketch is LOSSLESS: quantiles are exact-rank
  * answers over the exact multiset, independent of row or merge
  * order. The ns_profile_quantiles oracle row runs in this regime;
  * the ExtensionsSpec golden covers the lossy regime with a bounded-
  * error merge-equals-global check.
  *
  * Quantile rule = SQL `percentile_disc`/DuckDB `quantile_disc`:
  * the smallest value whose cumulative weight ≥ q·N.
  */
object QuantileSketch {

  /** Mutable ladder: levels(i) holds weight-2^i items; only level
    * sizes are bounded (≤ max(k,2) after compaction cascades).
    */
  final class QSketch(var k: Int) extends Serializable {
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    var n: Long = 0L
    private[functions] var parity: Int = 0

    private def cap: Int = math.max(k, 2)

    def insert(x: Double): Unit = {
      levels(0) += x
      n += 1
      if (levels(0).length > cap) compactFrom(0)
    }

    private def compactFrom(start: Int): Unit = {
      var i = start
      while (i < levels.length && levels(i).length > cap) {
        if (i + 1 == levels.length)
          levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        val sorted = levels(i).toArray
        java.util.Arrays.sort(sorted)
        // adjacent pairs: promote the parity-th member of each pair
        // to level i+1 (weight 2^{i+1}), drop the other; an unpaired
        // trailing item keeps its level. Weight: pairs·2w + leftover·w
        // = c·w — total weight is preserved EXACTLY at every step.
        val even = sorted.length & ~1
        val promote =
          new scala.collection.mutable.ArrayBuffer[Double](even / 2)
        var j = 0
        while (j < even) { promote += sorted(j + parity); j += 2 }
        val leftover = scala.collection.mutable.ArrayBuffer.empty[Double]
        if (sorted.length > even) leftover += sorted(even)
        parity ^= 1
        levels(i) = leftover
        levels(i + 1) ++= promote
        i += 1
      }
    }

    def merge(o: QSketch): Unit = {
      if (k <= 0) k = o.k
      while (levels.length < o.levels.length)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      o.levels.indices.foreach(i => levels(i) ++= o.levels(i))
      n += o.n
      levels.indices.foreach(i =>
        if (levels(i).length > cap) compactFrom(i))
    }

    /** Total represented weight — always exactly n. */
    def totalWeight: Long =
      levels.indices.map(i => levels(i).length.toLong << i).sum

    /** percentile_disc over the weighted items: smallest value whose
      * cumulative weight ≥ q·N.
      */
    def quantiles(probs: Seq[Double]): Array[Double] = {
      val items = levels.indices.flatMap(i =>
        levels(i).map(v => (v, 1L << i))).sortBy(_._1).toArray
      val total = totalWeight
      probs.map { q =>
        val target = q * total
        var cum = 0L
        var idx = 0
        var out = if (items.isEmpty) Double.NaN else items.last._1
        var found = false
        while (idx < items.length && !found) {
          cum += items(idx)._2
          if (cum >= target) { out = items(idx)._1; found = true }
          idx += 1
        }
        out
      }.toArray
    }

    def serialize(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(k); out.writeLong(n); out.writeInt(parity)
      out.writeInt(levels.length)
      levels.foreach { lvl =>
        out.writeInt(lvl.length)
        lvl.foreach(out.writeDouble)
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): QSketch = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val s = new QSketch(in.readInt())
    s.n = in.readLong()
    s.parity = in.readInt()
    val nLevels = in.readInt()
    s.levels.clear()
    (0 until nLevels).foreach { _ =>
      val sz = in.readInt()
      val lvl = new scala.collection.mutable.ArrayBuffer[Double](sz)
      (0 until sz).foreach(_ => lvl += in.readDouble())
      s.levels += lvl
    }
    s
  }

  /** sketch_agg: fold a double column into one serialized sketch. */
  case class SketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QSketch] {
    require(k >= 2, s"sketch k must be >= 2, got $k")
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_quantile_sketch_agg"
    override def createAggregationBuffer(): QSketch = new QSketch(k)
    override def update(b: QSketch, row: InternalRow): QSketch = {
      val v = child.eval(row)
      if (v != null) b.insert(v.asInstanceOf[Double])
      b
    }
    override def merge(b: QSketch, o: QSketch): QSketch = { b.merge(o); b }
    override def eval(b: QSketch): Any = b.serialize()
    override def serialize(b: QSketch): Array[Byte] = b.serialize()
    override def deserialize(bytes: Array[Byte]): QSketch =
      QuantileSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): SketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): SketchAgg = copy(child = c.head)
  }

  /** sketch_union_agg: fold serialized sketches into their union —
    * the query-time half of the per-shard pattern.
    */
  case class SketchUnionAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QSketch] {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_quantile_sketch_union_agg"
    // k adopted from the first sketch merged in
    override def createAggregationBuffer(): QSketch = new QSketch(0)
    override def update(b: QSketch, row: InternalRow): QSketch = {
      val v = child.eval(row)
      if (v != null)
        b.merge(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def merge(b: QSketch, o: QSketch): QSketch = { b.merge(o); b }
    override def eval(b: QSketch): Any = b.serialize()
    override def serialize(b: QSketch): Array[Byte] = b.serialize()
    override def deserialize(bytes: Array[Byte]): QSketch =
      QuantileSketch.deserialize(bytes)
    override def withNewMutableAggBufferOffset(o: Int): SketchUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SketchUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): SketchUnionAgg = copy(child = c.head)
  }

  /** Read quantiles out of a serialized sketch (percentile_disc
    * rule). Scalar, evaluated once per result row — CodegenFallback
    * is free here.
    */
  case class SketchQuantiles(child: Expression, probs: Seq[Double])
      extends UnaryExpression with CodegenFallback {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0,1]: $probs")
    override def dataType: DataType = ArrayType(DoubleType, false)
    override def prettyName: String = "graft_sketch_quantiles"
    override protected def nullSafeEval(bin: Any): Any =
      new GenericArrayData(
        QuantileSketch.deserialize(bin.asInstanceOf[Array[Byte]])
          .quantiles(probs))
    override protected def withNewChildInternal(
        c: Expression): SketchQuantiles = copy(child = c)
  }

  /** Column forms. The value column is cast to double (the sketch's
    * item type) up front.
    */
  def sketchAgg(c: Column, k: Int = 4096): Column =
    Bridge.column(SketchAgg(Bridge.expression(c.cast("double")), k)
      .toAggregateExpression())
  def sketchUnionAgg(c: Column): Column =
    Bridge.column(SketchUnionAgg(Bridge.expression(c))
      .toAggregateExpression())
  def sketchQuantiles(c: Column, probs: Seq[Double]): Column =
    Bridge.column(SketchQuantiles(Bridge.expression(c), probs))
}
