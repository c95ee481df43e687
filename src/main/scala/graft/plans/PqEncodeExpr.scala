package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Driver-held PQ codebook in encode layout: `cids(s*k + ci)` = the
  * codeword id, `cx(((s*k) + ci)*subDim + j)` = its coordinate for
  * global dim `d = s*subDim + j`. Codeword ids are sorted ascending
  * WITHIN each subspace so first-strict-min scanning reproduces the
  * join formulation's `ORDER BY dist, cid` tie-break.
  */
final case class PqModel(subDim: Int, nSub: Int, k: Int,
    cids: Array[Long], cx: Array[Double]) extends Serializable

object PqEncodeSupport {
  /** Argmin codeword per subspace with the fixed-point distance the
    * join formulation computes: dist = Σ_j floor((x−cx)²·1e12) in
    * Long (order-independent, so partial aggregation and this
    * sequential loop agree bit-for-bit). Emits one element per
    * subspace that has at least one in-bounds dim — the inner-join
    * semantics for vectors shorter than the codebook's dims.
    */
  def encode(m: PqModel, arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    val nOut = math.min(m.nSub, (n + m.subDim - 1) / m.subDim)
    val out = new Array[Long](nOut)
    var s = 0
    while (s < nOut) {
      var best = -1
      var bestDist = Long.MaxValue
      var ci = 0
      while (ci < m.k) {
        var dist = 0L
        var j = 0
        val base = (s * m.k + ci) * m.subDim
        val d0 = s * m.subDim
        while (j < m.subDim && d0 + j < n) {
          val diff = x(d0 + j) - m.cx(base + j)
          dist += math.floor(diff * diff * 1e12).toLong
          j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = ci }
        ci += 1
      }
      out(s) = m.cids(s * m.k + best)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** In-row PQ encode of a vector against a driver-held codebook model:
  * returns the chosen codeword id per subspace (element s = subspace
  * s's cid) — the codes the long-form [[graft.operators.Pq.encode]]
  * derives through an explode + broadcast join + aggregate + argmin
  * window. Codes depend only on (vector, codebook), so the whole
  * encode is row-local compute: at 100 TB, encoding a shard is a
  * map-only scan — no explode (64× row inflation), no shuffle, no
  * window. The model is O(k·dims) — rides once per task via
  * `addReferenceObj`, the same lifecycle as the serving tier's ADC
  * table.
  */
case class PqEncodeVec(child: Expression, model: PqModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeSupport.encode(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqModel", model,
      classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PqEncodeSupport.encode($ref, $c);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeVec =
    copy(child = c)
}

object PqEncodeVec {
  def apply(vec: Column, model: PqModel): Column =
    Bridge.column(PqEncodeVec(Bridge.expression(vec), model))
}
