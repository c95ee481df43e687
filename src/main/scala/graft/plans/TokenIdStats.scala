package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → vocab-id map → per-doc stats in ONE native pass:
  * raw text → struct<n_tok, n_oov, checksum> where checksum =
  * Σ position·id over the doc's token-id sequence (1-based positions,
  * OOV → id 0, exact long arithmetic). Semantics are EXACTLY the
  * composition posexplode(tokens(text)) ⋈ vocab → groupBy(doc) — the
  * tokenize contract is byte-for-byte `split(lower(text), " ")` +
  * drop-empties — fused so no token array, occurrence row, join
  * probe, or per-doc aggregation state ever materializes. The vocab
  * is a MODEL-sized constructor map (the PQ-centroid / eval-hash-set
  * lifecycle): prebuilt once on the driver, bound into codegen via
  * `addReferenceObj`, O(1) lookups per token — vs the interpreted
  * HOF filter + per-occurrence BHJ probe this replaces (A/B table in
  * Curate.tokenizeWithVocab's scaladoc).
  *
  * Zero-token docs return (0, 0, 0) — callers mirroring the oracle's
  * inner aggregation filter n_tok >= 1. Checksum is exact while
  * Σ pos·id < 2⁶³ (a >10⁹-token single doc would be split upstream
  * long before this bound matters).
  */
case class TokenIdStats(child: Expression, vocab: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  override def prettyName: String = "graft_token_id_stats"

  @transient private lazy val index: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, id) => m.put(UTF8String.fromString(t), java.lang.Long.valueOf(id)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenIdStats.compute(input.asInstanceOf[UTF8String], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW type name, not the parameterized one: Janino's generics
    // support is partial, and a failed cast compile silently demotes
    // the whole stage to interpreted eval — exactly the fused-kernel
    // speedup this expression exists for (ADVICE r17). compute()
    // carries the typed signature; sibling kernels (PqEncodeExpr,
    // BloomExprs, Sketches) all pass raw names for the same reason.
    val ref = ctx.addReferenceObj("graftVocabIndex", index,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.TokenIdStats.compute($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): TokenIdStats =
    copy(child = c)
}

object TokenIdStats {

  private val SEP = UTF8String.fromString(" ")

  def compute(text: UTF8String,
      index: java.util.HashMap[UTF8String, java.lang.Long]): GenericInternalRow = {
    // tokens(): lowercase, split on single space, drop empties —
    // byte-for-byte the split(lower(text), " ") + filter contract
    val parts = text.toLowerCase.split(SEP, -1)
    var nTok = 0L
    var nOov = 0L
    var checksum = 0L
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) {
        nTok += 1L
        val id = index.get(parts(i))
        if (id == null) nOov += 1L
        else checksum += nTok * id.longValue()
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nOov, checksum))
  }

  def apply(text: Column, vocab: Map[String, Long]): Column =
    Bridge.column(TokenIdStats(Bridge.expression(text), vocab))
}
