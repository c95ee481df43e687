package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

object PiiRedactSupport {
  // The SAME pattern strings as graft.operators.Curate (one
  // compilation here; Curate references these so the two can't drift)
  val emailRegex = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phoneRegex = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val idRunRegex = "[0-9]{6,}"

  private val EMAIL = java.util.regex.Pattern.compile(emailRegex)
  private val PHONE = java.util.regex.Pattern.compile(phoneRegex)
  private val IDRUN = java.util.regex.Pattern.compile(idRunRegex)

  private def replaceAll(p: java.util.regex.Pattern, s: String,
      repl: String): String = {
    // identical engine + appendReplacement protocol to Spark's
    // RegExpReplace, so outputs are bit-equal to the chained
    // regexp_replace formulation; repl carries no '$'/'\' so the
    // literal append is exact
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length + 16)
    var last = 0
    do {
      sb.append(s, last, m.start()).append(repl)
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  /** One pass over the document: (redacted text, email match count).
    * Equals regexp_replace(regexp_replace(regexp_replace(text, email,
    * "<email>"), phone, "<phone>"), idrun, "<id>") paired with
    * regexp_count(text, email) — same java.util.regex engine, same
    * patterns, same sequential-application semantics — while running
    * the email automaton ONCE (count and replace share the scan) and
    * round-tripping UTF8String↔String once instead of four times.
    */
  def redactAndCount(in: UTF8String): InternalRow = {
    val s0 = in.toString
    val m = EMAIL.matcher(s0)
    var n = 0L
    var s1: String = null
    if (m.find()) {
      val sb = new java.lang.StringBuilder(s0.length + 16)
      var last = 0
      do {
        n += 1
        sb.append(s0, last, m.start()).append("<email>")
        last = m.end()
      } while (m.find())
      sb.append(s0, last, s0.length)
      s1 = sb.toString
    } else s1 = s0
    val s2 = replaceAll(PHONE, s1, "<phone>")
    val s3 = replaceAll(IDRUN, s2, "<id>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(s3), n))
  }
}

/** Fused PII-redaction kernel: struct<red: string, n_email: bigint> in
  * one evaluation. The query layer reads both fields from a single
  * instance of this expression; whole-stage codegen's subexpression
  * elimination then evaluates the kernel once per row, where the
  * compositional form paid four regex passes (email twice — once to
  * count, once to replace — then phone, then id) plus a String
  * round-trip per pass.
  */
case class PiiRedact(child: Expression)
    extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("red", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false)))
  override def prettyName: String = "graft_pii_redact"

  override protected def nullSafeEval(in: Any): Any =
    PiiRedactSupport.redactAndCount(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PiiRedactSupport.redactAndCount($c);")

  override protected def withNewChildInternal(c: Expression): PiiRedact =
    copy(child = c)
}

object PiiRedact {
  def apply(text: Column): Column =
    Bridge.column(PiiRedact(Bridge.expression(text)))
}
