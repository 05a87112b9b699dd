package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused three-tier PII scrub kernel — EXACTLY the composed
  * [[graft.text.TextAnalysis.piiScrub]] chain (round-7, guide §1.2 "per-task
  * work"): the composed form runs SIX regex passes per document
  * (`regexp_count` + `regexp_replace` per tier); this kernel runs THREE —
  * one find-loop per tier that counts and rewrites in the same scan. The
  * per-tier semantics are identical by construction: Spark's `regexp_count`
  * counts `Matcher.find()` occurrences and `regexp_replace` rewrites that
  * same non-overlapping left-to-right match set, and the replacement tokens
  * (`<EMAIL>`/`<IP>`/`<ID>`) contain no `$`/`\` so `appendReplacement`
  * treats them literally on both paths. Tier ORDER is the pinned chain:
  * emails over the raw text, IPs over the email-rewritten text, long ids
  * over the IP-rewritten text.
  *
  * The regexes are [[graft.text.TextAnalysis.piiEmailRe]]/`piiIpRe`/`piiIdRe`
  * — the SAME vals interpolated into the q_pii_scrub oracle SQL, so the
  * three faces (fused kernel ⟷ composed chain ⟷ DuckDB oracle) share one
  * source of truth. PiiSpec pins fused == composed parity.
  */
object PiiKernel {
  private lazy val emailP =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.piiEmailRe)
  private lazy val ipP =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.piiIpRe)
  private lazy val idP =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.piiIdRe)

  private def pass(p: java.util.regex.Pattern, s: String,
                   repl: String): (Int, String) = {
    val m = p.matcher(s)
    if (!m.find()) return (0, s) // common case: no PII, zero allocation
    val sb = new java.lang.StringBuffer(s.length)
    var n = 0
    do { n += 1; m.appendReplacement(sb, repl) } while (m.find())
    m.appendTail(sb)
    (n, sb.toString)
  }

  def scrub(text: UTF8String): InternalRow = {
    val (ne, t1) = pass(emailP, text.toString, "<EMAIL>")
    val (ni, t2) = pass(ipP, t1, "<IP>")
    val (nd, t3) = pass(idP, t2, "<ID>")
    new GenericInternalRow(
      Array[Any](ne, ni, nd, UTF8String.fromString(t3)))
  }
}

/** `graft_pii_scrub(text)` → `struct<n_emails int, n_ips int, n_ids int,
  * text_scrubbed string>` — see [[PiiKernel]].
  */
case class PiiScrub(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("n_ids", IntegerType, nullable = false),
    StructField("text_scrubbed", StringType, nullable = false)))
  override def prettyName: String = "graft_pii_scrub"

  override protected def nullSafeEval(input: Any): Any =
    PiiKernel.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.PiiKernel.scrub($s);")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}
