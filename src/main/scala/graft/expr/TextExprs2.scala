package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-7 fused text kernels (guide §1.2 "per-task work"): the composed
  * forms of line dedup and token reflow run INTERPRETED higher-order-function
  * lambdas per row (ArrayTransform/ArrayFilter are CodegenFallback, and the
  * dedup filter's `array_position` scan is O(lines²)); these kernels compute
  * the identical values in one compiled pass. Composed twins stay as the
  * extension-less fallbacks; TextCleanSpec/GopherRulesSpec pin parity.
  */
object LineKernel {
  private val nl = java.util.regex.Pattern.compile("\n")
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** EXACTLY [[graft.text.TextAnalysis.dedupLines]]'s composed chain:
    * lines = `split(text, "\n")` (limit -1 — trailing empties kept), keep
    * each line's FIRST occurrence in order, report (n_lines, n_kept,
    * joined kept lines).
    */
  def dedupLines(s: UTF8String): InternalRow = {
    val lines = nl.split(s.toString, -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < lines.length) { seen.add(lines(i)); i += 1 }
    val sb = new java.lang.StringBuilder()
    val it = seen.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append('\n')
      sb.append(it.next()); first = false
    }
    new GenericInternalRow(Array[Any](lines.length, seen.size,
      UTF8String.fromString(sb.toString)))
  }

  /** EXACTLY [[graft.text.TextAnalysis.reflowLines]]'s composed chain:
    * whitespace tokens of the SQL-trimmed text (split limit -1), chunks of
    * `perLine` joined by single spaces, chunks joined by newlines (the last
    * line keeps the remainder; ceil(n/perLine) lines, minimum one).
    */
  def reflow(s: UTF8String, perLine: Int): UTF8String = {
    val str0 = s.toString
    var st = 0; var en = str0.length
    while (st < en && str0.charAt(st) == ' ') st += 1
    while (en > st && str0.charAt(en - 1) == ' ') en -= 1
    val toks = ws.split(str0.substring(st, en), -1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(if (i % perLine == 0) '\n' else ' ')
      sb.append(toks(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_dedup_lines(text)` → `struct<n_lines int, n_kept int,
  * text_dedup string>` — see [[LineKernel.dedupLines]].
  */
case class DedupLines(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("text_dedup", StringType, nullable = false)))
  override def prettyName: String = "graft_dedup_lines"

  override protected def nullSafeEval(input: Any): Any =
    LineKernel.dedupLines(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.LineKernel.dedupLines($s);")

  override protected def withNewChildInternal(newChild: Expression): DedupLines =
    copy(child = newChild)
}

/** `graft_reflow(text, perLine)` → `string` — see [[LineKernel.reflow]]. */
case class ReflowLines(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_reflow"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_reflow requires a literal perLine argument")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val perLine: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, b: Any): Any =
    LineKernel.reflow(a.asInstanceOf[UTF8String], perLine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.expr.LineKernel.reflow($s, $perLine);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ReflowLines =
    copy(left = newLeft, right = newRight)
}
