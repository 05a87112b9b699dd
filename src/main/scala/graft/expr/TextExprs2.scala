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

/** Word n-grams WITH multiplicity in one expression —
  * `graft_ngrams(text, n)` → `array<string>`, the fused twin of
  * [[graft.text.TextAnalysis.ngramsWithMultiplicity]]'s composed chain
  * (round-7): same SQL trim / Java `\s+` split (limit -1) / positions
  * 0..len-n joined by single spaces / empty grams dropped (reachable only
  * at n = 1 on degenerate text). The composed per-position
  * `sequence`/`slice`/`array_join` lambdas evaluate interpreted per row;
  * NgramSpec pins fused == composed parity.
  */
object NgramKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def ngrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str0 = s.toString
    var st = 0; var en = str0.length
    while (st < en && str0.charAt(st) == ' ') st += 1
    while (en > st && str0.charAt(en - 1) == ' ') en -= 1
    val toks = ws.split(str0.substring(st, en), -1)
    val last = toks.length - n
    if (last < 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new java.util.ArrayList[Any](last + 1)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      if (sb.length != 0) out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `graft_ngrams(text, n)` → `array<string>` — see [[NgramKernel]].
  * NEVER-NULL: the composed chain's `element_at(transform(array(split(...`
  * scaffolding yields an EMPTY array for null text (the null rides inside
  * the outer array and the inner when/filter drop it), so the fused twin
  * maps null → empty array too (parity-pinned in NgramSpec).
  */
case class NgramsWithMultiplicity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
  import org.apache.spark.sql.types.ArrayType

  override def inputTypes = Seq(StringType, IntegerType)
  // containsNull = true ON PURPOSE: the composed chain's filter output
  // keeps the transform's nullable element type, and `explode` derives the
  // downstream column's NULLABILITY from containsNull — q_ngram_counts
  // writes that column, so the fused twin must not flip the parquet
  // required/optional bit (values never contain null on either path)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_ngrams requires a literal n argument")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  private val emptyArr =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) emptyArr
    else NgramKernel.ngrams(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = left.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull}
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0])
          : graft.expr.NgramKernel.ngrams(${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramsWithMultiplicity =
    copy(left = newLeft, right = newRight)
}

/** `graft_ws_tokens(text)` → `int` — the fused twin of
  * `size(filter(split(trim(text), "\\s+"), w -> w != ""))` (round-7): the
  * NONEMPTY whitespace token count (the q_concat_chunks counting rule).
  * The composed form runs an interpreted ArrayFilter lambda per token per
  * row; null text → null like the composed `size(null)`.
  */
object WsTokenKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def count(s: UTF8String): Int = {
    val str0 = s.toString
    var st = 0; var en = str0.length
    while (st < en && str0.charAt(st) == ' ') st += 1
    while (en > st && str0.charAt(en - 1) == ' ') en -= 1
    val toks = ws.split(str0.substring(st, en), -1)
    var n = 0
    var i = 0
    while (i < toks.length) { if (toks(i).nonEmpty) n += 1; i += 1 }
    n
  }
}

/** See [[WsTokenKernel]]. */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WsTokenKernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.WsTokenKernel.count($s);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}
