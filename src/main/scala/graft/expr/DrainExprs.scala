package graft.expr

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.parse.Drain

/** Driver-side handle table wiring a `Broadcast[Drain.Matcher]` into the
  * `graft_drain_match` / `graft_drain_match_id` function builders — the
  * [[BloomRegistry]] pattern verbatim: builders run during analysis on the
  * driver, resolve the id literal to the broadcast, and the plan carries
  * only the broadcast HANDLE. Executors fetch the frozen tree once per JVM
  * through the normal torrent-broadcast path and never touch this registry.
  */
object DrainRegistry {
  private val next = new AtomicLong(0L)
  private val table = new ConcurrentHashMap[Long, Broadcast[Drain.Matcher]]()

  def register(bc: Broadcast[Drain.Matcher]): Long = {
    val id = next.incrementAndGet()
    table.put(id, bc)
    id
  }

  def resolve(id: Long): Broadcast[Drain.Matcher] = {
    val bc = table.get(id)
    require(bc != null,
      s"graft_drain_match: no broadcast matcher registered under id $id " +
        "(the id literal must come from DrainRegistry.register in the same driver JVM)")
    bc
  }

  def release(id: Long): Unit = table.remove(id)
}

/** Row kernels shared by the interpreted eval and the generated code —
  * EXACTLY the match-UDF bodies ([[Drain.matchEventIds]] /
  * [[Drain.matchTemplates]]): same tokenization, same frozen-tree search,
  * same digit-mask fallback. DrainSpec pins expression == UDF parity.
  */
object DrainMatchKernel {
  def matchId(m: Drain.Matcher, s: UTF8String): UTF8String =
    UTF8String.fromString(m.matchId(s.toString))

  def matchText(m: Drain.Matcher, s: UTF8String): InternalRow = {
    val (id, tpl) = m.matchText(s.toString)
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(id), UTF8String.fromString(tpl)))
  }
}

/** `graft_drain_match_id(<registry id literal>, text)` → string — the
  * id-only broadcast-dictionary match without the ScalaUDF row-conversion
  * boundary (round-7): the per-row path is tokenize → frozen-tree search →
  * precomputed id, exactly the [[Drain.matchEventIds]] UDF. The broadcast
  * `.value` (a synchronized per-JVM cache lookup — the documented per-row
  * pitfall) resolves once per task: transient lazy val interpreted,
  * null-checked mutable member in generated code.
  */
case class DrainMatchId(child: Expression, bc: Broadcast[Drain.Matcher])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_drain_match_id"

  @transient private lazy val matcher: Drain.Matcher = bc.value

  override protected def nullSafeEval(input: Any): Any =
    DrainMatchKernel.matchId(matcher, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("drainBc", bc,
      classOf[Broadcast[Drain.Matcher]].getName)
    val mVar = ctx.addMutableState(classOf[Drain.Matcher].getName, "drainMatcher")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        if ($mVar == null) {
          $mVar = (${classOf[Drain.Matcher].getName}) $bcRef.value();
        }
        ${ev.value} = graft.expr.DrainMatchKernel.matchId($mVar, ${c.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DrainMatchId =
    copy(child = newChild)
}

/** `graft_drain_match(<registry id literal>, text)` →
  * `struct<event_id string, event_template string>` — the (id, template)
  * match, same contract as [[DrainMatchId]].
  */
case class DrainMatch(child: Expression, bc: Broadcast[Drain.Matcher])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("event_template", StringType, nullable = false)))
  override def prettyName: String = "graft_drain_match"

  @transient private lazy val matcher: Drain.Matcher = bc.value

  override protected def nullSafeEval(input: Any): Any =
    DrainMatchKernel.matchText(matcher, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("drainBc", bc,
      classOf[Broadcast[Drain.Matcher]].getName)
    val mVar = ctx.addMutableState(classOf[Drain.Matcher].getName, "drainMatcher")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        if ($mVar == null) {
          $mVar = (${classOf[Drain.Matcher].getName}) $bcRef.value();
        }
        ${ev.value} = graft.expr.DrainMatchKernel.matchText($mVar, ${c.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DrainMatch =
    copy(child = newChild)
}
