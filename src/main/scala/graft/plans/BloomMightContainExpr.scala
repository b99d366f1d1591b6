package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Native Catalyst expression testing a 64-bit fingerprint against a
 * broadcast [[BloomFilter]] — the membership probe of
 * [[graft.operators.Dedup.incrementalDedupBloom]]'s prefilter stage.
 *
 * Replaces a per-row Scala UDF (VERDICT r8: "breaks codegen in an
 * otherwise map-only stage"): Spark exposes no public `might_contain`
 * column function, so this follows the [[SimHash60Expr]] pattern. The
 * generated code resolves the broadcast ONCE per task into a mutable
 * field and probes it with a plain method call per row, so the
 * prefilter projection stays inside WholeStageCodegen — no UDF
 * closure, no boxing of the hash long.
 */
case class BloomMightContainExpr(
    child: Expression, bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcastRef = ctx.addReferenceObj("bloomBcast", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per task, not once per row
    val bf = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"$v = ($bfClass)$bcastRef.value();")
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Column wrapper (classic-session expression bridge). */
  def mightContain(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContainExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(hash), bloom))
}
