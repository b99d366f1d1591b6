package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeVocab

/**
 * Native Catalyst expression: greedy-priority BPE encode of a string
 * column against a broadcast [[BpeVocab]] → array<string> of subword
 * tokens (semantics defined at [[graft.functions.Bpe]]).
 *
 * Follows the [[BloomMightContainExpr]] pattern: the broadcast vocab
 * resolves ONCE per task into a mutable field and the per-row work is
 * a plain method call, so tokenize-then-aggregate stages (chunking,
 * packing, budget selection) stay inside WholeStageCodegen — no UDF
 * closure, no per-row vocab deserialization.
 */
case class BpeEncodeExpr(
    child: Expression, vocab: Broadcast[BpeVocab]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    vocab.value.encodeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabClass = classOf[BpeVocab].getName
    val bcastRef = ctx.addReferenceObj("bpeBcast", vocab,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per task, not once per row
    val v = ctx.addMutableState(vocabClass, "bpeVocab",
      x => s"$x = ($vocabClass)$bcastRef.value();")
    defineCodeGen(ctx, ev, c => s"$v.encodeUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
