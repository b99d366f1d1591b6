package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.WordPieceVocab

/**
 * Native Catalyst expression: greedy longest-match-first WordPiece
 * encode of a string column against a broadcast [[WordPieceVocab]] →
 * array<string> (semantics at [[graft.functions.WordPiece]]).
 * The [[BpeEncodeExpr]] pattern: broadcast resolves once per task,
 * per-row work is one method call inside WholeStageCodegen.
 */
case class WordPieceEncodeExpr(
    child: Expression, vocab: Broadcast[WordPieceVocab]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def nullSafeEval(input: Any): Any =
    vocab.value.encodeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabClass = classOf[WordPieceVocab].getName
    val bcastRef = ctx.addReferenceObj("wpBcast", vocab,
      classOf[Broadcast[_]].getName)
    val v = ctx.addMutableState(vocabClass, "wpVocab",
      x => s"$x = ($vocabClass)$bcastRef.value();")
    defineCodeGen(ctx, ev, c => s"$v.encodeUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}
