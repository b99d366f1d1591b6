package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Broadcastable language-ID scoring model: gram → per-language rank
 * vector (one entry per language in [[langs]] order), absent gram →
 * `penalty` for every language. [[distsUtf8]] walks the CANONICAL
 * text's codepoint n-grams once and accumulates all |langs| sums in
 * one pass with O(1) hash lookups — the native replacement for the
 * interpreted nested-HOF fold that cost ~10 ms/row (measured 14.5 s
 * for 5k docs at sf0.1; this path runs the same corpus in well under
 * a second).
 *
 * Gram extraction is CODEPOINT-based (`codePointAt` stepping), the
 * exact semantics of the column form `substr(s, i, n)` /
 * `length(s)` and of the DuckDB oracle's `substr` — UTF-16 indexing
 * would drift on supplementary characters.
 */
case class LangIdModel(
    langs: Seq[String], n: Int, penalty: Long, ranks: Map[String, Seq[Long]]) {

  @transient private lazy val jmap: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](ranks.size * 2)
    ranks.foreach { case (g, rs) => m.put(g, rs.toArray) }
    m
  }

  def distsUtf8(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val l = langs.size
    val acc = new Array[Long](l)
    // codepoint start offsets (UTF-16 indices)
    var cp = 0
    var i = 0
    val starts = new Array[Int](str.length + 1)
    while (i < str.length) {
      starts(cp) = i
      i += Character.charCount(str.codePointAt(i))
      cp += 1
    }
    starts(cp) = str.length
    var g = 0
    while (g + n <= cp) {
      val rs = jmap.get(str.substring(starts(g), starts(g + n)))
      var j = 0
      if (rs == null) { while (j < l) { acc(j) += penalty; j += 1 } }
      else { while (j < l) { acc(j) += rs(j); j += 1 } }
      g += 1
    }
    new GenericArrayData(acc.map(x => x: Any))
  }
}

/** Native codepoint n-gram extraction — array<string> of every
  * length-`n` codepoint window, one O(len) walk. The column form
  * (`transform(sequence(...), i -> substr(s, i, n))`) is O(len²):
  * each `substr` rescans the UTF-8 bytes from the start to locate
  * codepoint `i`, which at ~2 KB documents costs ~10 s across a 5k-doc
  * corpus before any scoring happens. Same output semantics. */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.ngramsUtf8(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharNgramsExpr.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.ngramsUtf8($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgramsExpr {
  def ngramsUtf8(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString
    var cp = 0
    var i = 0
    val starts = new Array[Int](str.length + 1)
    while (i < str.length) {
      starts(cp) = i
      i += Character.charCount(str.codePointAt(i))
      cp += 1
    }
    starts(cp) = str.length
    val count = math.max(0, cp - n + 1)
    val out = new Array[Any](count)
    var g = 0
    while (g < count) {
      out(g) = UTF8String.fromString(str.substring(starts(g), starts(g + n)))
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native per-row scoring against a broadcast [[LangIdModel]] —
  * array<long> of per-language summed ranks. Follows the
  * [[BpeEncodeExpr]] pattern: broadcast resolves once per task into a
  * mutable field, the row work is one method call, the stage stays in
  * WholeStageCodegen. */
case class LangIdDistsExpr(
    child: Expression, model: Broadcast[LangIdModel]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"langid_dists requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "langid_dists"

  override def nullSafeEval(input: Any): Any =
    model.value.distsUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelClass = classOf[LangIdModel].getName
    val bcastRef = ctx.addReferenceObj("langidBcast", model,
      classOf[Broadcast[_]].getName)
    val m = ctx.addMutableState(modelClass, "langidModel",
      x => s"$x = ($modelClass)$bcastRef.value();")
    defineCodeGen(ctx, ev, c => s"$m.distsUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdDistsExpr =
    copy(child = newChild)
}
