package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{CharNgramsExpr, DotProductExpr, SimHash60Expr}

/**
 * `SparkSessionExtensions` installer: registers the engine's
 * STATELESS native expressions as SQL functions, so a pure-SQL user
 * (`spark.sql(...)`, thrift, notebooks) reaches the same codegen
 * kernels the DataFrame API uses — the library surface the brief's
 * "registered via SparkSessionExtensions" path asks for. Install with
 * `.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`.
 *
 *  - `graft_simhash60(array<string>) → bigint` — the t08 fingerprint;
 *  - `graft_dot(array, array) → double` — the fused float/double dot
 *    kernel behind the cosine family;
 *  - `graft_char_ngrams(string, n) → array<string>` — the O(len)
 *    codepoint n-gram walk behind language ID (n must be a literal:
 *    it parameterizes the generated code).
 *
 * Broadcast-model expressions (BPE encode, Bloom probe, language-ID
 * scoring) are deliberately NOT SQL functions — their model argument
 * is session state a SQL literal cannot carry; they stay DataFrame
 * API entry points.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(tokens) - 60-bit simhash of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash60 takes exactly 1 argument")
        SimHash60Expr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-accumulated dot product of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        DotProductExpr(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams", "graft_char_ngrams(s, n) - all codepoint n-grams of s, in order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_char_ngrams takes exactly 2 arguments")
        args(1) match {
          case Literal(n: Int, IntegerType) => CharNgramsExpr(args.head, n)
          case other => throw new IllegalArgumentException(
            s"graft_char_ngrams: n must be an integer literal, got $other")
        }
      }))
  }
}
