package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding quantization — the storage side of a 100 TB vector store
 * (float32 → int8 is the standard 4× cut taken before indexing).
 *
 * Symmetric per-vector scheme: `scale = max|x_i|`, `q_i =
 * round(x_i / scale * 127)` — every value lands in [-127, 127]
 * (never -128, so negation is always safe on the quantized form) and
 * dequantization is `q_i * scale / 127`. The worst-case
 * reconstruction error is half a quantization step, `scale / 254`.
 *
 * Everything is higher-order column functions
 * (transform/zip_with/aggregate) over the vector column — one
 * codegen'd narrow projection, no UDF, no shuffle. All math runs in
 * double from the widened floats so results are bit-reproducible
 * across engines (the v07 oracle recomputes them in DuckDB).
 */
object Quantize {

  /** PROJECTS to (`idCol`, `v` double-widened vector, `scale`, `q`
    * int8-range longs) — other input columns are dropped, not passed
    * through (join back on `idCol` if metadata is needed downstream);
    * zero vectors quantize to all-zero q. */
  def int8Symmetric(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("scale", scaleExpr("v"))
      .withColumn("q", qExpr("v", "scale"))

  /** The scale/q column forms over a double-widened vector column —
    * exposed so composing operators ([[AnnIndex]]) quantize inline in
    * their own projection instead of joining back through the
    * [[int8Symmetric]] projection. */
  private[operators] def scaleExpr(vCol: String) =
    expr(s"array_max(transform($vCol, x -> abs(x)))")

  private[operators] def qExpr(vCol: String, scaleCol: String) =
    expr(s"""transform($vCol, x -> CASE WHEN $scaleCol = 0D THEN CAST(0 AS BIGINT)
            |ELSE CAST(round(x / $scaleCol * 127) AS BIGINT) END)""".stripMargin)

  /** Per-vector audit summary of [[int8Symmetric]]: dimension,
    * micro-unit scale, an order-weighted integer checksum of q, and
    * the micro-unit max reconstruction error. Integer/micro columns
    * only — hash-exact against an oracle recomputation. */
  def int8SummaryStats(quantized: DataFrame, idCol: String): DataFrame =
    quantized.select(col(idCol),
      size(col("v")).as("dim"),
      round(col("scale") * 1e6).cast("long").as("scale_micro"),
      expr("""aggregate(transform(q, (qi, i) -> qi * (CAST(i AS BIGINT) + 1)),
        |CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin).as("q_checksum"),
      expr("""CAST(floor(array_max(
        |zip_with(v, q, (x, qi) -> abs(x - qi * scale / 127D))) * 1e6) AS BIGINT)""".stripMargin)
        .as("max_err_micro"))
}
