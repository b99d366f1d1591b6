package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector math over `array<float>` columns, built on Spark's
 * higher-order functions (`zip_with`/`aggregate`/`transform`) so the
 * arithmetic runs inside codegen with no UDF boundary — the right
 * shape for a 100 TB ANN scan.
 *
 * All accumulation is in double, left-to-right over the array, which
 * both keeps precision at dim≈10³ and matches the sequential order an
 * external oracle computes in.
 */
object VectorFunctions {

  /** Dot product, accumulated in double, left-to-right — a native
    * codegen kernel ([[graft.plans.DotProductExpr]]); bit-identical
    * to the previous zip_with+aggregate form but without the
    * 64-element intermediate array per invocation that dominated the
    * brute-force pair profile. */
  def dot(a: Column, b: Column): Column = graft.plans.DotProductExpr.dot(a, b)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    ScalarFunctions.safeDiv(dot(a, b), l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Deterministic pseudo-random hyperplane in [-0.5, 0.5)^dim, derived
    * from md5 so it is stable across runs with no RNG state to ship. */
  def hyperplane(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      PortableHash.md5Long(s"plane:$seed:$j").toDouble / Math.pow(2.0, 60) - 0.5
    }

  /**
   * Sign-LSH bucket id: the sign bits of `numPlanes` hyperplane
   * projections, packed into a long. Planes are computed once on the
   * driver and embedded as array literals; each row costs
   * `numPlanes` codegen'd fused dot products — no UDF, no shuffle.
   * Vectors in the same bucket are cosine-close with high probability,
   * so a near-dup / ANN pass only joins within buckets instead of
   * all-pairs (the 100 TB path).
   */
  def signLshBucket(vec: Column, dim: Int, numPlanes: Int): Column = {
    require(numPlanes <= 62, "bucket packed into a signed long")
    val bits = (0 until numPlanes).map { p =>
      val plane = typedlit(hyperplane(p, dim))
      val proj = dot(vec, plane)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
