package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Shapes:
 *  - [[bruteForceTopK]]: exact baseline. The (small) query set is
 *    broadcast against the candidate scan, so the big side is read
 *    exactly once with no shuffle — this is the correct "brute force"
 *    even at 100 TB (cost = one pass × |queries| dot products/row).
 *  - [[lshTopK]]: sign-LSH bucketed search; candidates are only the
 *    rows whose bucket matches the query's (plus optional multi-probe
 *    neighbors), trading recall for a |bucket|-sized probe.
 */
object SimilaritySearch {

  /** Exact top-k by cosine for each query vector. `queries` must be
    * broadcast-sized (it is hinted); ties broken by candidate id for
    * determinism. */
  def bruteForceTopK(
      queries: DataFrame, // (query_id, query_vec)
      candidates: DataFrame, // (id, vec)
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val scored = candidates
      .join(broadcast(queries), if (excludeSelf) col("query_id") =!= col("id") else lit(true))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_vec"), col("vec")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /**
   * LSH-bucketed ANN: both sides keyed by sign-LSH bucket; each query
   * only scans its own bucket (`probes` > 1 additionally probes the
   * nearest buckets by flipping the lowest-projection bits — here
   * approximated by Hamming-1 neighbors of the bucket id, the standard
   * multi-probe trick). Output schema matches [[bruteForceTopK]];
   * recall < 1 by construction.
   */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      dim: Int,
      numPlanes: Int,
      k: Int,
      probes: Int = 1): DataFrame = {
    val qb = queries.withColumn(
      "qbucket", VectorFunctions.signLshBucket(col("query_vec"), dim, numPlanes))
    // multi-probe: query bucket plus Hamming-1 flips, as an exploded list
    val probeBuckets =
      if (probes <= 1) array(col("qbucket"))
      else array((Seq(col("qbucket")) ++
        (0 until math.min(probes - 1, numPlanes)).map(i =>
          col("qbucket").bitwiseXOR(lit(1L << i)))): _*)
    val qprobed = qb
      .withColumn("bucket", explode(probeBuckets))
      .drop("qbucket")
    val cb = candidates.withColumn(
      "bucket", VectorFunctions.signLshBucket(col("vec"), dim, numPlanes))
    val scored = cb
      .join(broadcast(qprobed), Seq("bucket"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos", round(VectorFunctions.cosine(col("query_vec"), col("vec")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }
}
