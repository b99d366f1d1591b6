package graft.operators

import graft.functions.VectorFunctions
import graft.plans.TopKAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Shapes:
 *  - [[bruteForceTopK]]: exact baseline. The (small) query set is
 *    broadcast against the candidate scan, so the big side is read
 *    exactly once with no shuffle — the correct "brute force" even at
 *    100 TB (cost = one pass × |queries| dot products/row).
 *  - [[lshTopK]]: sign-LSH bucketed search; candidates are only the
 *    rows whose bucket matches the query's (plus optional multi-probe
 *    neighbors), trading recall for a |bucket|-sized probe.
 *
 * Ranking is a bounded top-k aggregation ([[TopKAgg]]), NOT a
 * `row_number` window: the window form shuffles every scored
 * (query, candidate) row onto |queries| reducers — skew by
 * construction at scale. The aggregator's map-side combine caps the
 * shuffle at k rows per (query, partition).
 */
object SimilaritySearch {

  /** (query_id, rank, id, cos) from (query_id, array<struct>) top lists. */
  private def unpack(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "top")))
      .select(
        col("query_id"),
        (col("pos") + 1).as("rank"),
        col("top.id").as("id"),
        col("top.score").as("cos"))

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
    val topk = TopKAgg.topK(k)
    unpack(scored.groupBy("query_id").agg(topk(col("cos"), col("id")).as("tops")))
  }

  /**
   * LSH-bucketed ANN: both sides keyed by sign-LSH bucket; each query
   * only scans its own bucket (`probes` > 1 additionally probes the
   * Hamming-1 neighbor buckets — the standard multi-probe trick).
   * Output schema matches [[bruteForceTopK]]; recall < 1 by
   * construction.
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
    val topk = TopKAgg.topK(k)
    // distinct (query,id) first: multi-probe can score a pair twice
    val dedup = scored.select("query_id", "id", "cos").distinct()
    unpack(dedup.groupBy("query_id").agg(topk(col("cos"), col("id")).as("tops")))
  }
}
