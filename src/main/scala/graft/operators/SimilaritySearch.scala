package graft.operators

import graft.functions.VectorFunctions
import graft.plans.TopKAgg
import org.apache.spark.sql.{DataFrame, Row}
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
   * IVF coarse quantizer training — deterministic KMeans: centroids
   * seed from the `numClusters` smallest candidate ids (reproducible
   * across runs, unlike random init), refined by `iters` Lloyd
   * passes. Each pass is two hash aggregations (assign via broadcast
   * argmax-cosine, re-center via per-dimension mean over the exploded
   * vectors) — no driver-side loops over rows; only the KB-sized
   * centroid table ever reaches the driver.
   */
  def trainIvfCentroids(
      candidates: DataFrame, // (id, vec)
      numClusters: Int,
      iters: Int): Array[Array[Float]] = {
    val spark = candidates.sparkSession
    var centroids: Array[Array[Float]] = candidates.orderBy("id").limit(numClusters)
      .select("vec").collect()
      .map(_.getSeq[Float](0).toArray)

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assignUdf = udf((v: Seq[Float]) => nearestCentroid(bc.value, v.toArray))
      val means = candidates
        .withColumn("cluster", assignUdf(col("vec")))
        .select(col("cluster"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg("x").as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Row](1).map(_.getDouble(1).toFloat).toArray)
        .toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** argmax-cosine centroid index; ties go to the lower index. */
  private def nearestCentroid(cents: Array[Array[Float]], v: Array[Float]): Int = {
    var best = -2.0; var bestI = 0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var d = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      val n = math.min(c.length, v.length)
      while (j < n) { d += c(j) * v(j); na += c(j) * c(j); nb += v(j) * v(j); j += 1 }
      val cos = if (na > 0 && nb > 0) d / math.sqrt(na * nb) else -1.0
      if (cos > best) { best = cos; bestI = i }
      i += 1
    }
    bestI
  }

  /** nprobe nearest centroid indices for a query vector. */
  private def probeList(cents: Array[Array[Float]], v: Array[Float], nprobe: Int): Seq[Int] = {
    cents.indices
      .map { i =>
        val c = cents(i)
        var d = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        val n = math.min(c.length, v.length)
        while (j < n) { d += c(j) * v(j); na += c(j) * c(j); nb += v(j) * v(j); j += 1 }
        i -> (if (na > 0 && nb > 0) d / math.sqrt(na * nb) else -1.0)
      }
      .sortBy { case (i, cos) => (-cos, i) }
      .take(nprobe).map(_._1)
  }

  /**
   * IVF-bucketed ANN (the classic inverted-file scale path,
   * complementing [[lshTopK]]): candidates partition into
   * `numClusters` Voronoi cells of the trained coarse quantizer; each
   * query scans only its `nprobe` nearest cells. Cell assignment is a
   * map-side broadcast UDF; the probe join is a bucketed equi-join —
   * at 100 TB the candidate side shuffles once on cluster id (or not
   * at all if pre-partitioned by cell at ingest), and per-query cost
   * is |cell|·nprobe instead of |candidates|.
   */
  def ivfTopK(
      queries: DataFrame, // (query_id, query_vec)
      candidates: DataFrame, // (id, vec)
      numClusters: Int,
      iters: Int,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val spark = candidates.sparkSession
    val centroids = trainIvfCentroids(candidates, numClusters, iters)
    val bc = spark.sparkContext.broadcast(centroids)

    val assignUdf = udf((v: Seq[Float]) => nearestCentroid(bc.value, v.toArray))
    val probeUdf = udf((v: Seq[Float]) => probeList(bc.value, v.toArray, nprobe))

    val cb = candidates.withColumn("cluster", assignUdf(col("vec")))
    val qprobed = queries
      .withColumn("cluster", explode(probeUdf(col("query_vec"))))
    val scored = cb
      .join(broadcast(qprobed), Seq("cluster"))
      .filter(col("query_id") =!= col("id"))
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
