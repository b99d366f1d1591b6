package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted IVF index with incremental maintenance — the missing
 * lifecycle half of [[SimilaritySearch.ivfTopK]]: train once, write
 * the coarse quantizer + the cell-assigned (and int8-quantized)
 * vector store to parquet, then UPSERT new batches against the
 * persisted centroids without retraining — the same
 * history-index pattern as [[Dedup.incrementalNearDupLsh]]'s banded
 * history table.
 *
 * Layout under `path`:
 *  - `centroids/` — (cluster int, centroid array<float>): the KB-sized
 *    coarse quantizer, collected driver-side on read (same size class
 *    as the literal centroids [[SimilaritySearch]] embeds in codegen);
 *  - `store/` — (id, vec, scale, q) PARTITIONED BY cluster: one
 *    parquet partition per Voronoi cell. At 100 TB this is the
 *    point: a query's `nprobe` cells prune to `nprobe` partition
 *    directories (static pruning — the probed cluster ids are
 *    literals by the time the scan plans), and an upsert only
 *    APPENDS new cell files, never rewrites the store. The int8
 *    columns ([[Quantize.int8Symmetric]]) ride along so the
 *    storage-side 4× cut (v07/v08) is available without re-reading
 *    float vectors.
 *
 * Assignment at write and upsert time uses the identical
 * `assignExpr` argmax (cosine, ties to the lower cluster index) the
 * in-memory path uses, so a search over the reloaded store is
 * bit-equal to [[SimilaritySearch.ivfTopK]] with the same training
 * set — the `v09` oracle and `AnnIndexSpec` pin both.
 */
object AnnIndex {

  /** Train the coarse quantizer on `candidates` (= (id, vec)) and
    * write centroids + the assigned, quantized store. Returns the
    * trained centroids. */
  def write(
      path: String, candidates: DataFrame,
      numClusters: Int, iters: Int): Array[Array[Float]] = {
    val spark = candidates.sparkSession
    val centroids =
      SimilaritySearch.trainIvfCentroids(candidates, numClusters, iters)
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    assigned(centroids, candidates)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/store")
    centroids
  }

  /** Assign a NEW batch (= (id, vec)) to the persisted centroids and
    * append its cells — incremental maintenance without retraining
    * (periodic re-training is a full [[write]]). */
  def upsert(path: String, batch: DataFrame): Unit =
    assigned(readCentroids(batch.sparkSession, path), batch)
      .write.mode("append").partitionBy("cluster").parquet(s"$path/store")

  /** IVF top-k over the persisted store — assignment was paid at
    * write/upsert time, so this is just the probe join. */
  def topK(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val centroids = readCentroids(spark, path)
    val cb = spark.read.parquet(s"$path/store")
      .select(col("id"), col("vec"), col("__cn"), col("cluster").cast("int"))
    SimilaritySearch.ivfSearchAssigned(queries, cb, centroids, k, nprobe)
  }

  def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cluster").collect()
      .map(_.getSeq[Float](1).toArray)

  /** Cell assignment + norm + int8 columns for one batch — ONE
    * map-only projection (no join-back through the quantizer: its
    * column forms compose inline). The norm is persisted, not
    * recomputed per query — it is part of the index. */
  private def assigned(
      centroids: Array[Array[Float]], batch: DataFrame): DataFrame =
    batch
      .withColumn("__cn", VectorFunctions.l2Norm(col("vec")))
      .withColumn("cluster",
        SimilaritySearch.assignExpr(centroids, col("vec"), col("__cn")))
      .withColumn("__vd", expr("transform(vec, x -> CAST(x AS DOUBLE))"))
      .withColumn("scale", Quantize.scaleExpr("__vd"))
      .withColumn("q", Quantize.qExpr("__vd", "scale"))
      .select("id", "vec", "__cn", "scale", "q", "cluster")
}
