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

  /**
   * DELETE by id — append-only tombstones (`tombstones/`), the
   * LSM/FAISS-IDSelector pattern: the store's cell files are never
   * touched (at 100 TB a delete that rewrote cell parquet would cost
   * a compaction per call). Both search paths anti-join the scan
   * against the tombstone set, so deletion is visible immediately;
   * [[rebalance]] later applies tombstones physically and clears the
   * table. A tombstoned id stays dead until then — re-upserting it
   * before a rebalance is invisible to searches (document-level
   * re-adds are a rebalance-then-upsert sequence, not a hot path).
   */
  def delete(path: String, ids: DataFrame): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$path/tombstones")

  /** The live tombstone set, or None when nothing was ever deleted. */
  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Anti-join a store/codes scan against the tombstones (no-op when
    * none exist). The tombstone side is id-only and delete-sized —
    * at scale AQE broadcasts it, so the scan pays one map-side probe,
    * never a shuffle of the store. */
  private def minusTombstones(
      spark: SparkSession, path: String, scan: DataFrame): DataFrame =
    tombstones(spark, path).fold(scan)(t =>
      scan.join(broadcast(t.select(col("id")).distinct()), Seq("id"), "left_anti"))

  /** One store-maintenance summary from [[rebalance]]. */
  final case class RebalanceReport(
      rows: Long, removed: Long, cells: Long,
      maxCellFilesBefore: Long, maxCellFilesAfter: Long)

  /**
   * Physical store maintenance — the compaction half of the delete
   * story plus the answer to upsert drift. In ONE rewrite pass:
   * tombstones are applied (rows dropped for real), every surviving
   * vector is RE-ASSIGNED against the persisted coarse quantizer
   * (so rows appended under any stale centroid snapshot are
   * corrected — the quantizer itself is NEVER retrained here;
   * retraining is an explicit [[write]]), each cell is compacted to
   * one parquet file (a thousand skewed upserts otherwise leave a
   * thousand tiny files per hot cell — file-count skew, the 100 TB
   * small-files killer), and the PQ codes table (when present) is
   * re-encoded from the surviving float vectors under the persisted
   * codebooks. Tombstones are cleared afterwards.
   *
   * The rewrite goes to `store.tmp` then swaps directories — the
   * store is never read and overwritten in place.
   */
  def rebalance(spark: SparkSession, path: String, dim: Int = 0): RebalanceReport = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    def cellFiles(sub: String): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(d)) Map.empty
      else fs.listStatus(d).filter(_.isDirectory).map { cell =>
        cell.getPath.getName ->
          fs.listStatus(cell.getPath).count(_.getPath.getName.endsWith(".parquet")).toLong
      }.toMap
    }
    def swap(sub: String, rewrite: String => Unit): Unit = {
      val tmp = s"$path/$sub.tmp"
      rewrite(tmp)
      val dst = new org.apache.hadoop.fs.Path(s"$path/$sub")
      fs.delete(dst, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
        s"rebalance: rename $tmp -> $dst failed")
    }
    val before = cellFiles("store")
    val total = spark.read.parquet(s"$path/store").count()
    val centroids = readCentroids(spark, path)
    val hasCodes = fs.exists(new org.apache.hadoop.fs.Path(s"$path/pq_codebooks"))
    if (hasCodes) {
      require(dim > 0, "rebalance of a PQ-coded index needs the vector dim")
      // the FLOAT store is the source of truth for re-encoding: a
      // codes row whose id is absent from the store (upsertPqCodes
      // without the matching upsert) would be silently dropped by the
      // rewrite — fail loudly instead of losing vectors. Checked
      // against the PRE-tombstone store: tombstoned ids are legal in
      // codes, they just die in both tables.
      val orphans = spark.read.parquet(s"$path/codes").select("id")
        .join(spark.read.parquet(s"$path/store").select("id"), Seq("id"), "left_anti")
        .count()
      require(orphans == 0L,
        s"rebalance: $orphans code rows have no float-store row — " +
          "upsertPqCodes batches must also be upsert()ed before a rebalance")
    }
    val survivors = minusTombstones(spark, path,
      spark.read.parquet(s"$path/store").select("id", "vec"))
    val kept = survivors.count()
    swap("store", tmp =>
      assigned(centroids, survivors)
        .repartition(col("cluster")) // one task per cell → one file per cell
        .write.mode("overwrite").partitionBy("cluster").parquet(tmp))
    if (hasCodes) {
      val codebooks = readPqCodebooks(spark, path)
      swap("codes", tmp =>
        encodeBatch(centroids, codebooks, dim,
            spark.read.parquet(s"$path/store").select("id", "vec"))
          .repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(tmp))
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
    val after = cellFiles("store")
    RebalanceReport(kept, total - kept, after.size.toLong,
      if (before.isEmpty) 0L else before.values.max,
      if (after.isEmpty) 0L else after.values.max)
  }

  /** IVF top-k over the persisted store — assignment was paid at
    * write/upsert time, so this is just the probe join. `where` is the
    * float-store twin of [[topKPq]]'s filtered search: the metadata
    * predicate rides the RAW store scan (pushed to the parquet
    * reader), so the top-k ranks exactly the qualifying candidates —
    * pre-filtering semantics. */
  def topK(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val centroids = readCentroids(spark, path)
    val raw = minusTombstones(spark, path, spark.read.parquet(s"$path/store"))
    val cb = where.fold(raw)(raw.filter)
      .select(col("id"), col("vec"), col("__cn"), col("cluster").cast("int"))
    SimilaritySearch.ivfSearchAssigned(queries, cb, centroids, k, nprobe)
  }

  def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cluster").collect()
      .map(_.getSeq[Float](1).toArray)

  // ---- PQ layer: codes-only search over the persisted index ----
  //
  // `pq_codebooks/` — (subspace int, cluster int, centroid
  // array<float>): the m×ksub sub-quantizers, KB-sized, collected
  // driver-side on read exactly like the coarse centroids.
  // `codes/` — (id, code0..code{m-1}) PARTITIONED BY cluster: the
  // 100 TB scan side. m ints per vector instead of dim floats (a 64×
  // byte cut at dim=64/m=4) AND nprobe directory pruning — a query
  // touches nprobe cells × m ints, the float store never loads.

  /** Train PQ codebooks on `candidates` and persist codebooks + the
    * cell-partitioned codes table. Requires [[write]] to have run (the
    * coarse quantizer is read from `path`). Returns the codebooks. */
  def writePqCodes(
      path: String, candidates: DataFrame,
      dim: Int, m: Int, ksub: Int, iters: Int): Array[Array[Array[Float]]] = {
    val spark = candidates.sparkSession
    val codebooks = SimilaritySearch.trainPqCodebooks(candidates, dim, m, ksub, iters)
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (v, c) => (s, c, v.toSeq) }
    }.toSeq.toDF("subspace", "cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pq_codebooks")
    encodeBatch(readCentroids(spark, path), codebooks, dim, candidates)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/codes")
    codebooks
  }

  /** Encode a NEW batch against the persisted coarse quantizer AND
    * sub-quantizers, appending its cells — the PQ side of [[upsert]]. */
  def upsertPqCodes(path: String, batch: DataFrame, dim: Int): Unit = {
    val spark = batch.sparkSession
    encodeBatch(readCentroids(spark, path), readPqCodebooks(spark, path), dim, batch)
      .write.mode("append").partitionBy("cluster").parquet(s"$path/codes")
  }

  /** IVFPQ top-k over the persisted codes table: nprobe directory
    * pruning on `cluster`, ADC scoring via the per-query LUT — the
    * disk-resident twin of [[SimilaritySearch.ivfPqTopK]].
    *
    * `where` is FILTERED ANN search: a metadata predicate over the
    * codes table's columns (`id`, `cluster`, or any metadata column a
    * caller persists alongside the codes) applied to the RAW scan —
    * before the probe join and the ranking — so Catalyst pushes it
    * into the parquet reader (`PushedFilters`, plan-audited). The
    * top-k is then computed OVER the filtered candidate set
    * (pre-filtering semantics): every returned neighbor satisfies the
    * predicate and ranking quality never degrades the way
    * post-filtering a k-sized result would (where k survivors of an
    * unfiltered top-k could be fewer than k). At 100 TB the predicate
    * prunes row groups inside each probed cell directory — the filter
    * rides the same scan, costing nothing extra. */
  def topKPq(
      spark: SparkSession, path: String, queries: DataFrame,
      dim: Int, k: Int, nprobe: Int,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val centroids = readCentroids(spark, path)
    val codebooks = readPqCodebooks(spark, path)
    val m = codebooks.length
    val raw = minusTombstones(spark, path, spark.read.parquet(s"$path/codes"))
    val codes = where.fold(raw)(raw.filter)
      .select(col("id") +: col("cluster").cast("int").as("cluster") +:
        (0 until m).map(s => col(s"code$s")): _*)
    val qlut = SimilaritySearch.pqQueryLut(
      queries.withColumn("__pn", VectorFunctions.l2Norm(col("query_vec")))
        .withColumn("cluster", explode(
          SimilaritySearch.probeExpr(centroids, col("query_vec"), col("__pn"), nprobe)))
        .drop("__pn"),
      codebooks, dim, keep = Seq(col("cluster")))
    SimilaritySearch.adcRank(
      codes.join(broadcast(qlut), Seq("cluster"))
        .filter(col("query_id") =!= col("id")),
      codebooks, k)
  }

  def readPqCodebooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] =
    spark.read.parquet(s"$path/pq_codebooks")
      .orderBy("subspace", "cluster").collect()
      .foldLeft(Vector.empty[Vector[Array[Float]]]) { (acc, r) =>
        val s = r.getInt(0)
        val v = r.getSeq[Float](2).toArray
        if (s == acc.length) acc :+ Vector(v) else acc.updated(s, acc(s) :+ v)
      }.map(_.toArray).toArray

  /** Coarse cell + all m codes for one batch, ONE narrow projection. */
  private def encodeBatch(
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
      dim: Int, batch: DataFrame): DataFrame =
    SimilaritySearch.pqEncode(
      batch
        .withColumn("__vn", VectorFunctions.l2Norm(col("vec")))
        .withColumn("cluster", SimilaritySearch.assignExpr(centroids, col("vec"), col("__vn"))),
      codebooks, dim, keep = Seq("cluster"))

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
