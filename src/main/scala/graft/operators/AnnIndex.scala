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
 *  - `centroids/v<C>` — (cluster int, centroid array<float>): the
 *    KB-sized coarse quantizer, collected driver-side on read (same
 *    size class as the literal centroids [[SimilaritySearch]] embeds
 *    in codegen). Versioned through the manifest like every other
 *    table: a re-train writes `v<C+1>` and publishes it in the SAME
 *    commit as its store, so probe pruning can never use centroids
 *    from one training run against cells partitioned by another;
 *  - `store/v<N>/` — (id, vec, scale, q) PARTITIONED BY cluster: one
 *    parquet partition per Voronoi cell. At 100 TB this is the
 *    point: a query's `nprobe` cells prune to `nprobe` partition
 *    directories (static pruning — the probed cluster ids are
 *    literals by the time the scan plans), and an upsert only
 *    APPENDS new cell files, never rewrites the store. The int8
 *    columns ([[Quantize.int8Symmetric]]) ride along so the
 *    storage-side 4× cut (v07/v08) is available without re-reading
 *    float vectors.
 *  - `manifest/m<K>` — the pointer-commit log (the Delta-log /
 *    HBase-CURRENT pattern, public practice): each file is one
 *    complete `(store version, codes version)` pair, written to a
 *    dot-tmp name and RENAMED into place — one rename = one atomic
 *    commit. Readers resolve max-K once per operation, so every scan
 *    in that operation sees ONE consistent (store, codes) snapshot:
 *    [[rebalance]] can rewrite BOTH tables and publish them in a
 *    single commit, with no window where a concurrent reader sees a
 *    missing store or new floats paired with stale PQ codes. A crash
 *    before the commit leaves only unreferenced `v<N+1>` directories
 *    (invisible to readers; clobbered by the next maintenance run).
 *
 * Assignment at write and upsert time uses the identical
 * `assignExpr` argmax (cosine, ties to the lower cluster index) the
 * in-memory path uses, so a search over the reloaded store is
 * bit-equal to [[SimilaritySearch.ivfTopK]] with the same training
 * set — the `v09` oracle and `AnnIndexSpec` pin both.
 */
object AnnIndex {

  // The manifest mechanics live in [[graft.io.StoreManifest]] (shared
  // with the persisted text-dedup index). AnnIndex's snapshot is
  // (store → N, codes → M, centroids → C, pq_codebooks → B) — EVERY
  // table a search touches is versioned and resolved from ONE manifest
  // read, so a reader concurrent with maintenance can never pair new
  // centroids with an old store (or vice versa). codes/books = 0
  // means no PQ layer has been published under THIS coarse quantizer.
  private final case class Manifest(store: Int, codes: Int, cents: Int, books: Int)

  private def fsOf(spark: SparkSession, path: String) =
    graft.io.StoreManifest.fsOf(spark, path)

  private def readManifest(spark: SparkSession, path: String): Option[Manifest] =
    graft.io.StoreManifest.read(spark, path)
      .map(m => Manifest(m("store"), m.getOrElse("codes", 0),
        m.getOrElse("centroids", 0), m.getOrElse("pq_codebooks", 0)))

  private def current(spark: SparkSession, path: String): Manifest =
    readManifest(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not an AnnIndex (no committed manifest) — run write() first"))

  private def commitManifest(spark: SparkSession, path: String, m: Manifest): Unit =
    graft.io.StoreManifest.commit(spark, path,
      Map("store" -> m.store, "codes" -> m.codes,
        "centroids" -> m.cents, "pq_codebooks" -> m.books))

  // centroids = 0 in the manifest is a pre-versioning store (legacy
  // unversioned `centroids/` dir) — read it where it lies; every NEW
  // commit publishes `centroids/v<C>` through the manifest.
  private def centroidsDir(path: String, m: Manifest): String =
    if (m.cents > 0) s"$path/centroids/v${m.cents}" else s"$path/centroids"

  private def codebooksDir(path: String, m: Manifest): String =
    if (m.books > 0) s"$path/pq_codebooks/v${m.books}" else s"$path/pq_codebooks"

  /** The CURRENTLY COMMITTED store directory — exposed so tests/tools
    * can inspect the physical layout without re-implementing manifest
    * resolution. */
  def currentStoreDir(spark: SparkSession, path: String): String =
    s"$path/store/v${current(spark, path).store}"

  /** The currently committed PQ codes directory (requires
    * [[writePqCodes]] to have committed one). */
  def currentCodesDir(spark: SparkSession, path: String): String = {
    val m = current(spark, path)
    require(m.codes > 0, s"$path has no committed PQ codes table")
    s"$path/codes/v${m.codes}"
  }

  /** Train the coarse quantizer on `candidates` (= (id, vec)) and
    * write centroids + the assigned, quantized store, published as ONE
    * manifest commit. Returns the trained centroids. A re-train on an
    * existing index publishes FRESH centroids+store versions (readers
    * on the old snapshot are undisturbed until the commit) and RESETS
    * the PQ layer to 0: old codes were encoded and cell-partitioned
    * under the old centroids, so pairing them with the new quantizer
    * would be silently wrong — [[topKPq]] instead fails loudly until
    * [[writePqCodes]] re-runs against the new store. */
  def write(
      path: String, candidates: DataFrame,
      numClusters: Int, iters: Int): Array[Array[Float]] = {
    val spark = candidates.sparkSession
    val centroids =
      SimilaritySearch.trainIvfCentroids(candidates, numClusters, iters)
    import spark.implicits._
    val prev = readManifest(spark, path)
    val cv = prev.fold(1)(_.cents + 1)
    val v = prev.fold(1)(_.store + 1)
    // the centroid and store writes are independent jobs into
    // different directories — overlapped (guide §2.6). The store
    // hash-repartitions by cell before the write (the rebalance
    // layout): the bulk build writes one file per cell from one task
    // per cell, instead of the whole assign+quantize projection
    // running inside the (locally single-split) scan task — and at
    // any scale it IS the write.distribution-mode=hash discipline
    // (guide §6): cluster the store by its partition key so a cell is
    // one file, not one file per upstream task
    graft.util.Jobs.inParallel(Seq(
      () => centroids.zipWithIndex.map { case (cvec, i) => (i, cvec.toSeq) }.toSeq
        .toDF("cluster", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/centroids/v$cv"),
      () => assigned(centroids, candidates)
        .repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/store/v$v")))
    commitManifest(spark, path, Manifest(v, codes = 0, cents = cv, books = 0))
    // post-commit hygiene: a re-train on a long-lived path must not
    // accumulate superseded versions (grace window inside)
    Seq("store", "centroids", "codes", "pq_codebooks")
      .foreach(graft.io.StoreManifest.dropSuperseded(spark, path, _))
    centroids
  }

  /** Assign a NEW batch (= (id, vec)) to the persisted centroids and
    * append its cells — incremental maintenance without retraining
    * (periodic re-training is a full [[write]]). An append into the
    * CURRENT store version needs no manifest commit: parquet appends
    * are themselves task-committed files. */
  def upsert(path: String, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val m = current(spark, path) // ONE snapshot: centroids + store agree
    assigned(readCentroidsAt(spark, path, m), batch)
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$path/store/v${m.store}")
  }

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
   * The rewrite goes to FRESH `store/v<N+1>` (and `codes/v<M+1>`)
   * directories, then both are published in ONE manifest commit — the
   * committed snapshot is never read and overwritten in place, a
   * concurrent reader resolves either the old pair or the new pair
   * (never a missing store, never new floats with stale codes), and a
   * crash before the commit leaves the old snapshot live (the
   * orphaned v<N+1> directories are clobbered by the next run's
   * overwrite-mode write).
   */
  def rebalance(spark: SparkSession, path: String, dim: Int = 0): RebalanceReport = {
    val fs = fsOf(spark, path)
    def cellFiles(dir: String): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(d)) Map.empty
      else fs.listStatus(d).filter(_.isDirectory).map { cell =>
        cell.getPath.getName ->
          fs.listStatus(cell.getPath).count(_.getPath.getName.endsWith(".parquet")).toLong
      }.toMap
    }
    val cur = current(spark, path)
    val storeCur = s"$path/store/v${cur.store}"
    val before = cellFiles(storeCur)
    val total = spark.read.parquet(storeCur).count()
    val centroids = readCentroidsAt(spark, path, cur)
    val hasCodes = cur.codes > 0
    if (hasCodes) {
      require(dim > 0, "rebalance of a PQ-coded index needs the vector dim")
      // the FLOAT store is the source of truth for re-encoding: a
      // codes row whose id is absent from the store (upsertPqCodes
      // without the matching upsert) would be silently dropped by the
      // rewrite — fail loudly instead of losing vectors. Checked
      // against the PRE-tombstone store: tombstoned ids are legal in
      // codes, they just die in both tables.
      val orphans = spark.read.parquet(s"$path/codes/v${cur.codes}").select("id")
        .join(spark.read.parquet(storeCur).select("id"), Seq("id"), "left_anti")
        .count()
      require(orphans == 0L,
        s"rebalance: $orphans code rows have no float-store row — " +
          "upsertPqCodes batches must also be upsert()ed before a rebalance")
    }
    val survivors = minusTombstones(spark, path,
      spark.read.parquet(storeCur).select("id", "vec"))
    val kept = survivors.count()
    val storeNext = s"$path/store/v${cur.store + 1}"
    assigned(centroids, survivors)
      .repartition(col("cluster")) // one task per cell → one file per cell
      .write.mode("overwrite").partitionBy("cluster").parquet(storeNext)
    if (hasCodes) {
      val codebooks = readPqCodebooksAt(spark, path, cur)
      encodeBatch(centroids, codebooks, dim,
          spark.read.parquet(storeNext).select("id", "vec"))
        .repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$path/codes/v${cur.codes + 1}")
    }
    // the ONE commit point: both rewrites become visible together
    // (quantizers untouched — rebalance never retrains)
    commitManifest(spark, path,
      cur.copy(store = cur.store + 1,
        codes = if (hasCodes) cur.codes + 1 else 0))
    // post-commit cleanup — dropSuperseded keeps the previous snapshot
    // intact one more cycle (grace window), so a reader that resolved
    // it just before this commit finishes its scan; failures here
    // strand bytes, never readers
    graft.io.StoreManifest.dropSuperseded(spark, path, "store")
    if (hasCodes) graft.io.StoreManifest.dropSuperseded(spark, path, "codes")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
    val after = cellFiles(storeNext)
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
    // resolve the committed snapshot FIRST (fails loudly on a
    // manifest-less path), then read everything from that one snapshot
    val m = current(spark, path)
    val storeDir = s"$path/store/v${m.store}"
    val centroids = readCentroidsAt(spark, path, m)
    val raw = minusTombstones(spark, path, spark.read.parquet(storeDir))
    val cb = where.fold(raw)(raw.filter)
      .select(col("id"), col("vec"), col("__cn"), col("cluster").cast("int"))
    SimilaritySearch.ivfSearchAssigned(queries, cb, centroids, k, nprobe)
  }

  def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] =
    readCentroidsAt(spark, path, current(spark, path))

  private def readCentroidsAt(
      spark: SparkSession, path: String, m: Manifest): Array[Array[Float]] =
    spark.read.parquet(centroidsDir(path, m))
      .orderBy("cluster").collect()
      .map(_.getSeq[Float](1).toArray)

  // ---- PQ layer: codes-only search over the persisted index ----
  //
  // `pq_codebooks/` — (subspace int, cluster int, centroid
  // array<float>): the m×ksub sub-quantizers, KB-sized, collected
  // driver-side on read exactly like the coarse centroids.
  // `codes/v<M>/` — (id, code0..code{m-1}) PARTITIONED BY cluster: the
  // 100 TB scan side. m ints per vector instead of dim floats (a 64×
  // byte cut at dim=64/m=4) AND nprobe directory pruning — a query
  // touches nprobe cells × m ints, the float store never loads. The
  // live version is named by the same manifest entry as the store, so
  // the floats/codes pair is always resolved as ONE snapshot.

  /** Train PQ codebooks on `candidates` and persist codebooks + the
    * cell-partitioned codes table. Requires [[write]] to have run (the
    * coarse quantizer is read from `path`). Returns the codebooks. */
  def writePqCodes(
      path: String, candidates: DataFrame,
      dim: Int, m: Int, ksub: Int, iters: Int): Array[Array[Array[Float]]] = {
    val spark = candidates.sparkSession
    val cur = current(spark, path)
    val codebooks = SimilaritySearch.trainPqCodebooks(candidates, dim, m, ksub, iters)
    import spark.implicits._
    val bv = cur.books + 1
    val v = cur.codes + 1
    // codebook and codes writes are independent — overlapped; the
    // codes table repartitions per cell first (see [[write]]'s note)
    val cents = readCentroidsAt(spark, path, cur)
    graft.util.Jobs.inParallel(Seq(
      () => codebooks.zipWithIndex.flatMap { case (book, s) =>
          book.zipWithIndex.map { case (cvec, c) => (s, c, cvec.toSeq) }
        }.toSeq.toDF("subspace", "cluster", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/pq_codebooks/v$bv"),
      () => encodeBatch(cents, codebooks, dim, candidates)
        .repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/codes/v$v")))
    // codebooks + codes become visible in ONE commit — never a window
    // where a reader pairs new codes with old sub-quantizers
    commitManifest(spark, path, cur.copy(codes = v, books = bv))
    graft.io.StoreManifest.dropSuperseded(spark, path, "codes")
    graft.io.StoreManifest.dropSuperseded(spark, path, "pq_codebooks")
    codebooks
  }

  /** Encode a NEW batch against the persisted coarse quantizer AND
    * sub-quantizers, appending its cells — the PQ side of [[upsert]]. */
  def upsertPqCodes(path: String, batch: DataFrame, dim: Int): Unit = {
    val spark = batch.sparkSession
    val m = current(spark, path) // ONE snapshot for quantizers + codes dir
    require(m.codes > 0, s"$path has no committed PQ codes table")
    encodeBatch(readCentroidsAt(spark, path, m),
        readPqCodebooksAt(spark, path, m), dim, batch)
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$path/codes/v${m.codes}")
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
    val snap = current(spark, path) // snapshot first
    require(snap.codes > 0,
      s"$path has no committed PQ codes table (a re-train resets the PQ " +
        "layer — run writePqCodes against the new quantizer)")
    val codesDir = s"$path/codes/v${snap.codes}"
    val centroids = readCentroidsAt(spark, path, snap)
    val codebooks = readPqCodebooksAt(spark, path, snap)
    val m = codebooks.length
    val raw = minusTombstones(spark, path, spark.read.parquet(codesDir))
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
    readPqCodebooksAt(spark, path, current(spark, path))

  private def readPqCodebooksAt(
      spark: SparkSession, path: String, m: Manifest): Array[Array[Array[Float]]] =
    spark.read.parquet(codebooksDir(path, m))
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
