package graft.operators

import java.nio.file.Files

import graft.SparkTestSession
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle invariants of the persisted IVF index ([[AnnIndex]]):
  * a search over the written-then-reloaded store must be EXACTLY the
  * in-memory [[SimilaritySearch]] result, before and after an
  * incremental upsert, and the store must land cell-partitioned. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val e = Tables.embeddings(spark, SparkTestSession.sfDir)
  private lazy val cands =
    e.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  test("write + reload + search equals in-memory ivfTopK exactly") {
    val path = Files.createTempDirectory("graft_annidx").toString
    AnnIndex.write(path, cands, numClusters = 8, iters = 2)
    val reloaded = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
    val fresh = SimilaritySearch.ivfTopK(queries, cands,
      numClusters = 8, iters = 2, k = 5, nprobe = 3)
    assert(reloaded.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(reloaded).count() === 0)
    // the store is laid out one parquet partition per Voronoi cell —
    // the physical property that lets nprobe prune directories at scale
    val cells = new java.io.File(AnnIndex.currentStoreDir(spark, path)).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).sorted
    assert(cells.nonEmpty && cells.forall(_.matches("cluster=\\d+")),
      s"store not cell-partitioned: ${cells.mkString(",")}")
  }

  test("upsert against persisted centroids equals in-memory assignment of the union") {
    val path = Files.createTempDirectory("graft_annidx_up").toString
    val initial = cands.filter(col("id") % 5 =!= 0)
    val batch = cands.filter(col("id") % 5 === 0)
    val centroids = AnnIndex.write(path, initial, numClusters = 8, iters = 2)
    AnnIndex.upsert(path, batch)
    val reloaded = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
    // in-memory twin: same centroids (trained on initial only), the
    // union assigned in one pass
    val cb = initial.unionByName(batch)
      .withColumn("__cn", VectorFunctions.l2Norm(col("vec")))
      .withColumn("cluster",
        SimilaritySearch.assignExpr(centroids, col("vec"), col("__cn")))
    val fresh = SimilaritySearch.ivfSearchAssigned(queries, cb, centroids,
      k = 5, nprobe = 3)
    assert(reloaded.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(reloaded).count() === 0)
    // upsert appended rows into existing cell dirs — store row count
    // is the union
    val stored = spark.read.parquet(AnnIndex.currentStoreDir(spark, path)).count()
    assert(stored === cands.count())
  }

  test("delete + rebalance: tombstone search equals physical search; cells compact to one file") {
    val path = Files.createTempDirectory("graft_annidx_del").toString
    AnnIndex.write(path, cands.filter(col("id") % 5 =!= 0), numClusters = 8, iters = 2)
    // five small upserts covering the remaining 20% (pmod 25 ∈
    // {0,5,10,15,20} ⊆ id%5==0) — the skewed-ingest shape that
    // leaves many tiny files per hot cell
    (0 until 5).foreach(r =>
      AnnIndex.upsert(path, cands.filter(pmod(col("id"), lit(25)) === r * 5)))
    val total = spark.read.parquet(AnnIndex.currentStoreDir(spark, path)).count()
    assert(total === cands.count(), "upserts must cover the full set")

    AnnIndex.delete(path, cands.filter(col("id") % 7 === 0).select("id"))
    // pre-rebalance: the tombstone anti-join path
    val viaTombstones = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
      .collect().toSeq
    val report = AnnIndex.rebalance(spark, path)
    // post-rebalance: the physically-compacted path — identical rows
    val viaPhysical = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
      .collect().toSeq
    assert(viaTombstones.toSet === viaPhysical.toSet,
      "tombstone-masked and physically-deleted searches must agree")
    assert(viaTombstones.nonEmpty)
    // no deleted id ever surfaces
    assert(viaTombstones.forall(_.getAs[Long]("id") % 7 != 0))

    // report accounting: removed = tombstoned rows present in store
    val expectRemoved = cands.filter(col("id") % 7 === 0).count()
    assert(report.removed === expectRemoved, s"report: $report")
    assert(report.rows === total - expectRemoved)
    // every cell compacted to exactly one parquet file
    assert(report.maxCellFilesAfter === 1L,
      s"cells must compact to one file each: $report")
    assert(report.maxCellFilesBefore > 1L,
      "precondition: skewed upserts should have fragmented some cell")
    // tombstones cleared — a fresh delete-free search sees the survivors
    assert(!new java.io.File(s"$path/tombstones").exists())
    assert(spark.read.parquet(AnnIndex.currentStoreDir(spark, path)).count() === report.rows)
  }

  test("persisted PQ codes: search equals in-memory ivfPqTopK; codes table is ints-only") {
    val path = Files.createTempDirectory("graft_annidx_pq").toString
    AnnIndex.write(path, cands, numClusters = 8, iters = 2)
    AnnIndex.writePqCodes(path, cands, dim = 64, m = 4, ksub = 8, iters = 2)
    val reloaded = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
    val fresh = SimilaritySearch.ivfPqTopK(queries, cands,
      numClusters = 8, coarseIters = 2, dim = 64, m = 4, ksub = 8,
      pqIters = 2, k = 5, nprobe = 3)
    assert(reloaded.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(reloaded).count() === 0)
    // the codes table carries ONLY id + m int codes (cluster is the
    // partition directory) — no float vectors on the scan side
    val schema = spark.read.parquet(AnnIndex.currentCodesDir(spark, path)).schema
    assert(schema.fieldNames.toSet ===
      Set("id", "code0", "code1", "code2", "code3", "cluster"), schema.treeString)
    assert((0 until 4).forall(s =>
      schema(s"code$s").dataType === org.apache.spark.sql.types.IntegerType))
    // and it lands cell-partitioned like the float store
    val cells = new java.io.File(AnnIndex.currentCodesDir(spark, path)).listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName)
    assert(cells.nonEmpty && cells.forall(_.matches("cluster=\\d+")))
  }

  test("filtered search = full ranking restricted to the predicate (pre-filter semantics)") {
    val path = Files.createTempDirectory("graft_annidx_filt").toString
    AnnIndex.write(path, cands, numClusters = 8, iters = 2)
    AnnIndex.writePqCodes(path, cands, dim = 64, m = 4, ksub = 8, iters = 2)
    val pred = col("id") >= 100 && col("id") < 400

    // float-store twin: filtered topK = full topK restricted + re-rank
    val fFiltered = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3,
        where = Some(pred))
      .select("query_id", "rank", "id", "cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(fFiltered.forall(t => t._3 >= 100 && t._3 < 400))
    val fFull = AnnIndex.topK(spark, path, queries, k = 100000, nprobe = 3)
      .select("query_id", "id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fExpected = fFull.toSeq
      .filter(t => t._2 >= 100 && t._2 < 400)
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((_, id, cos), i) => (q, i + 1, id, cos) }
      }.sortBy(t => (t._1, t._2))
    assert(fFiltered === fExpected,
      "float-store pre-filtered top-k must equal the full ranking restricted")
    val filtered = AnnIndex.topKPq(spark, path, queries,
        dim = 64, k = 5, nprobe = 3, where = Some(pred))
      .select("query_id", "rank", "id", "cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // every neighbor satisfies the predicate, k rows per query
    assert(filtered.forall(t => t._3 >= 100 && t._3 < 400))
    assert(filtered.groupBy(_._1).forall(_._2.length == 5))
    // ground truth: the UNFILTERED search with k large enough to rank
    // every candidate in the probed cells, then filter + re-rank —
    // same persisted index, so ADC scores are identical by
    // construction; pre-filtering must equal filter-then-rank
    val full = AnnIndex.topKPq(spark, path, queries,
        dim = 64, k = 100000, nprobe = 3)
      .select("query_id", "id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.toSeq
      .filter(t => t._2 >= 100 && t._2 < 400)
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((_, id, cos), i) => (q, i + 1, id, cos) }
      }.sortBy(t => (t._1, t._2))
    assert(filtered === expected,
      "pre-filtered top-k must equal the full ranking restricted to the predicate")
  }

  test("PQ upsert against persisted quantizers equals one-pass encoding of the union") {
    val path = Files.createTempDirectory("graft_annidx_pqup").toString
    val initial = cands.filter(col("id") % 5 =!= 0)
    val batch = cands.filter(col("id") % 5 === 0)
    val centroids = AnnIndex.write(path, initial, numClusters = 8, iters = 2)
    val codebooks = AnnIndex.writePqCodes(path, initial, dim = 64, m = 4, ksub = 8, iters = 2)
    // dual maintenance: the float store stays the source of truth
    // (rebalance re-encodes codes from it and REQUIRES parity)
    AnnIndex.upsert(path, batch)
    AnnIndex.upsertPqCodes(path, batch, dim = 64)
    assert(AnnIndex.readPqCodebooks(spark, path).map(_.map(_.toSeq).toSeq).toSeq ===
      codebooks.map(_.map(_.toSeq).toSeq).toSeq, "codebook round-trip")
    val reloaded = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
    // in-memory twin: quantizers trained on `initial` only, the union
    // encoded in one pass through the same package-private kernels
    val codes = SimilaritySearch.pqEncode(
      initial.unionByName(batch)
        .withColumn("__vn", VectorFunctions.l2Norm(col("vec")))
        .withColumn("cluster",
          SimilaritySearch.assignExpr(centroids, col("vec"), col("__vn"))),
      codebooks, dim = 64, keep = Seq("cluster"))
    val qlut = SimilaritySearch.pqQueryLut(
      queries.withColumn("__pn", VectorFunctions.l2Norm(col("query_vec")))
        .withColumn("cluster", explode(
          SimilaritySearch.probeExpr(centroids, col("query_vec"), col("__pn"), 3)))
        .drop("__pn"),
      codebooks, dim = 64, keep = Seq(col("cluster")))
    val fresh = SimilaritySearch.adcRank(
      codes.join(broadcast(qlut), Seq("cluster"))
        .filter(col("query_id") =!= col("id")),
      codebooks, k = 5)
    assert(reloaded.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(reloaded).count() === 0)
    assert(spark.read.parquet(AnnIndex.currentCodesDir(spark, path)).count() === cands.count())

    // delete + rebalance through the CODES path: the tombstone
    // anti-join over codes must equal the physically re-encoded
    // store (re-encoded from surviving floats under the SAME
    // persisted codebooks — rebalance never retrains)
    AnnIndex.delete(path, cands.filter(col("id") % 7 === 0).select("id"))
    val viaTombstones = AnnIndex
      .topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3).collect().toSet
    AnnIndex.rebalance(spark, path, dim = 64)
    val viaPhysical = AnnIndex
      .topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3).collect().toSet
    assert(viaTombstones === viaPhysical,
      "PQ search must agree between tombstone and physical deletion")
    assert(viaTombstones.nonEmpty &&
      viaTombstones.forall(_.getAs[Long]("id") % 7 != 0))
    assert(AnnIndex.readPqCodebooks(spark, path).map(_.map(_.toSeq).toSeq).toSeq ===
      codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "rebalance must not touch the trained codebooks")
    assert(spark.read.parquet(AnnIndex.currentCodesDir(spark, path)).count() ===
      cands.filter(col("id") % 7 =!= 0).count())
  }

  test("pointer-commit: a reader between the two rewrites sees the OLD consistent pair") {
    // a maintenance run writes store/v2 then codes/v2 then commits —
    // the old double-rename swap exposed (no store at all) and (new
    // floats, stale codes) windows. With the manifest, everything
    // before the commit is invisible: emulate the mid-maintenance
    // state by writing BOTH next-version directories (one of them
    // garbage, so reading it would provably change results) WITHOUT a
    // commit, and assert searches still equal the committed snapshot.
    val path = Files.createTempDirectory("graft_annidx_ptr").toString
    AnnIndex.write(path, cands, numClusters = 8, iters = 2)
    AnnIndex.writePqCodes(path, cands, dim = 64, m = 4, ksub = 8, iters = 2)
    val baseF = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3).collect().toSet
    val basePq = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
      .collect().toSet

    // uncommitted in-flight rewrites: a half-corpus store and an
    // EMPTY-schema'd codes table at the next version numbers
    spark.read.parquet(AnnIndex.currentStoreDir(spark, path))
      .filter(col("id") % 2 === 0)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/store/v2")
    spark.read.parquet(AnnIndex.currentCodesDir(spark, path))
      .filter(col("id") < 0)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/codes/v2")

    assert(AnnIndex.currentStoreDir(spark, path).endsWith("/store/v1"))
    assert(AnnIndex.currentCodesDir(spark, path).endsWith("/codes/v1"))
    val midF = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3).collect().toSet
    val midPq = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
      .collect().toSet
    assert(midF === baseF, "reader must not see the uncommitted store rewrite")
    assert(midPq === basePq, "reader must not see the uncommitted codes rewrite")

    // a real maintenance run then CLOBBERS the orphaned v2 dirs
    // (overwrite-mode) and publishes both in one commit
    AnnIndex.delete(path, cands.filter(col("id") % 7 === 0).select("id"))
    AnnIndex.rebalance(spark, path, dim = 64)
    assert(AnnIndex.currentStoreDir(spark, path).endsWith("/store/v2"))
    assert(AnnIndex.currentCodesDir(spark, path).endsWith("/codes/v2"))
    val afterPq = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
      .collect().toSet
    assert(afterPq.nonEmpty && afterPq.forall(_.getAs[Long]("id") % 7 != 0))
    // floats/codes parity after the commit: same id sets
    val storeIds = spark.read.parquet(AnnIndex.currentStoreDir(spark, path))
      .select("id").collect().map(_.getLong(0)).toSet
    val codeIds = spark.read.parquet(AnnIndex.currentCodesDir(spark, path))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(storeIds === codeIds, "committed snapshot must pair floats and codes")
    // GRACE WINDOW: the previous snapshot survives one maintenance
    // cycle (an in-flight reader that resolved v1 just before the
    // commit finishes its scan), then the next cycle reclaims it
    assert(new java.io.File(s"$path/store/v1").exists(),
      "previous snapshot must survive one cycle for in-flight readers")
    assert(new java.io.File(s"$path/codes/v1").exists())
    AnnIndex.rebalance(spark, path, dim = 64)
    assert(!new java.io.File(s"$path/store/v1").exists())
    assert(!new java.io.File(s"$path/codes/v1").exists())
  }

  test("re-train resets the PQ layer and re-versions the quantizer in the same commit") {
    val path = Files.createTempDirectory("graft_annidx_retrain").toString
    AnnIndex.write(path, cands.filter(col("id") % 3 === 0), numClusters = 8, iters = 2)
    AnnIndex.writePqCodes(path, cands.filter(col("id") % 3 === 0),
      dim = 64, m = 4, ksub = 8, iters = 2)
    assert(AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
      .count() > 0)

    // periodic re-train on the FULL corpus: new centroids + new store
    // publish together; the old PQ codes were encoded and
    // cell-partitioned under the OLD centroids, so the manifest resets
    // the PQ layer — probing them with the new quantizer would be
    // silently wrong (the old bug this spec pins)
    val centroids = AnnIndex.write(path, cands, numClusters = 8, iters = 2)
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
    }
    assert(ex.getMessage.contains("re-train"),
      s"stale-codes search must fail loudly, got: ${ex.getMessage}")
    // the float path is fully consistent: new centroids vs new store
    assert(AnnIndex.readCentroids(spark, path).map(_.toSeq).toSeq ===
      centroids.map(_.toSeq).toSeq)
    val reloaded = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
    val fresh = SimilaritySearch.ivfTopK(queries, cands,
      numClusters = 8, iters = 2, k = 5, nprobe = 3)
    assert(reloaded.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(reloaded).count() === 0)
    // re-running writePqCodes against the NEW quantizer restores PQ search
    AnnIndex.writePqCodes(path, cands, dim = 64, m = 4, ksub = 8, iters = 2)
    val pq = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
    val freshPq = SimilaritySearch.ivfPqTopK(queries, cands,
      numClusters = 8, coarseIters = 2, dim = 64, m = 4, ksub = 8,
      pqIters = 2, k = 5, nprobe = 3)
    assert(pq.exceptAll(freshPq).count() === 0)
    assert(freshPq.exceptAll(pq).count() === 0)
  }

  test("crash window: a manifest-less path fails loudly; a stale manifest serves the old version") {
    // no write() ever committed → not an index, loud failure (the old
    // layout would have surfaced a FileNotFound deep in the scan)
    val empty = Files.createTempDirectory("graft_annidx_crash").toString
    val ex = intercept[IllegalStateException] {
      AnnIndex.topK(spark, empty, queries, k = 5, nprobe = 3)
    }
    assert(ex.getMessage.contains("no committed manifest"))
  }

  test("foreachBatch ANN ingestion: streamed upserts (float + PQ) equal one-shot assignment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train + seed the store on a third of the corpus, then STREAM the
    // rest in micro-batches through both upsert paths — the daily-pull
    // cadence for a growing 100 TB vector store (quantizers frozen,
    // cells append-only)
    val path = Files.createTempDirectory("graft_annidx_stream").toString
    val initial = cands.filter(col("id") % 3 === 0)
    val centroids = AnnIndex.write(path, initial, numClusters = 8, iters = 2)
    val codebooks = AnnIndex.writePqCodes(path, initial, dim = 64, m = 4, ksub = 8, iters = 2)
    val rest = cands.filter(col("id") % 3 =!= 0)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val query = input.toDF().toDF("id", "vec").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        AnnIndex.upsert(path, batch.toDF())
        AnnIndex.upsertPqCodes(path, batch.toDF(), dim = 64)
        ()
      }
      .start()
    try {
      Seq(b1, b2).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    } finally query.stop()

    // float path: reloaded search ≡ one-pass assignment of the union
    val cb = initial.unionByName(rest.toSeq.toDF("id", "vec"))
      .withColumn("__cn", VectorFunctions.l2Norm(col("vec")))
      .withColumn("cluster",
        SimilaritySearch.assignExpr(centroids, col("vec"), col("__cn")))
    val freshIvf = SimilaritySearch.ivfSearchAssigned(queries, cb, centroids,
      k = 5, nprobe = 3)
    val gotIvf = AnnIndex.topK(spark, path, queries, k = 5, nprobe = 3)
    assert(gotIvf.exceptAll(freshIvf).count() === 0)
    assert(freshIvf.exceptAll(gotIvf).count() === 0)
    // PQ path: reloaded codes search ≡ one-pass encode of the union
    val codes = SimilaritySearch.pqEncode(
      cb.select(col("id"), col("vec"), col("cluster")), codebooks,
      dim = 64, keep = Seq("cluster"))
    val qlut = SimilaritySearch.pqQueryLut(
      queries.withColumn("__pn", VectorFunctions.l2Norm(col("query_vec")))
        .withColumn("cluster", explode(
          SimilaritySearch.probeExpr(centroids, col("query_vec"), col("__pn"), 3)))
        .drop("__pn"),
      codebooks, dim = 64, keep = Seq(col("cluster")))
    val freshPq = SimilaritySearch.adcRank(
      codes.join(broadcast(qlut), Seq("cluster"))
        .filter(col("query_id") =!= col("id")),
      codebooks, k = 5)
    val gotPq = AnnIndex.topKPq(spark, path, queries, dim = 64, k = 5, nprobe = 3)
    assert(gotPq.exceptAll(freshPq).count() === 0)
    assert(freshPq.exceptAll(gotPq).count() === 0)
    // both stores hold exactly the union
    assert(spark.read.parquet(AnnIndex.currentStoreDir(spark, path)).count() === cands.count())
    assert(spark.read.parquet(AnnIndex.currentCodesDir(spark, path)).count() === cands.count())
  }

  test("overlapped PQ training equals the sequential per-subspace schedule bit-for-bit") {
    // r18 optimization invariant: trainPqCodebooks overlaps the m
    // independent subspace trainers (util.Jobs) and each Lloyd pass
    // collects (cluster, pos, mean) rows directly instead of a second
    // reshape aggregation — neither may change a single trained float.
    // The sequential reference below is the pre-r18 schedule verbatim.
    val (dim, m, ksub, iters) = (64, 4, 8, 2)
    val sub = dim / m
    val par = SimilaritySearch.trainPqCodebooks(cands, dim, m, ksub, iters)
    val seq = (0 until m).map { s =>
      SimilaritySearch.trainIvfCentroids(
        cands.select(col("id"),
          org.apache.spark.sql.functions.slice(col("vec"), s * sub + 1, sub).as("vec")),
        ksub, iters)
    }.toArray
    assert(par.length === seq.length)
    for (s <- 0 until m; c <- 0 until ksub)
      assert(par(s)(c).toSeq === seq(s)(c).toSeq,
        s"codebook mismatch at subspace=$s cluster=$c")
  }
}
