package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.StoreManifest

/**
 * Persisted MinHash-LSH ingest index — the TEXT twin of [[AnnIndex]]:
 * [[Dedup.incrementalNearDupLsh]] documents that "the history side's
 * banded table is exactly the LSH index a production pipeline
 * precomputes once and stores"; this operator IS that store. A
 * corpus's band buckets (candidate generation) and its shingle table
 * (exact-Jaccard verification) persist as parquet; each ingest batch
 * probes them with two equi-joins, and ACCEPTED batches append —
 * steady-state cost never re-shingles history.
 *
 * Layout under `path` (versions published by the shared
 * [[graft.io.StoreManifest]] pointer-commit log, so [[compact]] can
 * rewrite BOTH tables and publish them atomically):
 *  - `bands/v<N>/` — (id, band, bucket) PARTITIONED BY band: a batch
 *    probe touches each band directory with a bucket equi-join;
 *  - `shingles/v<N>/` — (id, sh): the verification side, keyed by
 *    shingle in the intersection join (bucket it by `sh` at 100 TB).
 *
 * Determinism: banding and verification reuse the EXACT public
 * kernels of [[Dedup]] ([[Dedup.shingled]],
 * [[Dedup.minhashSignaturesFromShingles]], the band-md5 form), so
 * [[gate]] over the persisted index is row-identical to
 * [[Dedup.incrementalNearDupLsh]] against the same history corpus —
 * spec-pinned, and the t65 oracle replays the full two-batch
 * lifecycle in SQL.
 */
object DedupIndex {

  /** The banded-bucket table of a (already shingled) corpus — the
    * identical form [[Dedup.incrementalNearDupLsh]] builds inline. */
  private def bandedOf(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    Dedup.minhashSignaturesFromShingles(sh, numHashes).select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws(",", slice(col("sig"), b * r + 1, lit(r)))))))
      .toDF("id", "band", "bucket")
  }

  /** Materialize the index for an initial corpus. A re-write on an
    * existing path publishes FRESH versions (readers on the old
    * snapshot are undisturbed until the commit; superseded dirs are
    * dropped post-commit). */
  def write(
      path: String, docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    val prev = StoreManifest.read(spark, path)
    val bv = prev.fold(1)(_("bands") + 1)
    val sv = prev.fold(1)(_("shingles") + 1)
    val sh = Dedup.shingled(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("overwrite").parquet(s"$path/shingles/v$sv")
    bandedOf(sh, numHashes, bands)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands/v$bv")
    sh.unpersist()
    StoreManifest.commit(spark, path, Map("bands" -> bv, "shingles" -> sv))
    StoreManifest.dropSuperseded(spark, path, "bands")
    StoreManifest.dropSuperseded(spark, path, "shingles")
  }

  /** Append an ACCEPTED batch's bands + shingles into the current
    * snapshot — parquet appends are task-committed files, no manifest
    * commit needed (the [[AnnIndex.upsert]] discipline). */
  def upsert(
      path: String, docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    val sh = Dedup.shingled(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("append")
      .parquet(StoreManifest.currentDir(spark, path, "shingles"))
    bandedOf(sh, numHashes, bands)
      .write.mode("append").partitionBy("band")
      .parquet(StoreManifest.currentDir(spark, path, "bands"))
    sh.unpersist()
  }

  /**
   * Gate a batch against the PERSISTED history: returns the batch
   * rows that are not near-duplicates (exact n-gram Jaccard ≥
   * `threshold`, candidates from the band-bucket equi-join) of any
   * indexed row — row-identical to [[Dedup.incrementalNearDupLsh]]
   * with the full history corpus. The caller [[upsert]]s the
   * survivors it accepts.
   */
  def gate(
      spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val histBands = spark.read
      .parquet(StoreManifest.currentDir(spark, path, "bands"))
      .select(col("id").as("hid"), col("band"), col("bucket"))
    val histSh = spark.read
      .parquet(StoreManifest.currentDir(spark, path, "shingles"))
      .toDF("hid", "sh")
    val shB = Dedup.shingled(batch, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shB.count()
    val cand = bandedOf(shB, numHashes, bands).toDF("bid", "band", "bucket")
      .join(histBands, Seq("band", "bucket"))
      .select("bid", "hid").distinct()
    val szB = shB.groupBy("id").agg(count(lit(1)).as("n_a"))
      .withColumnRenamed("id", "bid")
    val szH = histSh.groupBy("hid").agg(count(lit(1)).as("n_b"))
    val inter = cand
      .join(shB.toDF("bid", "sh"), "bid")
      .join(histSh, Seq("hid", "sh"))
      .groupBy("bid", "hid")
      .agg(count(lit(1)).as("n_inter"))
    // the verdict is SNAPSHOT-STABLE by construction: the drop-id set
    // (small — drop ids only) is eagerly localCheckpoint'ed, so the
    // returned frame keeps meaning "gated against the store AS OF THIS
    // CALL" even after the caller upserts the survivors back into the
    // index (a lazy plan would re-probe the grown store and self-match
    // every batch row) or the harness clears the cache catalog
    val drops = inter.join(szB, "bid").join(szH, "hid")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("bid").as(idCol)).distinct()
      .localCheckpoint(true)
    shB.unpersist()
    batch.join(drops, Seq(idCol), "left_anti")
  }

  /** One compaction summary from [[compact]]. */
  final case class CompactReport(
      bandFilesBefore: Long, bandFilesAfter: Long,
      shingleFilesBefore: Long, shingleFilesAfter: Long)

  /** Physical maintenance: rewrite both tables compacted (a thousand
    * daily upserts otherwise leave a thousand small files per band
    * directory) into fresh `v<N+1>` dirs and publish them in ONE
    * manifest commit — concurrent gates resolve either the old or the
    * new snapshot, never a mix. */
  def compact(spark: SparkSession, path: String): CompactReport = {
    val fs = StoreManifest.fsOf(spark, path)
    def files(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) 0L
      else fs.listFiles(p, true) match {
        case it =>
          var n = 0L
          while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
          n
      }
    }
    val cur = StoreManifest.current(spark, path)
    val (bv, sv) = (cur("bands"), cur("shingles"))
    val bBefore = files(s"$path/bands/v$bv")
    val sBefore = files(s"$path/shingles/v$sv")
    spark.read.parquet(s"$path/bands/v$bv")
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$path/bands/v${bv + 1}")
    spark.read.parquet(s"$path/shingles/v$sv")
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      .write.mode("overwrite").parquet(s"$path/shingles/v${sv + 1}")
    StoreManifest.commit(spark, path,
      Map("bands" -> (bv + 1), "shingles" -> (sv + 1)))
    StoreManifest.dropSuperseded(spark, path, "bands")
    StoreManifest.dropSuperseded(spark, path, "shingles")
    CompactReport(bBefore, files(s"$path/bands/v${bv + 1}"),
      sBefore, files(s"$path/shingles/v${sv + 1}"))
  }
}
