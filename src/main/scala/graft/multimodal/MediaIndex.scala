package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.StoreManifest

/**
 * Persisted perceptual-code ingest index — the MEDIA twin of
 * [[graft.operators.DedupIndex]] (which is itself the persisted form
 * of the text LSH gate): [[ImageHash.incrementalNearDup]]'s history
 * side is "an append-only dHash table"; this operator IS that table,
 * with the full write/gate/upsert/compact lifecycle instead of a
 * caller-managed frame. It stores 64-bit perceptual codes (dHash for
 * images; any code with Hamming-ball semantics that USES the full 64
 * bits — a narrow code like [[AudioHash]]'s 24-bit form would make
 * the two high 16-bit chunks constant-zero, turning those band joins
 * into a per-chunk cross product; widen such codes or band them at
 * their own width, as [[AudioHash.nearDupPairs]] does with 6-bit
 * chunks), so at 100 TB of pixels the index is GB-scale.
 *
 * Layout under `path` (published by the shared [[StoreManifest]]
 * pointer-commit log):
 *  - `bands/v<N>/` — (media_id, dhash, chunk_val) PARTITIONED BY
 *    `chunk`: the pre-banded form of the code table (four 16-bit
 *    chunks per code — the pigeonhole guarantee: two codes within
 *    Hamming 3 agree exactly on ≥1 chunk). A batch probe is one
 *    equi-join on (chunk, chunk_val) per chunk directory; codes carry
 *    their own hash THROUGH the band join, so no size/verification
 *    table is needed (unlike the text twin) — verification is one
 *    inline `bit_count(xor)`.
 *
 * Determinism: banding and verification reuse the exact chunking and
 * Hamming forms of [[ImageHash.incrementalNearDup]], so [[gate]] over
 * the persisted index is row-identical to the in-memory operator
 * against the same history codes — spec-pinned, and the m16 oracle
 * replays the full two-batch lifecycle in SQL.
 */
object MediaIndex {

  private def bandedOf(codes: DataFrame): DataFrame =
    codes.select(col("media_id"), col("dhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("dhash"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("media_id", "dhash", "chunk", "chunk_val")

  /** Materialize the index for an initial corpus of `(media_id,
    * dhash)` codes. A re-write on an existing path publishes a FRESH
    * version (readers on the old snapshot are undisturbed until the
    * commit; superseded dirs reclaimed with the grace window). */
  def write(path: String, codes: DataFrame): Unit = {
    val spark = codes.sparkSession
    val v = StoreManifest.read(spark, path).fold(1)(_.getOrElse("bands", 0) + 1)
    bandedOf(codes)
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$path/bands/v$v")
    StoreManifest.commit(spark, path, Map("bands" -> v))
    StoreManifest.dropSuperseded(spark, path, "bands")
  }

  /** Append an ACCEPTED batch's banded codes into the current
    * snapshot — parquet appends are task-committed files, no manifest
    * commit needed (the [[graft.operators.AnnIndex.upsert]]
    * discipline). */
  def upsert(path: String, codes: DataFrame): Unit = {
    val spark = codes.sparkSession
    bandedOf(codes)
      .write.mode("append").partitionBy("chunk")
      .parquet(StoreManifest.currentDir(spark, path, "bands"))
  }

  /**
   * Gate a batch of `(media_id, dhash)` codes against the PERSISTED
   * history: returns the batch rows whose code is NOT within
   * `maxHamming` of any indexed code — row-identical to
   * [[ImageHash.incrementalNearDup]] with the full history code
   * table. The caller [[upsert]]s the survivors it accepts.
   * Within-batch duplicates are deliberately untouched
   * ([[ImageHash.nearDupPairs]]'s job, composed when wanted).
   */
  def gate(
      spark: SparkSession, path: String, batch: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band chunking guarantees recall only to Hamming 3")
    val hist = spark.read
      .parquet(StoreManifest.currentDir(spark, path, "bands"))
      .select(col("media_id").as("hid"), col("dhash").as("__h_hid"),
        col("chunk"), col("chunk_val"))
    // verdicts are SNAPSHOT-STABLE (the DedupIndex discipline): the
    // drop-id set is eagerly localCheckpoint'ed so the returned frame
    // keeps meaning "gated against the store AS OF THIS CALL" even
    // after the caller upserts the survivors back into the index
    val drops = bandedOf(batch)
      .toDF("bid", "__h_bid", "chunk", "chunk_val")
      .join(hist, Seq("chunk", "chunk_val"))
      .filter(bit_count(col("__h_bid").bitwiseXOR(col("__h_hid"))) <= maxHamming)
      .select(col("bid").as("media_id")).distinct()
      .localCheckpoint(true)
    batch.join(drops, Seq("media_id"), "left_anti")
  }

  /** One compaction summary from [[compact]]. */
  final case class CompactReport(filesBefore: Long, filesAfter: Long)

  /** Physical maintenance: rewrite the banded table compacted (a
    * thousand daily upserts otherwise leave a thousand small files per
    * chunk directory) into a fresh `v<N+1>` dir and publish it in ONE
    * manifest commit. */
  def compact(spark: SparkSession, path: String): CompactReport = {
    val fs = StoreManifest.fsOf(spark, path)
    def files(dir: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val v = StoreManifest.current(spark, path)("bands")
    val before = files(s"$path/bands/v$v")
    spark.read.parquet(s"$path/bands/v$v")
      .repartition(col("chunk")) // one task per chunk → one file per dir
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$path/bands/v${v + 1}")
    StoreManifest.commit(spark, path, Map("bands" -> (v + 1)))
    StoreManifest.dropSuperseded(spark, path, "bands")
    CompactReport(before, files(s"$path/bands/v${v + 1}"))
  }
}
