package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The plumbing every persisted-gate store shares —
 * [[graft.operators.DedupIndex]] (text LSH), [[graft.multimodal
 * .MediaIndex]] (perceptual codes, which [[graft.multimodal
 * .AudioHash]] parameterizes), [[EdgeStore]] (link graph) and
 * [[graft.operators.AnnIndex]] all follow the same write/gate/upsert/
 * compact lifecycle over [[StoreManifest]]-published versions of
 * [[BucketedTables]]. The per-family banding/verification logic stays
 * with each family; what lives here is the mechanical part that was
 * hand-rolled per store until r16.
 */
object StoreKit {

  /** Parquet data files under `dir` (recursive) — the before/after
    * measure every compact reports. 0 for a missing dir. */
  def parquetFileCount(spark: SparkSession, dir: String): Long = {
    val fs = StoreManifest.fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Drop catalog entries whose version directory is gone (superseded
    * versions reclaimed by the grace-window cleanup): `$path/$table/
    * v<k>` for k < `below`. Bucket metadata lives in the session
    * catalog, so a reclaimed dir leaves a dangling entry behind
    * otherwise. */
  def dropStaleEntries(
      spark: SparkSession, path: String, table: String, below: Int): Unit = {
    val fs = StoreManifest.fsOf(spark, path)
    (1 until below).foreach { k =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/$table/v$k")))
        BucketedTables.dropEntry(spark, s"$path/$table/v$k")
    }
  }

  /** SNAPSHOT-STABLE gate verdicts (the discipline every ingest gate
    * shares): the drop-id frame — small, drop ids only — is eagerly
    * localCheckpoint'ed so the returned survivors frame keeps meaning
    * "gated against the store AS OF THIS CALL" even after the caller
    * upserts the survivors back into the index (a lazy plan would
    * re-probe the grown store and self-match every batch row) or the
    * harness clears the cache catalog. */
  def snapshotStableSurvivors(
      batch: DataFrame, idCol: String, drops: DataFrame): DataFrame =
    batch.join(drops.localCheckpoint(true), Seq(idCol), "left_anti")

  /** The compact rewrite's INPUT: the current version dir as PLAIN
    * parquet, never the bucketed table — fed the bucketed scan,
    * Catalyst drops the writer's repartition as redundant, the
    * planner auto-disables the bucketed read (no exchange left to
    * avoid), and the rewrite degenerates to one output file per input
    * file: the exact small-file state compact exists to undo. The
    * plain read carries no partitioning claim, so the re-bucketing
    * shuffle really runs and the rewrite lands at exactly `buckets`
    * files. */
  def compactInput(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
