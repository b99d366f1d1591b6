package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Path-addressed BUCKETED parquet tables — the `s13` bucketed-join
 * machinery packaged for the persisted stores: Spark keeps bucketing
 * metadata in the catalog, not in the files, so each versioned
 * directory gets a deterministic table name any session can
 * re-register against the same files (`CREATE TABLE … CLUSTERED BY …
 * LOCATION …`). A scan loaded this way carries
 * `HashPartitioning(bucketCol, buckets)`, so joins/aggregations keyed
 * EXACTLY on the bucket column consume it with zero exchange — V1
 * bucketed joins do not co-locate on key supersets, so pick the
 * bucket column to match the steady-state join key precisely
 * (the [[graft.operators.DedupIndex]] lesson).
 */
object BucketedTables {

  /** Deterministic catalog name for one table directory. */
  def tableName(dir: String): String =
    s"graft_bt_${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))}" +
      "_" + dir.replaceAll("[^A-Za-z0-9]+", "_").takeRight(32)

  /** Write `df` bucketed by `bucketCol` (sorted by `sortCol` within
    * each bucket file — tight row-group stats for pushdown on that
    * column). The pre-shuffle onto the bucket hash means each task
    * owns whole buckets → exactly `buckets` files per write, not
    * tasks×buckets. Overwrites both files and catalog entry. */
  def write(
      df: DataFrame, dir: String,
      bucketCol: String, sortCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val name = tableName(dir)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.repartition(buckets, col(bucketCol))
      .write.bucketBy(buckets, bucketCol).sortBy(sortCol)
      .option("path", dir)
      .format("parquet").mode("overwrite").saveAsTable(name)
  }

  /** Append into an existing bucketed table (same bucket spec). */
  def append(
      df: DataFrame, dir: String,
      bucketCol: String, sortCol: String, buckets: Int): Unit = {
    read(df.sparkSession, dir, bucketCol, sortCol, buckets) // ensure registered
    df.repartition(buckets, col(bucketCol))
      .write.bucketBy(buckets, bucketCol).sortBy(sortCol)
      .format("parquet").mode("append")
      .saveAsTable(tableName(dir))
  }

  /** The bucketed table at `dir`, re-registering the catalog entry if
    * this session has never seen it (bucket metadata lives in the
    * catalog, the files on disk). ALWAYS refreshes the relation cache
    * first: appends land through whatever session held the writing
    * DataFrame — in Structured Streaming's foreachBatch that is a
    * CLONED session whose write invalidates only its own cache, so a
    * reader session would otherwise serve a stale file listing and
    * silently miss appended rows (found by the DedupIndex streaming
    * spec). Path-based parquet reads re-list on every analysis; table
    * reads must be told to. */
  def read(
      spark: SparkSession, dir: String,
      bucketCol: String, sortCol: String, buckets: Int): DataFrame = {
    val name = tableName(dir)
    if (!spark.catalog.tableExists(name)) {
      val cols = spark.read.parquet(dir).schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE `$name` ($cols) USING PARQUET " +
        s"CLUSTERED BY (`$bucketCol`) SORTED BY (`$sortCol`) INTO $buckets BUCKETS " +
        s"LOCATION '$dir'")
    }
    spark.catalog.refreshTable(name)
    spark.table(name)
  }

  /** Drop the catalog entry for a reclaimed directory (no-op when the
    * session never registered it). */
  def dropEntry(spark: SparkSession, dir: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `${tableName(dir)}`"): Unit
}
