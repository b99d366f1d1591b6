package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sink-side operators (SURVEY §2.1 S6–S9).
 *
 * The reference's leaderboard writer re-reads the whole CSV, drops the
 * rows of the `(year, division)` being refreshed, appends the new
 * batch, then dedups on keys (reference
 * `processors/leaderboards/main.py:165-214`). On Spark that whole
 * read-modify-write collapses to a dynamic partition overwrite — only
 * the refreshed partitions are touched, which is the property that
 * keeps a daily upsert O(day) instead of O(history) at 100 TB.
 */
object Sinks {

  /** S8: overwrite only the partitions present in `df`. */
  def upsertByPartition(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** The upsert's dedup step: keep one row per key, latest by
    * `orderCol` (reference keeps last-written; here made deterministic). */
  def dedupKeepLatest(df: DataFrame, keys: Seq[String], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** S6: incremental append — only rows whose key is absent from the
    * existing sink (the reference's `done_ids` set, reference
    * `scrapers/collect_game.py:67-84`). `left_anti` is the distributed
    * form of the done-set. */
  def appendNewOnly(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
