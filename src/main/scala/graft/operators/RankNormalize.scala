package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Global rank / percentile normalization of a score column — the
 * calibration step quality-filter pipelines need ("keep the top 30%
 * by quality" must mean the same thing on every corpus).
 *
 * The naive form (`rank() over (order by score)`) is a corpus-wide
 * single-reducer sort. This is the scale-correct two-phase form,
 * exactly equivalent for the tie-sharing rank definition:
 *
 *  1. row counts per DISTINCT score — one hash shuffle on a
 *     bounded-cardinality key (quantized scores, like the engine's
 *     rounded quality columns);
 *  2. a prefix sum over the small bucket table (single-partition
 *     window over buckets, not rows) yields, per score, the number of
 *     strictly-better rows and the inclusive cumulative count;
 *  3. a broadcast join attaches `rank` (1 + strictly-better count;
 *     ties share) and `cume_frac` (inclusive count / N, the DESC
 *     `cume_dist`) to every row. No corpus sort, no corpus window.
 */
object RankNormalize {

  def globalRank(df: DataFrame, scoreCol: String): DataFrame = {
    val buckets = df.groupBy(col(scoreCol).as("__score"))
      .agg(count(lit(1)).as("__n"))
    val wBefore = Window.orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = buckets
      .withColumn("__better", coalesce(sum(col("__n")).over(wBefore), lit(0L)))
      .withColumn("__cum", sum(col("__n")).over(wIncl))
    // total rows from the bucket table itself — no extra corpus pass
    val withTotal = ranked.crossJoin(
      broadcast(ranked.agg(sum(col("__n")).as("__total"))))
    val lookup = withTotal.select(
      col("__score"),
      (col("__better") + 1L).as("rank"),
      round(col("__cum").cast("double") / col("__total"), 6).as("cume_frac"))
    df.join(broadcast(lookup), col(scoreCol) === col("__score"))
      .drop("__score")
  }
}
