package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Row-count rolling statistics — the reference's rolling-wOBA
 * leaderboard (reference `processors/leaderboards/rolling.py:4-59`,
 * SURVEY W12): for each entity, the mean of the last `n` events, the
 * same mean `n` events earlier, and only the latest row of entities
 * with at least `2n` events. The pandas original materializes
 * per-player frames in a Python loop; here it is three stacked window
 * functions over one shuffle.
 */
object Rolling {

  /**
   * @param orderCols order within the key — pass enough columns to be
   *                  a total order (ties would make lag/rolling
   *                  nondeterministic).
   */
  def meanNowVsThen(
      df: DataFrame,
      key: Column,
      orderCols: Seq[Column],
      value: Column,
      n: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val wDesc = Window.partitionBy(key).orderBy(orderCols.map(_.desc): _*)
    val roll = avg(value).over(w.rowsBetween(-(n - 1), Window.currentRow))
    df.withColumn("roll_now", roll)
      .withColumn("roll_then", lag(col("roll_now"), n).over(w))
      .withColumn("__n_events",
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn_desc", row_number().over(wDesc))
      .filter(col("__rn_desc") === 1 && col("__n_events") >= 2 * n)
      .drop("__rn_desc")
      .withColumnRenamed("__n_events", "n_events")
      .withColumn("roll_now", round(col("roll_now"), 6))
      .withColumn("roll_then", round(col("roll_then"), 6))
      .withColumn("delta", round(col("roll_now") - col("roll_then"), 6))
  }
}
