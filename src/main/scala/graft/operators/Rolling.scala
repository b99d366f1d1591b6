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

  /**
   * Rolling z-score outlier flags over a trailing window — the
   * streaming-telemetry anomaly pass (flag a reading that sits more
   * than `k` standard deviations from its own recent history). The
   * window is the `n` PRECEDING rows EXCLUSIVE of the current row, so
   * the tested value never contaminates its own baseline.
   *
   * Everything stays in EXACT integer arithmetic so the flag is
   * bit-identical to any other engine: with integer value `v`,
   * trailing count `m`, sum `s` and sum-of-squares `q`,
   *
   *   |z| > k  ⇔  (v − s/m)² > k²·(q/m − (s/m)²)
   *            ⇔  (m·v − s)² > k²·(m·q − s²)
   *
   * — a pure Long comparison (no division, no sqrt, no doubles).
   * A zero-variance window (m·q = s²) flags any deviation at all,
   * the natural limit of z → ∞. Rows with fewer than `minN` trailing
   * observations are reported unflagged (`n_win` tells the caller
   * why). One window frame over one `key` exchange; at 100 TB this is
   * the same single-shuffle shape as every other per-entity window.
   *
   * @param value integer-valued column (e.g. cents); the caller owns
   *              the scaling. Products must fit a Long:
   *              (n·max|v|)² bounds the comparison terms.
   * @param k     whole-σ threshold (k=2 or 3 typically).
   */
  def zscoreOutliers(
      df: DataFrame,
      key: Column,
      orderCols: Seq[Column],
      value: Column,
      n: Int,
      k: Int,
      minN: Int): DataFrame = {
    require(n >= minN && minN >= 2, s"need n >= minN >= 2, got n=$n minN=$minN")
    val w = Window.partitionBy(key).orderBy(orderCols: _*).rowsBetween(-n, -1)
    val m = count(value).over(w)
    val s = sum(value).over(w)
    val q = sum(value * value).over(w)
    val lhs = (m * value - s) * (m * value - s)
    val rhs = lit(k.toLong * k) * (m * q - s * s)
    df.withColumn("n_win", m)
      .withColumn("is_outlier", col("n_win") >= minN && lhs > rhs)
  }

  /**
   * Trailing exponentially-weighted moving average — the smoothing
   * half of the telemetry pass ([[zscoreOutliers]] flags, this
   * trends). Pandas-style `adjust=True` semantics with α = 1/2 over a
   * FINITE horizon of the last `half` rows (inclusive of the current):
   *
   *   ewma_i = Σ_{j<half} 2^{−j}·v_{i−j} / Σ_{j<half} 2^{−j}
   *
   * truncated to the rows that exist at the head of each partition.
   * The horizon keeps the window a plain ROWS frame (no recursive
   * state), and the tail it drops is < 2^−half of the weight — noise
   * at half ≥ 12.
   *
   * Determinism: both sums are computed in EXACT Long arithmetic with
   * integer weights 2^(half−1−j). The numerator sums weights totalling
   * 2^half − 1, so |value| · (2^half − 1) must fit a Long — at the
   * half = 52 cap that admits |value| up to ~2048; the ONE
   * floating-point operation is the final correctly-rounded IEEE
   * division, so the rounded result is bit-identical in any engine.
   * The `half` lag terms all ride one window frame over one key
   * exchange — the standing single-shuffle per-entity shape.
   */
  def ewma(
      df: DataFrame,
      key: Column,
      orderCols: Seq[Column],
      value: Column,
      half: Int,
      out: String = "ewma"): DataFrame = {
    require(half >= 1 && half <= 52, s"half must be in [1, 52], got $half")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val terms = (0 until half).map { j =>
      val v = if (j == 0) value else lag(value, j).over(w)
      val weight = 1L << (half - 1 - j)
      (coalesce(v, lit(0L)) * lit(weight),
        when(v.isNull, lit(0L)).otherwise(lit(weight)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn(out, round(num.cast("double") / den, 6))
  }
}
