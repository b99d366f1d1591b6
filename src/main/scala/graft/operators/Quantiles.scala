package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact percentiles via the value HISTOGRAM — corpus statistics
 * without a corpus-wide sort. The corpus collapses to (value, count)
 * in one hash aggregation (map-side combine bounds the shuffle by the
 * number of DISTINCT values, not rows); the cumulative sum runs over
 * that histogram (a dimension-sized table — the single-partition
 * window is over |distinct values| rows, the t28/t29 bucket-table
 * idiom); each requested percentile then picks the SMALLEST value
 * whose cumulative count reaches `ceil(p·n)` — discrete-quantile
 * semantics (`quantile_disc`), exact at any corpus size.
 *
 * The right tool for low-cardinality measures (lengths, counts,
 * scores quantized to fixed decimals — the corpus-stats columns a
 * data pipeline actually monitors). For genuinely continuous
 * high-cardinality columns, quantize first (the [[RankNormalize]]
 * precondition) or accept a t-digest-style approximation.
 */
object Quantiles {

  /** (p, value) for each requested percentile, ordered by p. */
  def exactPercentiles(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val h = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
    val cum = h.withColumn("cum", sum("c").over(Window.orderBy("v")))
    val n = h.agg(sum("c").as("n")) // 1-row total, broadcast below
    ps.toDF("p")
      .crossJoin(broadcast(n))
      .join(broadcast(cum), col("cum") >= ceil(col("p") * col("n")))
      .groupBy("p").agg(min("v").as("value"))
      .orderBy("p")
  }

  /** Per-group exact percentiles: (group, p, value). Same histogram
    * construction, cumulative + total in one window pass partitioned
    * by group; the tiny percentile list broadcasts against the
    * histogram (map-only ×|ps| expansion), and the final aggregation
    * shuffles |histogram|·|ps| rows at most — never the corpus. */
  def exactPercentilesByGroup(
      df: DataFrame, groupCol: String, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val h = df.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = h
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    cum.crossJoin(broadcast(ps.toDF("p")))
      .filter(col("cum") >= ceil(col("p") * col("n")))
      .groupBy("g", "p").agg(min("v").as("value"))
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol, "p")
  }
}
