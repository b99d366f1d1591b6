package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A1: the RE24 expected-runs matrix (reference
 * `processors/get_er_matrix.py:11-63`): mean remaining-inning runs and
 * P(score>0) per (base state, outs), scattered into the 8×3 wide
 * table. One hash aggregation over the pbp scan + a broadcast join to
 * the literal 8-row base-state frame (missing cells default to 0.0,
 * matching the reference's zero-initialized matrix).
 */
object ExpectedRuns {

  val baseStates: Seq[String] = Seq("NNN", "YNN", "NYN", "YYN", "NNY", "YNY", "NYY", "YYY")

  /** Input: parsed pbp with (bases_before, outs_before, runs_roi).
    * Output: (bases, erv_0..2, prob_0..2) — one row per base state,
    * ordered by `bases`. */
  def matrix(pbp: DataFrame): DataFrame = {
    val spark = pbp.sparkSession
    import spark.implicits._

    val agg = pbp
      .select(col("bases_before").as("bases"), col("outs_before").as("outs"), col("runs_roi"))
      .na.drop()
      .groupBy("bases", "outs")
      .agg(
        round(avg(col("runs_roi")), 3).as("erv"),
        round(avg(when(col("runs_roi") > 0, 1.0).otherwise(0.0)), 3).as("prob_score"),
        count(lit(1)).as("count"))
      // the reference only scatters outs 0..2 into the matrix
      .filter(col("outs").between(0, 2))

    val wide = agg
      .groupBy("bases")
      .pivot("outs", Seq(0, 1, 2))
      .agg(first("erv").as("erv"), first("prob_score").as("prob"))

    val all = baseStates.toDF("bases")
    val joined = all.join(broadcast(wide), Seq("bases"), "left")
    val out = Seq("0", "1", "2").foldLeft(joined) { (d, o) =>
      d.withColumn(s"erv_$o", coalesce(col(s"${o}_erv"), lit(0.0)))
        .withColumn(s"prob_$o", coalesce(col(s"${o}_prob"), lit(0.0)))
    }
    out.select(col("bases"),
        col("erv_0"), col("erv_1"), col("erv_2"),
        col("prob_0"), col("prob_1"), col("prob_2"))
      .orderBy("bases")
  }

  /** Long form of the wide matrix: (bases, outs, erv) for joins. */
  def unpivot(erWide: DataFrame): DataFrame =
    erWide.select(col("bases"),
      explode(array(
        struct(lit(0).as("outs"), col("erv_0").as("erv")),
        struct(lit(1).as("outs"), col("erv_1").as("erv")),
        struct(lit(2).as("outs"), col("erv_2").as("erv")))).as("x"))
      .select(col("bases"), col("x.outs").as("outs"), col("x.erv").as("erv"))
}
