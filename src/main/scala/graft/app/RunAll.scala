package graft.app

import graft.GraftSession
import graft.leaderboards.Kernel
import graft.metrics.{ExpectedRuns, LinearWeights, PbpMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The analytics DAG driver (reference `processors/run_all.py:52-154`,
 * SURVEY §3.1): raw pbp → parsed → expected runs → linear weights →
 * pbp_with_metrics → leaderboards, with PARQUET stage boundaries
 * (the reference's CSV-file dataflow edges, kept for restartability
 * and external checkability — each stage is re-runnable from its
 * predecessor's output).
 *
 * Inputs beyond the raw pbp are optional: win-expectancy/leverage
 * tables gate the WPA/LI stage (absent → the RE/wOBA enrichment still
 * runs), mirroring the reference's per-stage skip-on-missing
 * tolerance (`leaderboards/main.py:224-227`).
 */
object RunAll {

  final case class StageResult(name: String, path: String, rows: Long)

  def run(
      spark: SparkSession,
      rawPbp: DataFrame,
      outDir: String,
      weTable: Option[DataFrame] = None,
      liTable: Option[DataFrame] = None): Seq[StageResult] = {

    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    def write(df: DataFrame, name: String): DataFrame = {
      val path = s"$outDir/$name"
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      results += StageResult(name, path, back.count())
      back
    }

    // 1. parse (pbp_parser stage)
    val parsed = write(graft.pbp.PbpPipeline.parse(rawPbp), "parsed_pbp")

    // 2. expected runs (get_er_matrix stage)
    val er = write(ExpectedRuns.matrix(parsed), "expected_runs")

    // 3. linear weights (get_linear_weights stage). Without season
    // batting stats the wOBA scale is unavailable; above-outs weights
    // stand in as normalized weights (scale 1), as documented.
    val lw = write(LinearWeights.aboveAverage(parsed, er), "linear_weights")
    val lwNormalized = lw.select(col("events"),
      col("linear_weights_above_outs").as("normalized_weight"))

    // 4. metric enrichment (add_pbp_metrics stage)
    val withBase = PbpMetrics.addRunExpectancy(
      PbpMetrics.addWoba(parsed, lwNormalized), er)
    val enriched = (weTable, liTable) match {
      case (Some(we), Some(li)) =>
        PbpMetrics.addFlags(
          PbpMetrics.addWinExpectancy(withBase, we, li)
            .withColumn("pitcher_name", lit("")))
      case _ =>
        withBase
          .withColumn("li", lit(null).cast("double"))
          .withColumn("high_leverage_fl", lit(false))
          .withColumn("low_leverage_fl", lit(false))
    }
    val metrics = write(enriched, "pbp_with_metrics")

    // 5. leaderboards (leaderboards stage) — one cached scan feeds
    // the aggregate fan-out (reference main.py:55-85)
    val weights = lwNormalized.collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
    val forKernel = metrics.withColumn("batter_id", col("batter_name")).cache()
    write(Kernel.battingMetrics(forKernel, Seq("batter_id"), weights), "leaderboard_batting")
    write(Kernel.situational(forKernel, Seq("batter_id"), weights), "leaderboard_situational")
    write(Kernel.battedBallProfile(forKernel, Seq("batter_id")), "leaderboard_batted_ball")
    forKernel.unpersist()

    results.toSeq
  }

  /** CLI: runAll <rawPbpParquet> <outDir> — raw schema
    * (contest_id, seq, inning, away_text, home_text). */
  def main(args: Array[String]): Unit = {
    val Array(rawPath, outDir) = args.take(2)
    val spark = GraftSession.get("graft-run-all")
    val raw = spark.read.parquet(rawPath)
    val results = run(spark, raw, outDir)
    results.foreach(r => println(s"STAGE ${r.name}: ${r.rows} rows -> ${r.path}"))
    spark.stop()
  }
}
