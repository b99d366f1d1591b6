package graft.tools
import graft.metrics.{ExpectedRuns, LinearWeights, PbpMetrics}
import graft.pbp.PbpPipeline
import graft.queries.QPbp
import org.apache.spark.sql.functions._
object PbpPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local("graft-pbp-phases")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val parsed = time("build parsed plan") {
        PbpPipeline.parse(QPbp.rawPbpFromEvents(spark, sfDir))
          .select("contest_id", "play_id", "event_type", "batted_ball_type",
            "batter_name", "bases_before", "bases_after", "outs_before",
            "outs_after", "inn_end_fl", "runs_on_play", "runs_roi").cache()
      }
      time("analyze+optimize")(parsed.queryExecution.executedPlan)
      time("parsed.count")(parsed.count())
      val er = time("er")(ExpectedRuns.matrix(parsed).cache())
      time("er.count")(er.count())
      val lw = time("lw") {
        LinearWeights.aboveAverage(parsed, er)
          .select(col("events"), col("linear_weights_above_outs").as("normalized_weight")).cache()
      }
      time("lw.count")(lw.count())
      val fin = time("final plan") {
        PbpMetrics.addRunExpectancy(PbpMetrics.addWoba(parsed, lw), er)
          .select("contest_id", "play_id", "event_type", "batted_ball_type",
            "batter_name", "bases_before", "bases_after", "outs_before",
            "runs_on_play", "woba", "rea")
          .orderBy("contest_id", "play_id")
      }
      time("final.count")(fin.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
