package graft.tools

import graft.GraftSession
import graft.pbp.PbpPipeline
import graft.queries.QPbp
import org.apache.spark.sql.DataFrame

/** Stage-by-stage wall-clock profile of the pbp parse chain —
  * `runMain graft.tools.ProfilePbp [sfDir]`. Each stage is forced with
  * a count over the cumulative plan, so the printed deltas show which
  * stage's ADDITION costs what. */
object ProfilePbp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-profile-pbp")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val raw = QPbp.rawPbpFromEvents(spark, sfDir).cache()
    time("raw materialize")(raw.count())

    import PbpPipeline._
    def force(label: String, df: => DataFrame): DataFrame = {
      val d = df
      time(label)(d.count())
      d
    }
    val m = force("metadata", metadata(raw))
    val f = force("+flags", flags(m))
    val o = force("+outs", outs(f))
    val r = force("+runs", runs(o))
    val sc = force("+scores", scores(r))
    val b = force("+baseState", baseState(classify(sc)))
    val bo = force("+batOrder+classify", batOrder(b))
    time("full parse again (uncached)")(parse(raw).count())

    // enrichment half of pbp01
    import org.apache.spark.sql.functions._
    val parsed = time("parse+cache materialize") {
      val p = parse(raw).cache(); p.count(); p
    }
    val er = time("ER matrix (cached)") {
      val e = graft.metrics.ExpectedRuns.matrix(parsed).cache(); e.count(); e
    }
    time("re24 alone")(graft.metrics.LinearWeights.re24(parsed, er).count())
    val lw = time("linear weights (cached)") {
      val l = graft.metrics.LinearWeights.aboveAverage(parsed, er)
        .select(col("events"), col("linear_weights_above_outs").as("normalized_weight"))
        .cache()
      l.count(); l
    }
    time("addWoba")(graft.metrics.PbpMetrics.addWoba(parsed, lw).count())
    time("addWoba+RE")(graft.metrics.PbpMetrics.addRunExpectancy(
      graft.metrics.PbpMetrics.addWoba(parsed, lw), er).count())
    raw.unpersist()
    spark.stop()
  }
}
