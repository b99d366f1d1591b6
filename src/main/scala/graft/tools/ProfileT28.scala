package graft.tools

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch profile for t28_budget_select — `runMain graft.tools
  * .ProfileT28 [sfDir]`: times the scoring scan, the bucket agg, and
  * the full operator, twice (cold/warm). */
object ProfileT28 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local("graft-profile-t28")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"T28 $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val t = col("text")
      val scored = Tables.documents(spark, sfDir).select(
        col("doc_id"),
        TextFunctions.tokenCount(t).cast("long").as("n_tokens"),
        round(TextFunctions.qualityScore(t), 6).as("quality"))
      time("scoring scan")(scored.count())
      time("distinct scores")(println("  distinct=" + scored.select("quality").distinct().count()))
      time("bucket agg")(scored.groupBy("quality").agg(sum("n_tokens")).count())
      time("full operator")(graft.operators.Sampling.selectToBudget(
        scored, "quality", "doc_id", "n_tokens", 20000L).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
