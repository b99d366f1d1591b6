package graft.tools
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local("graft-plan-peek")
    val p = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    println("PLAN_START"); println(p.take(6000)); println("PLAN_END")
    spark.stop()
  }
}
