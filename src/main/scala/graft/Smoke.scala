package graft

/** t1-style smoke: run the flagship `SparkEntry.entry` query (sf0.001)
  * and print its row count + the registry sizes. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-smoke")
    val e = SparkEntry.entry(spark)
    e.show(5, truncate = false)
    println(s"ENTRY_ROWS=${e.count()}")
    println(s"NQUERIES=${SparkEntry.queries.size} NORACLES=${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
