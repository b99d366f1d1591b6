package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe for environment capabilities (ns timestamps, etc.). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    em.printSchema()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    spark.stop()
  }
}
