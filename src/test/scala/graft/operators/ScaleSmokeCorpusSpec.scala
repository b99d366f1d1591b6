package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import graft.tools.{AnnScaleSmoke, EventsScaleSmoke}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale smokes' copy constructions carry the proof burden for
  * their exact invariants — pin the two load-bearing properties:
  * sign-pattern copies are EXACT dot-product isometries (so intra-copy
  * geometry replicates bit-for-bit), and events copies occupy disjoint
  * id blocks (so per-user operators can never mix copies). */
class ScaleSmokeCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("scaledVectors: per-copy sign patterns are exact dot-product isometries") {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .filter(col("vec_id") < 20)
    val scaled = AnnScaleSmoke.scaledVectors(base, 3)
      .as[(Long, Array[Float])].collect().toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val ids = (0L until 20L).toSeq
    for (k <- 1 to 2; i <- ids; j <- ids if i < j) {
      val off = k * 10000000L
      // ±1 scaling is exact in IEEE float, so equality is BITWISE
      assert(dot(scaled(i + off), scaled(j + off)) === dot(scaled(i), scaled(j)),
        s"copy $k broke the isometry for pair ($i,$j)")
    }
    // and the patterns genuinely differ between copies: the same base
    // vector must NOT be near-parallel across copies (the AnnScaleSmoke
    // cross-copy invariant depends on this decorrelation)
    for (i <- ids) {
      val a = scaled(i); val b = scaled(i + 10000000L)
      val cos = dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
      assert(math.abs(cos) < 0.9, s"vec $i cross-copy cos=$cos — patterns too correlated")
    }
  }

  test("scaledEvents: copies occupy disjoint user and event id blocks") {
    val base = Tables.events(spark, dir).select("event_id", "user_id", "ts", "ts_ns",
      "event_type", "value")
    val n = base.count()
    val scaled = EventsScaleSmoke.scaledEvents(base, 3)
    assert(scaled.count() === n * 3)
    assert(scaled.select("event_id").distinct().count() === n * 3)
    // user blocks must not overlap: per-copy user sets are the base
    // set shifted by exactly k*1e7
    val perBlock = scaled
      .groupBy((col("user_id") / 10000000L).cast("long").as("block"))
      .agg(countDistinct("user_id").as("users"), count(lit(1)).as("n"))
      .orderBy("block").collect()
    assert(perBlock.length === 3, perBlock.mkString(","))
    val users0 = perBlock.head.getLong(1)
    perBlock.foreach { r =>
      assert(r.getLong(1) === users0 && r.getLong(2) === n, r.toString)
    }
  }
}
