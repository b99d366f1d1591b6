package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-count sketch: exact when under-full, accurate within
  * the published error bound when estimating, and — the property the
  * oracle depends on — a pure function of the value SET (layout,
  * order, and duplication invariant). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(n: Int, g: String = "a") =
    (1 to n).map(i => (g, s"v$i")).toDF("g", "v")

  test("under-full sketch counts exactly") {
    val out = Sketches.kmvDistinct(dist(20), Seq("g"), "v", k = 32)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 20L, 20L)))
  }

  test("duplicates never change the sketch or the estimate") {
    val base = dist(20)
    val dup = base.union(base).union(base)
    val a = Sketches.kmvDistinct(base, Seq("g"), "v", k = 32).collect().toSeq
    val b = Sketches.kmvDistinct(dup, Seq("g"), "v", k = 32).collect().toSeq
    assert(a === b)
  }

  test("estimate within 3/sqrt(k-2) relative error at 10k distinct") {
    val n = 10000
    val Seq((_, kept, est)) = Sketches.kmvDistinct(dist(n), Seq("g"), "v", k = 128)
      .as[(String, Long, Long)].collect().toSeq
    assert(kept === 128L)
    val relErr = math.abs(est.toDouble - n) / n
    assert(relErr < 3.0 / math.sqrt(126.0),
      s"estimate $est for true $n: rel err $relErr outside 3-sigma bound")
  }

  test("layout-independent: repartition and input order cannot move the estimate") {
    val df = dist(5000, "x").union(dist(300, "y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(d, Seq("g"), "v", k = 64)
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val a = run(df)
    assert(a === run(df.repartition(17)))
    assert(a === run(df.orderBy(col("v").desc)))
  }

  test("sketch merge across a union equals the sketch of the union (mergeable synopsis)") {
    // Persist per-batch sketches as plain arrays, re-aggregate by
    // exploding — the incremental-history pattern — and compare to the
    // one-shot sketch over the concatenated corpus.
    val b1 = dist(500).filter(col("v") < "v5")
    val b2 = dist(500).filter(col("v") >= "v5")
    val agg = Sketches.kMinDistinct(16)
    val perBatch = Seq(b1, b2).map(
      _.select(col("g"), graft.functions.ScalarFunctions.md5Long(col("v")).as("h"))
        .groupBy("g").agg(agg(col("h")).as("ks")))
    val merged = Sketches
      .mergeSketches(perBatch.reduce(_ union _), Seq("g"), "ks", k = 16)
      .as[(String, Seq[Long])].collect().toMap
    val oneShot = b1.union(b2)
      .select(col("g"), graft.functions.ScalarFunctions.md5Long(col("v")).as("h"))
      .groupBy("g").agg(agg(col("h")).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === oneShot)
  }
}
