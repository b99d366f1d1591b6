package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rolling.zscoreOutliers — the exact-integer trailing z-score flag
  * (w13). The interesting cases are the boundaries: z EXACTLY k must
  * not flag (strict >), one integer above must; a zero-variance
  * window flags any deviation; short windows stay unflagged. */
class RollingZscoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vals: Seq[Long], n: Int = 24, k: Int = 2, minN: Int = 10) =
    Rolling.zscoreOutliers(
        vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
          .toDF("k", "i", "v"),
        col("k"), Seq(col("i")), col("v"), n, k, minN)
      .orderBy("i")
      .select("n_win", "is_outlier")
      .as[(Long, Boolean)].collect()

  // trailing history five 0s + five 10s: m=10, s=50, q=500,
  // m·q−s² = 2500, k²·2500 = 10000; (10v−50)² = 10000 at v=15 exactly.
  private val hist = Seq[Long](0, 10, 0, 10, 0, 10, 0, 10, 0, 10)

  test("z exactly k is NOT an outlier; one unit above is") {
    val at = run(hist :+ 15L).last // z == 2.0 exactly
    assert(at === ((10L, false)))
    val above = run(hist :+ 16L).last // (110)² = 12100 > 10000
    assert(above === ((10L, true)))
    val belowNeg = run(hist :+ -5L).last // z == −2.0 exactly
    assert(belowNeg === ((10L, false)))
    val aboveNeg = run(hist :+ -6L).last
    assert(aboveNeg === ((10L, true)))
  }

  test("zero-variance window flags ANY deviation, not a constant") {
    val flat = Seq.fill(10)(100L)
    assert(run(flat :+ 100L).last === ((10L, false)))
    assert(run(flat :+ 101L).last === ((10L, true))) // z → ∞ limit
  }

  test("windows shorter than minN never flag, and n_win reports why") {
    val out = run(Seq(0L, 1000L, 0L, 1000L, 0L, 1000L))
    assert(out.forall(!_._2))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("window excludes the current row and caps at n trailing rows") {
    // 30 identical rows then a spike: the spike's window must hold
    // n=24 rows (not 30), all pre-spike, so it flags.
    val out = run(Seq.fill(30)(50L) :+ 51L, n = 24)
    assert(out.last === ((24L, true)))
  }
}
