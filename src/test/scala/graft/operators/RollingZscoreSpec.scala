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

/** Rolling.ewma (w14) — pandas adjust=True α=1/2 over a finite
  * horizon, hand-checked against the closed form. */
class RollingEwmaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vals: Seq[Long], half: Int = 12): Seq[Double] =
    Rolling.ewma(
        vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
          .toDF("k", "i", "v"),
        col("k"), Seq(col("i")), col("v"), half)
      .orderBy("i").select("ewma").as[Double].collect().toSeq

  test("matches the adjust=True closed form on a short series") {
    // row 0: 4; row 1: (8 + 4·0.5)/1.5; row 2: (2 + 8·0.5 + 4·0.25)/1.75
    val r = run(Seq(4L, 8L, 2L))
    assert(r(0) === 4.0)
    assert(r(1) === math.rint(10.0 / 1.5 * 1e6) / 1e6)
    assert(r(2) === 4.0) // 7/1.75 = 4 exactly
  }

  test("constant series smooths to the constant at every row") {
    assert(run(Seq.fill(20)(7L)).forall(_ === 7.0))
  }

  test("history beyond the horizon is fully forgotten") {
    // a huge first value followed by `half` zeros: once the window
    // slides past it, the smoothed value is exactly 0
    val r = run(1000000L +: Seq.fill(12)(0L))
    assert(r.last === 0.0)
    assert(r(11) > 0.0) // one row earlier the spike still contributes
  }

  test("partition-invariant across repartitioning") {
    val df = (0 until 100).map(i => ("k" + i % 3, i.toLong, (i * 37 % 11).toLong))
      .toDF("k", "i", "v")
    val a = Rolling.ewma(df, col("k"), Seq(col("i")), col("v"), 12)
      .orderBy("k", "i").select("ewma").as[Double].collect().toSeq
    val b = Rolling.ewma(df.repartition(7), col("k"), Seq(col("i")), col("v"), 12)
      .orderBy("k", "i").select("ewma").as[Double].collect().toSeq
    assert(a === b)
  }

  test("the horizon cap guards Long overflow: half = 53 is rejected") {
    // the numerator sums weights totalling 2^half − 1, so at half 53
    // even modest values risk wrapping Long arithmetic; the cap at 52
    // admits |value| up to ~2048 exactly
    intercept[IllegalArgumentException] { run(Seq(1L, 2L), half = 53) }
    // half = 52 at the admitted magnitude stays exact
    assert(run(Seq.fill(3)(2048L), half = 52).forall(_ === 2048.0))
  }
}
