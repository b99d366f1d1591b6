package graft.leaderboards

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A5/A6/A7 kernel fixtures vs hand-computed values (reference
  * `leaderboards/common.py:23-63`, `situational.py`). */
class KernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eps(a: Double, b: Double, e: Double = 1e-9) = assert(math.abs(a - b) < e, s"$a vs $b")

  private val weights: Kernel.Weights = Map(
    "walk" -> 0.7, "hit_by_pitch" -> 0.73, "single" -> 0.9,
    "double" -> 1.25, "triple" -> 1.6, "home_run" -> 2.0)

  // (batter, event, sf_fl, rea, r1, r2, r3, hi_fl, lo_fl)
  private val pbp = Seq(
    ("B1", "1B", 0, 0.4, "", "", "", false, true),
    ("B1", "BB", 0, 0.3, "X", "", "", false, false),
    ("B1", "OUT", 0, -0.2, "X", "Y", "", true, false),
    ("B1", "HR", 0, 1.8, "", "", "Z", true, false),
    ("B1", "SO", 0, -0.3, "", "", "", false, true),
    ("B1", "NP", 0, 0.0, "", "", "", false, false), // not counted anywhere
    ("B2", "E", 1, 0.1, "", "", "", false, false))
    .toDF("batter_id", "event_type", "sf_fl", "rea", "r1_name", "r2_name", "r3_name",
      "high_leverage_fl", "low_leverage_fl")

  test("battingMetrics: counts, woba, slash line") {
    val m = Kernel.battingMetrics(pbp, Seq("batter_id"), weights)
      .collect().map(r => r.getString(0) -> r).toMap
    val b1 = m("B1")
    // B1: 1b=1, hr=1, bb=1, outs=2 (OUT+SO) → hits=2, ab=4, pa=5
    assert(b1.getAs[Long]("pa") === 5)
    eps(b1.getAs[Double]("ba"), 2.0 / 4)
    eps(b1.getAs[Double]("woba"), (0.7 * 1 + 0.9 * 1 + 2.0 * 1) / 5)
    eps(b1.getAs[Double]("slg"), (1 + 4.0) / 4)
    eps(b1.getAs[Double]("obp"), (2 + 1.0) / 5)
    eps(b1.getAs[Double]("rea"), 0.4 + 0.3 - 0.2 + 1.8 - 0.3)
    // B2: error + sf → ab=1, pa=2, hits 0
    val b2 = m("B2")
    assert(b2.getAs[Long]("pa") === 2)
    eps(b2.getAs[Double]("ba"), 0.0)
  }

  test("situational: five situations in one pass, wide columns") {
    val s = Kernel.situational(pbp, Seq("batter_id"), weights)
      .collect().map(r => r.getString(0) -> r).toMap
    val b1 = s("B1")
    assert(b1.getAs[Long]("pa_overall") === 5)
    // risp rows for B1: OUT (r2 occupied) + HR (r3) → ab=2, pa=2
    assert(b1.getAs[Long]("pa_risp") === 2)
    eps(b1.getAs[Double]("woba_risp"), 2.0 / 2)
    // runners_on adds the BB row → pa=3
    assert(b1.getAs[Long]("pa_runners_on") === 3)
    // high leverage: OUT + HR
    assert(b1.getAs[Long]("pa_high_leverage") === 2)
    eps(b1.getAs[Double]("rea_high_leverage"), 1.6)
    // low leverage: 1B + SO
    assert(b1.getAs[Long]("pa_low_leverage") === 2)
    // B2 has no risp rows → pa 0, null woba
    val b2 = s("B2")
    assert(b2.getAs[Long]("pa_risp") === 0)
    assert(b2.isNullAt(b2.fieldIndex("woba_risp")))
  }

  test("handednessSplits: one-pass vs-R/L/S wide table") {
    val pbpH = pbp.withColumn("pitcher_hand",
      when(col("event_type").isin("1B", "HR"), "R")
        .when(col("event_type") === "BB", "L"))
    val s = Kernel.handednessSplits(pbpH, Seq("batter_id"), "pitcher_hand", weights)
      .collect().map(r => r.getString(0) -> r).toMap
    val b1 = s("B1")
    assert(b1.getAs[Long]("pa_vs_R") === 2) // 1B + HR
    assert(b1.getAs[Long]("pa_vs_L") === 1) // BB
    assert(b1.getAs[Long]("pa_vs_S") === 0)
    eps(b1.getAs[Double]("woba_vs_L"), 0.7)
  }

  test("battedBallProfile ratios") {
    val bb = Seq(
      ("B1", "GB"), ("B1", "GB"), ("B1", "FB"), ("B1", "LD"),
      ("B2", "PU"), ("B1", null))
      .toDF("batter_id", "batted_ball_type")
    val p = Kernel.battedBallProfile(bb, Seq("batter_id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("B1").getAs[Long]("batted_balls") === 4)
    eps(p("B1").getAs[Double]("gb_pct"), 50.0)
    eps(p("B1").getAs[Double]("gb_fb_ratio"), 2.0)
    assert(p("B2").getAs[Long]("pu") === 1)
  }

  test("addHandedness normalizes and broadcasts the info dim") {
    val pbp2 = Seq(("P1", "B1"), ("P2", "B9")).toDF("pitcher_id", "batter_id")
    val info = Seq(("P1", "Right", "left"), ("B1", "SWITCH", "Both"), ("P2", null, null))
      .toDF("player_id", "throws", "bats")
    val out = Kernel.addHandedness(pbp2, info).orderBy("pitcher_id").collect()
    assert(out(0).getAs[String]("pitcher_hand") === "R")
    assert(out(0).getAs[String]("batter_hand") === "B")
    assert(out(1).getAs[String]("pitcher_hand") === null)
    assert(out(1).getAs[String]("batter_hand") === null)
  }
}
