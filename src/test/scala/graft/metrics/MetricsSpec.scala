package graft.metrics

import graft.SparkTestSession
import graft.pbp.EventType
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for the metric stages (reference
  * `get_er_matrix.py`, `get_linear_weights.py`, `get_guts.py`,
  * `add_pbp_metrics.py`) — hand-computed expected values. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eps(a: Double, b: Double, e: Double = 1e-9) = assert(math.abs(a - b) < e, s"$a vs $b")

  // 8-state wide RE matrix fixture: only NNN/YNN populated
  private lazy val erWide = Seq(
    ("NNN", 0.5, 0.3, 0.1, 0.0, 0.0, 0.0),
    ("YNN", 0.9, 0.6, 0.2, 0.0, 0.0, 0.0),
    ("NYN", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("YYN", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("NNY", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("YNY", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("NYY", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ("YYY", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    .toDF("bases", "erv_0", "erv_1", "erv_2", "prob_0", "prob_1", "prob_2")

  test("ExpectedRuns.matrix: means, prob_score and zero-filled cells") {
    val pbp = Seq(
      ("NNN", 0, 0), ("NNN", 0, 2), ("NNN", 0, 1), ("YNN", 1, 1))
      .toDF("bases_before", "outs_before", "runs_roi")
    val m = ExpectedRuns.matrix(pbp).collect().map(r => r.getString(0) -> r).toMap
    assert(m.size === 8)
    eps(m("NNN").getDouble(1), 1.0) // erv_0 = mean(0,2,1)
    eps(m("NNN").getDouble(4), 0.667) // prob_0 = round(2/3, 3)
    eps(m("YNN").getDouble(2), 1.0) // erv_1
    eps(m("YNN").getDouble(5), 1.0) // prob_1
    eps(m("YYY").getDouble(1), 0.0) // unseen cell zero-filled
  }

  // parsed-pbp fixture for linear weights:
  //   walk NNN0→YNN0: 0.9-0.5 = 0.4     out NNN0→NNN1: -0.2 (×2, one
  //   via inning end from YNN2)          single NNN1→YNN1: 0.3
  //   HR NNN0→NNN0 +1 run: 1.0
  private lazy val lwPbp = Seq(
    ("BB", "NNN", 0, "YNN", 0, false, 0),
    ("OUT", "NNN", 0, "NNN", 1, false, 0),
    ("OUT", "YNN", 2, "YNN", 3, true, 0),
    ("1B", "NNN", 1, "YNN", 1, false, 0),
    ("HR", "NNN", 0, "NNN", 0, false, 1))
    .toDF("event_type", "bases_before", "outs_before", "bases_after", "outs_after",
      "inn_end_fl", "runs_on_play")

  test("LinearWeights.aboveAverage: per-class means re-baselined on outs") {
    val lw = LinearWeights.aboveAverage(lwPbp, erWide).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // out rows: NNN0→NNN1 = 0.3-0.5 = -0.2; YNN2 inning end: 0 - 0.2 = -0.2
    assert(lw("out")._1 === 2)
    eps(lw("out")._2, -0.2); eps(lw("out")._3, 0.0)
    eps(lw("walk")._2, 0.4); eps(lw("walk")._3, 0.6)
    eps(lw("single")._2, 0.3); eps(lw("single")._3, 0.5)
    eps(lw("home_run")._2, 1.0); eps(lw("home_run")._3, 1.2)
  }

  test("LinearWeights.normalized: wOBA scale from league OBP") {
    val batting = Seq((100L, 20L, 5L, 10L, 50L, 10L, 400L, 5L, 5L))
      .toDF("h", "2b", "3b", "hr", "bb", "hbp", "ab", "sf", "sh")
    val lw = LinearWeights.aboveAverage(lwPbp, erWide)
    val out = LinearWeights.normalized(lw, batting).collect()
      .map(r => r.getString(0) -> r).toMap
    // denom = (0.6+0.5+1.2+0)/5 = 0.46; obp = 160/470; scale = obp/denom
    val scale = (160.0 / 470) / 0.46
    eps(out("woba_scale").getDouble(4),
      BigDecimal(scale).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    eps(out("walk").getDouble(4),
      BigDecimal(0.6 * scale).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("woba_scale").isNullAt(1))
  }

  test("Guts.compute: run environment, SB values, FIP constant") {
    val pbp = Seq(
      // (event_type, runs, outs, bat_order, contest)
      ("1B", 1, 0, Some(1), 1L), ("OUT", 0, 1, Some(2), 1L), ("SB", 0, 0, None, 1L),
      ("CS", 0, 1, None, 1L), ("HR", 3, 0, Some(3), 2L), ("OUT", 0, 2, Some(4), 2L))
      .toDF("event_type", "runs_on_play", "outs_on_play", "bat_order", "contest_id")
    val lwn = Seq(
      ("walk", Some(0.7)), ("hit_by_pitch", Some(0.73)), ("single", Some(0.9)),
      ("double", Some(1.25)), ("triple", Some(1.6)), ("home_run", Some(2.0)),
      ("out", Some(0.0)), ("woba_scale", Some(1.2)))
      .toDF("events", "normalized_weight")
    val batting = Seq((100L, 20L, 5L, 10L, 50L, 10L, 400L, 5L, 5L))
      .toDF("h", "2b", "3b", "hr", "bb", "hbp", "ab", "sf", "sh")
    val pitching = Seq((100.1, 50L, 10L, 40L, 5L, 120L), (50.2, 30L, 5L, 20L, 3L, 60L))
      .toDF("ip", "er", "hr_a", "bb", "hbp", "so")

    val g = Guts.compute(pbp, lwn, batting, pitching, 2024, "ncaa_1")
    assert(g.wobaScale === 1.2)
    // runs=4, outs=4 → runs_out=1.0; runs_cs = -(2*1.0+0.075) = -2.075
    eps(g.runsOut, 1.0); eps(g.runsCs, -2.075)
    eps(g.csRate, 0.5)
    // PA rows: bat_order non-null = 4 → runs_pa = 1.0
    eps(g.runsPa, 1.0)
    // per-game sums: 1 and 3 → mean 2 → (2/2)*1.5+3 = 4.5
    eps(g.runsWin, 4.5)
    // woba: singles=65: num = 50*0.7+10*0.73+65*0.9+20*1.25+5*1.6+10*2.0
    val num = 50 * 0.7 + 10 * 0.73 + 65 * 0.9 + 20 * 1.25 + 5 * 1.6 + 10 * 2.0
    eps(g.woba, BigDecimal(num / 465).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // ip: 100.1→100⅓, 50.2→50⅔ → 151; era = 80*9/151
    val ip = 100 + 1.0 / 3 + 50 + 2.0 / 3
    val cfip = (80 * 9 / ip) - ((13 * 15 + 3 * (60 + 8) - 2 * 180) / ip)
    eps(g.cfip, BigDecimal(cfip).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("PbpMetrics.enrich: woba, RE, win expectancy, WPA on a walk-off fixture") {
    val pbp = Seq(
      // play, inning, half, bb, ob, ba, oa, innEnd, gameEnd, runs, hsb, asb, hsa, asa, event
      (1, 9, "Top", "NNN", 0, "YNN", 0, false, false, 0, 0, 0, 0, 0, "BB"),
      (2, 9, "Top", "YNN", 0, "YNN", 2, true, false, 0, 0, 0, 0, 0, "OUT"),
      (3, 9, "Bottom", "NNN", 0, "NNN", 0, false, true, 1, 0, 0, 1, 0, "HR"))
      .toDF("play_id", "inning", "half", "bases_before", "outs_before", "bases_after",
        "outs_after", "inn_end_fl", "game_end_fl", "runs_on_play",
        "home_score_before", "away_score_before", "home_score_after", "away_score_after",
        "event_type")
      .withColumn("contest_id", lit(1L))
      .withColumn("batter_name", concat(lit("B"), col("play_id")))
      .withColumn("pitcher_name", lit("P1"))
      .withColumn("bat_order", col("play_id"))
    val lwn = Seq(("walk", 0.7), ("home_run", 2.0)).toDF("events", "normalized_weight")
    val we = Seq(
      (9, "Top", "NNN", 0, 0, 0.50), (9, "Top", "YNN", 0, 0, 0.55),
      (9, "Bottom", "NNN", 0, 0, 0.52))
      .toDF("inning", "half", "runners", "outs", "score_diff", "win_expectancy")
    val li = Seq(
      (9, "Top", "NNN", 0, 0, 1.0), (9, "Top", "YNN", 0, 0, 1.2),
      (9, "Bottom", "NNN", 0, 0, 1.5))
      .toDF("inning", "half", "runners", "outs", "score_diff", "leverage_index")

    val out = PbpMetrics.enrich(pbp, lwn, erWide, we, li)
      .orderBy("play_id").collect()
    def d(r: Row, c: String) = r.getAs[Double](c)

    // woba: walk 0.7, out 0.0, HR 2.0
    eps(d(out(0), "woba"), 0.7); eps(d(out(1), "woba"), 0.0); eps(d(out(2), "woba"), 2.0)
    // RE: walk NNN0→YNN0: 0.9-0.5=0.4; rea 0.4
    eps(d(out(0), "re_before"), 0.5); eps(d(out(0), "re_after"), 0.9)
    eps(d(out(0), "rea"), 0.4)
    // inning-ending out: re_after 0 → delta -0.9... before YNN0=0.9
    eps(d(out(1), "re_after"), 0.0); eps(d(out(1), "re_delta"), -0.9)
    // WE before/after and WPA
    eps(d(out(0), "home_win_exp_before"), 0.50)
    eps(d(out(0), "home_win_exp_after"), 0.55)
    eps(d(out(0), "wpa"), -0.05) // away batting
    eps(d(out(0), "li"), 1.0)
    eps(d(out(0), "wpa_li"), -0.05)
    // inning end rolls the after-key to (9, Bottom, NNN, 0)
    eps(d(out(1), "home_win_exp_after"), 0.52)
    eps(d(out(1), "wpa"), 0.03) // -(0.52-0.55)
    // walk-off: game end + home lead → 1.0
    eps(d(out(2), "home_win_exp_after"), 1.0)
    eps(d(out(2), "wpa"), 0.48)
    assert(out.forall(_.getAs[Int]("times_through_order") === 1))
    assert(out(2).getAs[Boolean]("high_leverage_fl") === false)
  }

  test("literal-map woba/RE enrichment ≡ broadcast-join enrichment") {
    val pbp = Seq(
      (1, "NNN", 0, "YNN", 0, false, 0, EventType.Walk),
      (2, "YNN", 0, "YNN", 2, true, 0, EventType.GenericOut),
      (3, "NNN", 0, "NNN", 0, false, 1, EventType.HomeRun),
      (4, "ZZZ", 0, "NNN", 1, false, 0, EventType.Single)) // unknown before-state → null re
      .toDF("play_id", "bases_before", "outs_before", "bases_after",
        "outs_after", "inn_end_fl", "runs_on_play", "event_type")
    val lwn = Seq(("walk", 0.7), ("home_run", 2.0), ("single", 0.9))
      .toDF("events", "normalized_weight")

    val viaJoin = PbpMetrics.addRunExpectancy(PbpMetrics.addWoba(pbp, lwn), erWide)
      .select("play_id", "woba", "re_before", "re_after", "re_delta", "rea")
      .orderBy("play_id").collect()

    val lwMap = lwn.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val erMap = PbpMetrics.erMatrixToMap(erWide)
    val viaLit = PbpMetrics.addRunExpectancyLit(PbpMetrics.addWobaLit(pbp, lwMap), erMap)
      .select("play_id", "woba", "re_before", "re_after", "re_delta", "rea")
      .orderBy("play_id").collect()

    assert(viaJoin.toSeq === viaLit.toSeq)
  }
}
