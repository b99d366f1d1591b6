package graft.war

import graft.SparkTestSession
import graft.metrics.GutsConstants
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for the WAR pipeline (reference
  * `war_calculation/calculator.py`, `batting.py`, `pitching.py`,
  * `sos_utils.py`). */
class WarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eps(a: Double, b: Double, e: Double = 1e-9) = assert(math.abs(a - b) < e, s"$a vs $b")

  private val guts = GutsConstants(2024, "ncaa_1",
    wbb = 0.7, whbp = 0.73, w1b = 0.9, w2b = 1.25, w3b = 1.6, whr = 2.0,
    wobaScale = 1.2, woba = 0.35,
    runsSb = 0.2, runsCs = -0.475, csRate = 0.3,
    runsPa = 0.12, runsOut = 0.2, runsWin = 10.0,
    cfip = 3.1)

  test("pitching formula kernels match hand-computed values") {
    val df = Seq((10.0, 4.0, 5.0, 30.0, 2.0, 100.0)).toDF("ip", "er", "r", "gs", "app", "pf")
    val out = df.select(
      PitchingFormulas.era(col("er"), col("ip")),
      PitchingFormulas.eraPlus(lit(4.0), 5.0, col("pf")),
      PitchingFormulas.dynamicRpw(lit(6.0), lit(5.0), lit(4.0)),
      PitchingFormulas.replacementLevel(lit(1.0), lit(2.0)),
      PitchingFormulas.pitchingWar(lit(1.0), lit(9.5), lit(0.075), lit(90.0)))
      .as[(Double, Double, Double, Double, Double)].collect().head
    eps(out._1, 3.6)
    eps(out._2, 100 * (2 - 4.0 / 5.0)) // pf 100
    eps(out._3, (((18 - 6) * 5.0 + 6 * 4.0) / 18 + 2) * 1.5)
    eps(out._4, 0.03 * 0.5 + 0.12 * 0.5)
    eps(out._5, (1.0 / 9.5 + 0.075) * 10)
  }

  test("leverage adjustment blends starter and reliever multipliers") {
    val out = Seq((2.0, 1.0, 10.0, 4.0)).toDF("war", "gmli", "app", "gs")
      .select(PitchingFormulas.leverageAdjustment(col("war"), col("gmli"), col("app"), col("gs")))
      .as[Double].collect().head
    // relief_pct = 0.6; mult = 0.6*(1+1)/2 + 0.4 = 1.0
    eps(out, 2.0)
  }

  test("batting wOBA/wRAA kernels") {
    val df = Seq((50.0, 10.0, 65.0, 20.0, 5.0, 10.0, 400.0, 5.0, 5.0, 470.0))
      .toDF("bb", "hbp", "s1", "2b", "3b", "hr", "ab", "ibb", "sf", "pa")
    val w = df.select(
      BattingFormulas.woba(col("bb"), col("hbp"), col("s1"), col("2b"), col("3b"),
        col("hr"), col("ab"), col("ibb"), col("sf"), guts).as("woba"))
      .as[Double].collect().head
    val num = 0.7 * 50 + 0.73 * 10 + 0.9 * 65 + 1.25 * 20 + 1.6 * 5 + 2.0 * 10
    eps(w, num / (400 + 50 - 5 + 5 + 10))
    val wraa = df.select(BattingFormulas.wraa(lit(w), guts.woba, guts.wobaScale, col("pa")))
      .as[Double].collect().head
    eps(wraa, (w - 0.35) / 1.2 * 470)
  }

  test("wgdp: league-rate scaled double-play runs") {
    val pbp = Seq(
      ("A", "R1", 0, "grounded into double play"),
      ("A", "R1", 1, "singled to left"),
      ("B", "R1", 0, "flied out"),
      ("B", "R1", 1, "grounded into double play"),
      ("C", "", 0, "grounded into double play"), // no runner on 1st: not an opp
      ("B", "R1", 2, "grounded into double play")) // 2 outs: not an opp
      .toDF("batter_id", "r1_id", "outs_before", "play_description")
    val out = WarPipeline.wgdp(pbp).orderBy("batter_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // opps: A=2 (1 gdp), B=2 (1 gdp); lg_rate = 2/4 = 0.5
    assert(out("A")._1 === 2 && out("A")._2 === 1)
    eps(out("A")._3, (2 * 0.5 - 1) * 0.5) // 0.0
    eps(out("B")._3, 0.0)
  }

  test("positional adjustments weight distinct games per position") {
    val lineups = Seq(
      ("P1", "ss", 1L), ("P1", "ss", 2L), ("P1", "c/1b", 3L), ("P2", "dh", 1L))
      .toDF("player_id", "position", "contest_id")
    val adj = WarPipeline.positionalAdjustments(lineups, "ncaa_1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    eps(adj("P1"), 1.85 * (2.0 / 50) + 3.09 * (1.0 / 50))
    eps(adj("P2"), -3.09 * (1.0 / 50))
    eps(WarPipeline.fallbackAdjustment("SS", 25, "ncaa_3"), 1.85 * 25.0 / 40)
  }

  test("sosRewardPunish: z-scored scaling preserves each component's total") {
    val bp = Seq(
      ("T1", 2.0, 10.0, "batting"), ("T2", 1.0, 20.0, "batting"),
      ("T3", 3.0, 30.0, "batting"), ("T4", -1.0, 40.0, "batting"),
      ("T5", 4.0, 10.0, "pitching"), ("T6", 2.0, 30.0, "pitching"))
      .toDF("team", "war", "sos_val", "component")
      .withColumn("year", lit(2024)).withColumn("division", lit("d1"))
    val out = WarPipeline.sosRewardPunish(bp, alpha = 0.2, clipSd = 3.0)
    val sums = out.groupBy("component")
      .agg(sum("war").as("raw"), sum("sos_adj_war").as("adj"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    eps(sums("batting")._1, sums("batting")._2, 1e-9)
    eps(sums("pitching")._1, sums("pitching")._2, 1e-9)
    // harder schedule (higher sos) must not decrease positive war pre-rescale
    val t3 = out.filter(col("team") === "T3").select("sos_adj_war").as[Double].collect().head
    val t2 = out.filter(col("team") === "T2").select("sos_adj_war").as[Double].collect().head
    assert(t3 / 3.0 > t2 / 1.0) // relative boost for harder schedule
  }

  test("normalizeDivisionWar rescales to the standings-implied target") {
    val bat = Seq(("A", 3.0, 3.0), ("B", 1.0, 1.0)).toDF("p", "war", "sos_adj_war")
    val pitch = Seq(("C", 2.0, 2.0)).toDF("p", "war", "sos_adj_war")
    val standings = Seq(("d1", 2024, 300.0, 600.0), ("d1", 2023, 999.0, 999.0))
      .toDF("division", "year", "wins", "games")
    val (b2, p2) = WarPipeline.normalizeDivisionWar(bat, pitch, standings, "d1", 2024)
    val target = 300.0 - 0.294 * 600 // 123.6
    eps(b2.agg(sum("war")).as[Double].collect().head, target * 0.6)
    eps(p2.agg(sum("war")).as[Double].collect().head, target * 0.4)
  }

  test("battingWarCore end-to-end on a two-conference fixture") {
    val batting = Seq(
      // player, team, conf, ab, h, 2b, 3b, hr, bb, ibb, hbp, k, sf, sh, sb, cs, r, gp, pos
      ("P1", "T1", "T1N", "east", 100L, 30L, 5L, 1L, 4L, 10L, 0L, 2L, 20L, 1L, 0L, 5L, 1L, 20L, 25, "ss"),
      ("P2", "T2", "T2N", "west", 100L, 25L, 4L, 0L, 2L, 8L, 0L, 1L, 25L, 2L, 1L, 2L, 1L, 15L, 25, "1b"))
      .toDF("player_id", "team_id", "team_name", "conference", "ab", "h", "2b", "3b", "hr",
        "bb", "ibb", "hbp", "k", "sf", "sh", "sb", "cs", "r", "gp", "pos")
      .withColumn("baserunning", lit(0.5))
      .withColumn("wsb", lit(0.2))
      .withColumn("positional_adjustment", lit(1.0))
    val pf = Seq(("T1", 105.0), ("T2", 95.0)).toDF("team_id", "pf")

    val out = WarPipeline.battingWarCore(batting, pf, guts, "ncaa_1", 2024, totalGames = 25.0)
      .collect().map(r => r.getAs[String]("player_id") -> r).toMap

    // hand-compute P1: pa = 100+10+0+2+1 = 113; 1b = 30-4-1-5 = 20
    val woba1 = (0.7 * 10 + 0.73 * 2 + 0.9 * 20 + 1.25 * 5 + 1.6 * 1 + 2.0 * 4) /
      (100.0 + 10 - 0 + 1 + 2)
    val wraa1 = (woba1 - 0.35) / 1.2 * 113
    eps(out("P1").getAs[Double]("woba"), woba1)
    eps(out("P1").getAs[Double]("wraa"), wraa1)
    // conference rpa == player's own rpa (single-member conference)
    val lgRpa = 35.0 / (113 + 111)
    val confRpa1 = 20.0 / 113
    val batting1 = wraa1 + (lgRpa - 1.05 * lgRpa) * 113 + (lgRpa - confRpa1) * 113
    eps(out("P1").getAs[Double]("batting"), batting1)
    // league adjustment: single-member conference → -(batting+wsb+posadj)/pa*pa
    val lgAdj1 = -(batting1 + 0.2 + 1.0)
    eps(out("P1").getAs[Double]("league_adjustment"), lgAdj1)
    val war1 = (batting1 + out("P1").getAs[Double]("replacement_level_runs") + 0.5 + 1.0 + lgAdj1) / 10.0
    eps(out("P1").getAs[Double]("war"), war1)
  }

  test("pitchingWarCore applies the 57/43 rescale to the batting total") {
    val pitching = Seq(
      ("P1", "T1", "east", 10L, 3L, 50.0, 20L, 25L, Some(1.2)),
      ("P2", "T1", "east", 20L, 0L, 30.0, 18L, 20L, None))
      .toDF("player_id", "team_id", "conference", "app", "gs", "ip_float", "er", "r", "gmli")
    val pf = Seq(("T1", 100.0)).toDF("team_id", "pf")
    val out = WarPipeline.pitchingWarCore(pitching, pf, batWarTotal = 5.7, "ncaa_1", 2024)
    // total war must equal 5.7 * 0.43/0.57 = 4.3 after the rescale
    eps(out.agg(sum("war")).as[Double].collect().head, 4.3, 1e-6)
  }

  test("clutch stats: sums, sign flip and clutch formula") {
    val pbp = Seq(
      ("B1", 0.5, 0.1, 0.08, 1.0), ("B1", -0.2, -0.05, -0.04, 2.0), ("B2", 0.1, 0.02, 0.02, 0.0))
      .toDF("batter_id", "rea", "wpa", "wpa_li", "li")
    val c = ClutchStats.clutch(pbp, "batter_id")
      .collect().map(r => r.getString(0) -> r).toMap
    eps(c("B1").getAs[Double]("rea"), 0.3)
    eps(c("B1").getAs[Double]("clutch"), 0.05 / 1.5 - 0.04)
    assert(c("B2").isNullAt(c("B2").fieldIndex("clutch"))) // li mean 0
    val flipped = ClutchStats.clutch(pbp, "batter_id", flipSign = true)
      .filter(col("batter_id") === "B1").select("wpa").as[Double].collect().head
    eps(flipped, -0.05)
  }
}
