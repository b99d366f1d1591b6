package graft.war

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for the WPA value tables (reference
  * `leaderboards/value.py:13-243`) — expectations hand-computed. */
class ValueSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eps(a: Double, b: Double, e: Double = 1e-9) = assert(math.abs(a - b) < e, s"$a vs $b")

  // (batter, batterName, batTeam, batTeamName, pitcher, pitcherName,
  //  pitchTeam, pitchTeamName, wpa, rea, wpa_li, li, sub_fl, sub_pos)
  private lazy val pbp = Seq(
    ("b1", "Bat One", "T1", "Tigers", "p1", "Pit One", "U1", "Crew1", 0.10, 0.5, 0.05, 1.0, 0, "x"),
    ("b1", "Bat One", "T1", "Tigers", "p1", "Pit One", "U1", "Crew1", -0.30, -1.0, -0.20, 3.0, 0, "x"),
    ("b2", "Bat Two", "T1", "Tigers", "p2", "Pit Two", "U1", "Crew1", 0.40, 2.0, 0.30, 2.0, 1, "p"),
    ("b3", "Bat Three", "T2", "Bears", "p1", "Pit One", "U1", "Crew1", -0.10, -0.5, -0.10, 0.0, 1, "x"),
    (null, null, "T2", "Bears", "p2", "Pit Two", "U1", "Crew1", 9.9, 9.9, 9.9, 9.9, 1, "p"),
    ("b4", "Bat Four", "T2", "Bears", null, null, "U2", "Crew2", 0.20, 1.0, 0.10, 2.0, 0, "x"))
    .toDF("batter_id", "batter_name", "bat_team_id", "bat_team_name",
      "pitcher_id", "pitcher_name", "pitch_team_id", "pitch_team_name",
      "wpa", "rea", "wpa_li", "li", "sub_fl", "sub_pos")

  private def byId(df: org.apache.spark.sql.DataFrame, keyCol: String) =
    df.collect().map(r => r.getString(r.fieldIndex(keyCol)) -> r).toMap

  test("battingPlayer: sums, ± splits, rew, pli, clutch; null batters dropped") {
    val m = byId(Value.battingPlayer(pbp, runsPerWin = 10.0), "player_id")
    assert(m.keySet === Set("b1", "b2", "b3", "b4"))
    val b1 = m("b1")
    eps(b1.getDouble(b1.fieldIndex("wpa")), -0.2)
    eps(b1.getDouble(b1.fieldIndex("pos_wpa")), 0.10)
    eps(b1.getDouble(b1.fieldIndex("neg_wpa")), -0.30)
    eps(b1.getDouble(b1.fieldIndex("rea")), -0.5)
    eps(b1.getDouble(b1.fieldIndex("rew")), -0.05)
    eps(b1.getDouble(b1.fieldIndex("pli")), 2.0)
    // clutch = wpa/pli - wpa_li = -0.2/2 - (-0.15) = 0.05
    eps(b1.getDouble(b1.fieldIndex("clutch")), 0.05)
    assert(b1.getString(b1.fieldIndex("player_name")) === "Bat One")
    // b3: li mean 0 → clutch null
    assert(m("b3").isNullAt(m("b3").fieldIndex("clutch")))
    // b4 (no pitcher on the play) still counts for batting
    eps(m("b4").getDouble(m("b4").fieldIndex("wpa")), 0.2)
  }

  test("battingTeam groups by bat_team_id") {
    val m = byId(Value.battingTeam(pbp, runsPerWin = 10.0), "team_id")
    assert(m.keySet === Set("T1", "T2"))
    val t1 = m("T1")
    eps(t1.getDouble(t1.fieldIndex("wpa")), 0.10 - 0.30 + 0.40)
    eps(t1.getDouble(t1.fieldIndex("pos_wpa")), 0.50)
    eps(t1.getDouble(t1.fieldIndex("neg_wpa")), -0.30)
  }

  test("pitchingPlayer: sign-flipped sums; ± split over per-row negated wpa") {
    val m = byId(Value.pitchingPlayer(pbp, runsPerWin = 10.0), "player_id")
    assert(m.keySet === Set("p1", "p2")) // null pitcher row dropped
    val p1 = m("p1")
    // rows: wpa 0.10, -0.30, -0.10 → flipped sum = 0.30
    eps(p1.getDouble(p1.fieldIndex("wpa")), 0.30)
    // pwpa rows: -0.10, 0.30, 0.10 → pos 0.40, neg -0.10
    eps(p1.getDouble(p1.fieldIndex("pos_wpa")), 0.40)
    eps(p1.getDouble(p1.fieldIndex("neg_wpa")), -0.10)
    eps(p1.getDouble(p1.fieldIndex("rea")), 1.0)
    eps(p1.getDouble(p1.fieldIndex("rew")), 0.1)
    eps(p1.getDouble(p1.fieldIndex("wpa_li")), 0.25)
    // pli = mean(1, 3, 0) = 4/3; clutch = 0.3/(4/3) - 0.25
    eps(p1.getDouble(p1.fieldIndex("pli")), 4.0 / 3)
    eps(p1.getDouble(p1.fieldIndex("clutch")), 0.3 / (4.0 / 3) - 0.25)
  }

  test("pitchingTeam counts pitching changes (sub_fl=1 & sub_pos='p')") {
    val m = byId(Value.pitchingTeam(pbp, runsPerWin = 10.0), "team_id")
    assert(m.keySet === Set("U1")) // U2's only row has null pitcher
    val u1 = m("U1")
    assert(u1.getLong(u1.fieldIndex("pitching_changes")) === 2)
    eps(u1.getDouble(u1.fieldIndex("wpa")), -(0.10 - 0.30 + 0.40 - 0.10 + 9.9))
  }
}
