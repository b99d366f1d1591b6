package graft.war

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the GetWar orchestration pieces (reference
  * `get_war.py:81-93`, `sos_utils.py:13-109`); the full pipeline is
  * exercised end-to-end in RunAllSpec. */
class GetWarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parseRankings: W-L and W-L-T records") {
    val rk = Seq(("A", "12-8"), ("B", "7-6-2"))
      .toDF("massey_team", "record")
    val out = GetWar.parseRankings(rk, "ncaa_1", 2024)
      .collect().map(r => r.getAs[String]("massey_team") -> r).toMap
    assert(out("A").getAs[Int]("wins") === 12)
    assert(out("A").getAs[Int]("ties") === 0)
    assert(out("A").getAs[Int]("games") === 20)
    assert(out("B").getAs[Int]("ties") === 2)
    assert(out("B").getAs[Int]("games") === 15)
    assert(out("A").getAs[String]("division") === "ncaa_1")
  }

  test("teamToSos joins through the normalized massey mapping") {
    // note: norm_team folds case/&/dots/double-space ONLY — an
    // apostrophe mismatch would (faithfully) fail to join
    val rk = Seq(("St. Johns  Reds", 0.7), ("A&M", 0.5))
      .toDF("massey_team", "sos_val")
    val mp = Seq(
      ("ST JOHNS REDS", "st johns  reds"),
      ("A & M", "a&m"))
      .toDF("ncaa_team_name", "massey_team_name")
    val out = GetWar.teamToSos(rk, mp)
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("st johns reds") === Some(0.7))
    assert(out("a and m") === Some(0.5))
  }

  test("applySos: z-scored adjustment preserves each component's WAR total") {
    val bw = Seq(
      ("p1", "Alpha", 3.0), ("p2", "Beta", 1.0), ("p3", "Gamma", -0.5))
      .toDF("player_id", "team_name", "war")
    val pw = Seq(("q1", "Alpha", 2.0), ("q2", "Gamma", 0.5))
      .toDF("player_id", "team_name", "war")
    val rk = Seq(("Alpha", 0.9, "5-5"), ("Beta", 0.5, "5-5"), ("Gamma", 0.1, "5-5"))
      .toDF("massey_team", "sos_val", "record")
    val mp = Seq(("Alpha", "Alpha"), ("Beta", "Beta"), ("Gamma", "Gamma"))
      .toDF("ncaa_team_name", "massey_team_name")

    val (bwS, pwS) = GetWar.applySos(bw, pw, rk, mp, "ncaa_1", 2024)
    assert(bwS.columns.contains("sos_adj_war"))
    // the rescale invariant (sos_utils.py:92-101): per-component
    // adjusted total == raw total
    val bRaw = bwS.agg(sum("war")).first().getDouble(0)
    val bAdj = bwS.agg(sum("sos_adj_war")).first().getDouble(0)
    assert(math.abs(bRaw - bAdj) < 1e-9, s"$bRaw vs $bAdj")
    val pRaw = pwS.agg(sum("war")).first().getDouble(0)
    val pAdj = pwS.agg(sum("sos_adj_war")).first().getDouble(0)
    assert(math.abs(pRaw - pAdj) < 1e-9)
    // harder schedule (higher sos) rewards positive WAR: Alpha's
    // pre-rescale multiplier > Gamma's for war > 0
    val byId = bwS.collect().map(r => r.getAs[String]("player_id") ->
      r.getAs[Double]("sos_adj_war")).toMap
    assert(byId("p1") > 0)
  }
}
