package graft.pbp.names

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reconciliation fixtures (reference `reconcile_players.py:26-293`). */
class ReconcileSpec extends AnyFunSuite {
  import Reconcile._

  test("cleanName strips jersey prefixes and titlecases") {
    // reference quirk preserved: its prefix pattern covers "No."/
    // "number" but NOT "#" (reconcile_players.py:28), so a hash
    // prefix survives (PlayerMap's jersey parser handles those)
    assert(cleanName("# 12 - jane smith") === "# 12 - Jane Smith")
    assert(cleanName("No. 7: alex lee") === "Alex Lee")
    assert(cleanName("12 sam jones") === "Sam Jones")
    assert(cleanName("7dave o'neil") === "Dave O'Neil") // digit glued to letter
    assert(cleanName("  MARIA   GARCIA ") === "Maria Garcia")
  }

  test("cleanHighSchool cuts previous-school clauses") {
    assert(cleanHighSchool("Central High Previous School: West") === "Central High")
    assert(cleanHighSchool("North HS prev sch: Other") === "North HS")
    assert(cleanHighSchool("Plain High ") === "Plain High")
    assert(cleanHighSchool("") === "")
  }

  test("normalizeRosterName strips leading digits and punctuation") {
    assert(normalizeRosterName("12 Jane-Smith Jr.") === "janesmith jr")
    assert(normalizeRosterName("O'Brien, Pat") === "obrien pat")
  }

  test("matchTeam cascade: exact, number disambiguation, WRatio fallback, keep-first") {
    val roster = Seq(
      RosterRow("p1", "jane smith", "12"),
      RosterRow("p2", "jane smith", "7"), // name collision, number differs
      RosterRow("p3", "maria garcia", ""))
    val shots = Seq(
      HeadshotRow("jane smith", "7", "url-a"), // exact + number disambiguation → p2
      HeadshotRow("maria garcya", "", "url-b"), // typo → WRatio fallback → p3
      HeadshotRow("maria garcia", "", "url-c"), // p3 already matched → skipped
      HeadshotRow("zzz qqq", "", "url-d")) // below 90 → no match
    val out = matchTeam(roster, shots)
    assert(out === Seq(Matched("p2", "url-a"), Matched("p3", "url-b")))
  }

  test("Spark wrapper blocks by team and enrichment fills only blanks") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rosters = Seq(
      ("TeamA", "p1", "jane smith", "12"), ("TeamB", "p9", "jane smith", "3"))
      .toDF("team", "player_id", "player_name_norm", "number")
    val shots = Seq(
      ("TeamA", "jane smith", "", "a.png"), ("TeamB", "jane smith", "", "b.png"))
      .toDF("team", "tr_name_norm", "number", "img_url")
    val matches = Reconcile.buildHeadshotMatches(spark, rosters, shots)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(matches === Map("p1" -> "a.png", "p9" -> "b.png"))

    val ros2 = Seq(("p1", "", "r/r", "ss"), ("p9", "keep.png", "", ""))
      .toDF("player_id", "img_url", "b_t", "pos")
    val hs = Seq(("p1", "a.png", "L", "catcher"), ("p9", "b.png", "S/L", "rhp"))
      .toDF("player_id", "img_url", "b_t", "pos")
    val enriched = Reconcile.enrichWithHeadshots(ros2, hs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(enriched("p1").getAs[String]("img_url") === "a.png") // blank filled
    assert(enriched("p9").getAs[String]("img_url") === "keep.png") // existing kept
    assert(enriched("p1").getAs[String]("b_t") === "R/R") // normalized
    assert(enriched("p9").getAs[String]("b_t") === "S/L") // filled then normalized
    assert(enriched("p1").getAs[String]("pos") === "SS")
    assert(enriched("p9").getAs[String]("pos") === "P") // rhp → P
  }
}
