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

  test("multi-year cascade: direct > fuzzy (same year) > fuzzy_fallback (any year)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // team 1 roster across two seasons
    val stats = Seq(
      (1L, 2023, "jane smith", "p_js"),
      (1L, 2024, "jane smith", "p_js"),
      (1L, 2024, "bob jones", "p_bj"),
      (1L, 2023, "carl older", "p_co"),
      (2L, 2024, "jane smith", "p_other"))
      .toDF("team_id", "year", "name_norm", "player_id")
    val headshots = Seq(
      // exact (team 1, 2024)
      (1L, 2024, "jane smith", "js.png", "r/r", "Central HS"),
      // typo → fuzzy within 2024 (WRatio ≥ 90 vs "bob jones")
      (1L, 2024, "bob joness", "bj.png", "l/l", ""),
      // only exists in 2023 → fuzzy_fallback across years
      (1L, 2024, "carl older", "co.png", "", ""),
      // no candidate anywhere near → dropped
      (1L, 2024, "zzz qqq xx", "no.png", "", ""))
      .toDF("team_id", "year", "name_norm", "img_url", "b_t", "high_school")

    val m = Reconcile.matchHeadshotsMultiYear(spark, stats, headshots)
      .collect().map(r => r.getAs[String]("player_id") ->
        (r.getAs[String]("img_url"), r.getAs[String]("match_type"))).toMap
    assert(m("p_js") === (("js.png", "direct")))
    assert(m("p_bj") === (("bj.png", "fuzzy")))
    assert(m("p_co") === (("co.png", "fuzzy_fallback")))
    assert(!m.contains("p_other")) // team blocking holds
    assert(m.size === 3)
  }

  test("addMissingPlayers: stub rows for new ids, blank names filled, dedup") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cubeInfo = Seq(
      ("p1", "Jane Smith", "img1.png"),
      ("p2", "", "img2.png"))
      .toDF("player_id", "player_name", "img_url")
    val stats = Seq(
      ("p1", "Jane Smith"), ("p2", "Bob Brown"), ("p2", ""),
      ("p3", "Carl New"), ("p3", "Carl New"), ("p4", ""))
      .toDF("player_id", "player_name")
    val out = Reconcile.addMissingPlayers(cubeInfo, stats)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size === 4)
    assert(out("p2").getString(1) === "Bob Brown") // blank filled (non-empty wins)
    assert(out("p2").getString(2) === "img2.png") // other cols kept
    assert(out("p3").getString(1) === "Carl New") // stub added
    assert(out("p3").isNullAt(2)) // stub's other cols null
    assert(out("p4").getString(1) === "") // id-only stub
  }

  test("latest-year dedup and fill-only-blank cube_info update") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val matches = Seq(
      ("p1", "old.png", "r/r", "Old HS", 2022, "direct"),
      ("p1", "new.png", "l/l", "New HS", 2024, "direct"),
      ("p2", "p2.png", "s|l", "Previous School: X Somewhere HS", 2023, "fuzzy"))
      .toDF("player_id", "img_url", "b_t", "high_school", "year", "match_type")
    val cubeInfo = Seq(
      ("p1", "", "R", "", ""),
      ("p2", "keep.png", "", "", "Existing HS"),
      ("p3", "p3.png", "L", "L", "HS3"))
      .toDF("player_id", "img_url", "bats", "throws", "high_school")

    val out = Reconcile.updateCubeInfo(cubeInfo, matches)
      .collect().map(r => r.getString(0) -> r).toMap
    // p1: latest year wins; img overrides; bats kept (non-blank), throws filled
    assert(out("p1").getAs[String]("img_url") === "new.png")
    assert(out("p1").getAs[String]("bats") === "R")
    assert(out("p1").getAs[String]("throws") === "L")
    assert(out("p1").getAs[String]("high_school") === "New HS")
    // p2: img overrides existing; high_school kept (non-blank)
    assert(out("p2").getAs[String]("img_url") === "p2.png")
    assert(out("p2").getAs[String]("bats") === "S")
    assert(out("p2").getAs[String]("high_school") === "Existing HS")
    // p3: untouched
    assert(out("p3").getAs[String]("img_url") === "p3.png")
  }
}
