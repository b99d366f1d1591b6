package graft.leaderboards

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Publish-time hygiene (reference main.py:28-52,160-197):
  * drop_empty_rows floors, filter_by_team_history, publish-key dedup. */
class LeaderboardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dropEmptyRows: below-floor rows out; unknown tables pass through") {
    val df = Seq(("A", 0L), ("B", 1L), ("C", 3L)).toDF("player_id", "batted_balls")
    val out = Leaderboards.dropEmptyRows("batted_ball_batter", df)
    assert(out.select("player_id").as[String].collect().toSet === Set("B", "C"))
    // no floor configured for value tables → unchanged
    assert(Leaderboards.dropEmptyRows("value_batter", df).count() === 3)
    // floor configured but the column is absent → unchanged
    val noCol = Seq("A").toDF("player_id")
    assert(Leaderboards.dropEmptyRows("batted_ball_batter", noCol).count() === 1)
  }

  test("filterByTeamHistory: division-scoped inner filter with backoff guards") {
    val df = Seq(("T1", "x"), ("T2", "y"), ("T9", "z")).toDF("team_id", "v")
    val hist = Seq(("T1", "ncaa_1"), ("T2", "ncaa_2"), ("T5", "ncaa_1"))
      .toDF("team_id", "division")
    // T1 in-division kept; T2 wrong division dropped; T9 unknown dropped
    val out = Leaderboards.filterByTeamHistory(df, hist, "ncaa_1")
    assert(out.select("team_id").as[String].collect().toSeq === Seq("T1"))
    // disjoint id spaces → backoff, nothing filtered (main.py overlap guard)
    val foreign = Seq(("Z1", "a"), ("Z2", "b")).toDF("team_id", "v")
    assert(Leaderboards.filterByTeamHistory(foreign, hist, "ncaa_1").count() === 2)
    // no team_id column → untouched (rolling tables)
    val rolling = Seq(("P1", 0.4)).toDF("player_id", "woba")
    assert(Leaderboards.filterByTeamHistory(rolling, hist, "ncaa_1").count() === 1)
  }

  test("publish: filter runs BEFORE floors (reference order), enrichment after dedup") {
    // T1 is in history but below the floor; Z9 is above the floor but
    // not in history. Reference order (filter → floor) publishes
    // NOTHING: the filter drops Z9 while overlap holds, then the floor
    // drops T1. Floor-first would wrongly back off and publish Z9.
    val df = Seq(("T1", 0L), ("Z9", 5L)).toDF("team_id", "batted_balls")
    val hist = Seq(("T1", "ncaa_1", 2024, "Aardvarks", "North"))
      .toDF("team_id", "division", "year", "team_name", "conference")
    val out = Leaderboards.publish("batted_ball_batting_team", df, Some(hist), "ncaa_1", 2024)
    assert(out.count() === 0)

    // enrichment: canonical team_name replaces the aggregated one and
    // conference arrives from the history slice
    val df2 = Seq(("T1", "aardvarks-raw", 3L)).toDF("team_id", "team_name", "batted_balls")
    val out2 = Leaderboards.publish("batted_ball_batting_team", df2, Some(hist), "ncaa_1", 2024)
      .collect().head
    assert(out2.getAs[String]("team_name") === "Aardvarks")
    assert(out2.getAs[String]("conference") === "North")
    // wrong year slice → enrich joins nothing, name nulls out but row kept
    val out3 = Leaderboards.publish("batted_ball_batting_team", df2, Some(hist), "ncaa_1", 2023)
    assert(out3.count() === 1)
    assert(out3.collect().head.getAs[String]("conference") === null)
  }

  test("enrichFromTeamHistory: degrades to no-op without merge keys") {
    val df = Seq(("T1", "raw")).toDF("team_id", "team_name")
    // history without a year column → reference would crash; we skip
    val hist = Seq(("T1", "ncaa_1", "Aardvarks")).toDF("team_id", "division", "team_name")
    val out = Leaderboards.enrichFromTeamHistory(df, hist, "ncaa_1", 2024).collect().head
    assert(out.getAs[String]("team_name") === "raw")
  }

  test("dedupByPublishKeys: dedups on present key columns only") {
    val df = Seq(
      ("P1", "T1", 0.5), ("P1", "T1", 0.6), ("P1", "T2", 0.7))
      .toDF("player_id", "team_id", "woba")
    // keys are (player_id, player_name, team_id, team_name, year,
    // division); only player_id/team_id present → 2 distinct pairs
    val out = Leaderboards.dedupByPublishKeys("splits_batter", df)
    assert(out.count() === 2)
    // unknown table → untouched
    assert(Leaderboards.dedupByPublishKeys("not_a_table", df).count() === 3)
  }
}
