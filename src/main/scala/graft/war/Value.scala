package graft.war

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WPA value leaderboard tables (reference
 * `processors/leaderboards/value.py:13-243`): per-player and per-team
 * win-probability-added summaries with ± splits, REW (runs-to-wins),
 * pLI, and the clutch score; the pitching flavor sign-flips WPA/REA
 * (pitchers credit run prevention) and counts pitching changes.
 *
 * Every table is ONE hash aggregation over the enriched pbp scan —
 * the ± splits are conditional sums in the same agg, not the
 * reference's three separate groupbys.
 */
object Value {

  private def clutchCol: Column =
    when(col("pli") > 0, col("wpa") / col("pli") - col("wpa_li"))

  /** Batting value (value.py:13-103). `idCols` is
    * (batter_id→player_id joins) for the player table or just the team
    * key for the team table; name columns ride as deterministic
    * `min` representatives (functionally dependent on the key). */
  private def battingAgg(df: DataFrame, key: String, outKey: String,
      nameCols: Seq[(String, String)], runsPerWin: Double): DataFrame = {
    val batting = df.filter(col("batter_id").isNotNull)
    val aggs = nameCols.map { case (c, a) => min(col(c)).as(a) } ++ Seq(
      sum("wpa").as("wpa"),
      coalesce(sum(when(col("wpa") < 0, col("wpa"))), lit(0.0)).as("neg_wpa"),
      coalesce(sum(when(col("wpa") > 0, col("wpa"))), lit(0.0)).as("pos_wpa"),
      sum("rea").as("rea"),
      sum("wpa_li").as("wpa_li"),
      avg("li").as("pli"))
    batting.groupBy(col(key).as(outKey))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("rew", col("rea") / runsPerWin)
      .withColumn("clutch", clutchCol)
  }

  /** value_batter table (value.py:18-54). */
  def battingPlayer(df: DataFrame, runsPerWin: Double): DataFrame =
    battingAgg(df, "batter_id", "player_id", Seq(
      "batter_name" -> "player_name", "bat_team_name" -> "team_name",
      "bat_team_id" -> "team_id"), runsPerWin)
      .select("player_id", "player_name", "team_name", "team_id", "wpa",
        "neg_wpa", "pos_wpa", "rea", "rew", "pli", "wpa_li", "clutch")

  /** value_batting_team table (value.py:56-74). */
  def battingTeam(df: DataFrame, runsPerWin: Double): DataFrame =
    battingAgg(df, "bat_team_id", "team_id",
      Seq("bat_team_name" -> "team_name"), runsPerWin)
      .select("team_id", "team_name", "wpa", "neg_wpa", "pos_wpa", "rea",
        "rew", "pli", "wpa_li", "clutch")

  /** Pitching flavor (value.py:106-228): aggregate sums are negated
    * (−Σwpa, −Σrea, −Σwpa_li); the ± split runs over the per-row
    * NEGATED wpa (pwpa), so pos_wpa is the pitcher's good half. */
  private def pitchingAgg(df: DataFrame, key: String, outKey: String,
      nameCols: Seq[(String, String)], runsPerWin: Double): DataFrame = {
    val pitching = df.filter(col("pitcher_id").isNotNull)
    val pwpa = -col("wpa")
    val aggs = nameCols.map { case (c, a) => min(col(c)).as(a) } ++ Seq(
      (-sum("wpa")).as("wpa"),
      coalesce(sum(when(pwpa < 0, pwpa)), lit(0.0)).as("neg_wpa"),
      coalesce(sum(when(pwpa > 0, pwpa)), lit(0.0)).as("pos_wpa"),
      (-sum("rea")).as("rea"),
      (-sum("wpa_li")).as("wpa_li"),
      avg("li").as("pli"),
      count(when(col("sub_fl") === 1 && col("sub_pos") === "p", 1))
        .as("pitching_changes"))
    pitching.groupBy(col(key).as(outKey))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("rew", col("rea") / runsPerWin)
      .withColumn("clutch", clutchCol)
  }

  /** value_pitcher table (value.py:106-151). */
  def pitchingPlayer(df: DataFrame, runsPerWin: Double): DataFrame =
    pitchingAgg(df, "pitcher_id", "player_id", Seq(
      "pitcher_name" -> "player_name", "pitch_team_name" -> "team_name",
      "pitch_team_id" -> "team_id"), runsPerWin)
      .select("player_id", "player_name", "team_name", "team_id", "wpa",
        "neg_wpa", "pos_wpa", "rea", "rew", "pli", "wpa_li", "clutch")

  /** value_pitching_team table (value.py:153-228) — keeps
    * pitching_changes (sub_fl==1 & sub_pos=='p' count). */
  def pitchingTeam(df: DataFrame, runsPerWin: Double): DataFrame =
    pitchingAgg(df, "pitch_team_id", "team_id",
      Seq("pitch_team_name" -> "team_name"), runsPerWin)
      .select("team_id", "team_name", "wpa", "neg_wpa", "pos_wpa", "rea",
        "rew", "pli", "wpa_li", "clutch", "pitching_changes")

  /** The four-table fan-out (value.py:231-243). */
  def analyzeValue(df: DataFrame, runsPerWin: Double): Map[String, DataFrame] = Map(
    "value_batter" -> battingPlayer(df, runsPerWin),
    "value_batting_team" -> battingTeam(df, runsPerWin),
    "value_pitcher" -> pitchingPlayer(df, runsPerWin),
    "value_pitching_team" -> pitchingTeam(df, runsPerWin))
}
