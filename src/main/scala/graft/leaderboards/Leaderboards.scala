package graft.leaderboards

import graft.metrics.GutsConstants
import graft.operators.Rolling
import graft.pbp.{BattedBallType, EventType}
import graft.war.{Baserunning, Value}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The full leaderboard fan-out (reference
 * `processors/leaderboards/main.py:55-85` run_analysis): the ~20
 * tables — situational ×4, handedness splits ×4, batted-ball ×4,
 * rolling ×2, baserunning ×2, value ×4 — produced from ONE cached
 * enriched-pbp scan.
 *
 * The reference re-filters and re-groups the pandas frame once per
 * (table, situation); here each table is a single conditional
 * aggregation, and the whole fan-out shares the one cached scan —
 * at 100 TB that is ~20 shuffles over one read instead of ~60 reads.
 */
object Leaderboards {

  import Kernel.Weights

  private val batKeys = Seq("batter_id", "batter_name", "bat_team_name", "bat_team_id")
  private val pitKeys = Seq("pitcher_id", "pitcher_name", "pitch_team_name", "pitch_team_id")
  private val batRename = Map("batter_id" -> "player_id", "batter_name" -> "player_name",
    "bat_team_name" -> "team_name", "bat_team_id" -> "team_id")
  private val pitRename = Map("pitcher_id" -> "player_id", "pitcher_name" -> "player_name",
    "pitch_team_name" -> "team_name", "pitch_team_id" -> "team_id")
  private val batTeamRename = Map("bat_team_id" -> "team_id", "bat_team_name" -> "team_name")
  private val pitTeamRename = Map("pitch_team_id" -> "team_id", "pitch_team_name" -> "team_name")

  private def rename(df: DataFrame, m: Map[String, String]): DataFrame =
    m.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  // -------------------------------------------------------------------------
  // splits (reference splits.py:26-177)
  // -------------------------------------------------------------------------

  /** Batting sees pitcher handedness (splits.py:31-32). */
  def battingSplitConds: Seq[(String, Column)] = Seq(
    "vs_lhp" -> (col("pitcher_hand") === "L"),
    "vs_rhp" -> (col("pitcher_hand") === "R"),
    "overall" -> lit(true))

  /** Pitching sees batter handedness with the switch-hitter rule
    * (splits.py:66-79): a switch hitter bats opposite the pitcher. */
  def pitchingSplitConds: Seq[(String, Column)] = Seq(
    "vs_lhh" -> ((col("batter_hand") === "L") ||
      (col("pitcher_hand") === "R" && col("batter_hand").isin("S", "B"))),
    "vs_rhh" -> ((col("batter_hand") === "R") ||
      (col("pitcher_hand") === "L" && col("batter_hand").isin("S", "B"))),
    "overall" -> lit(true))

  // -------------------------------------------------------------------------
  // batted-ball profile (reference batted_ball.py:6-170)
  // -------------------------------------------------------------------------

  private val rightPat = "to right|to rf|right field|rf line|by rf|to 1b|to first|first base|1b line|by 1b|1b to|2b to|to 2b|to second|second base|by 2b"
  private val leftPat = "to left|to lf|left field|lf line|by lf|to 3b|to third|third base|3b line|by 3b|3b to|ss to|to ss|to short|shortstop|by ss"
  private val middlePat = "to center|to cf|center field|by cf|to left center|to right center|up the middle|to pitcher|to p|to c|by p|by c|to catcher"

  /** Spray/contact flags (batted_ball.py:18-75): pull/oppo resolved by
    * batter hand, switch hitters by pitcher hand. */
  def addBattedBallFlags(df: DataFrame): DataFrame = {
    val desc = lower(coalesce(col("play_description"), lit("")))
    val bh = coalesce(col("batter_hand"), lit(""))
    val ph = coalesce(col("pitcher_hand"), lit(""))
    val isLr = bh.isin("L", "R")
    val isSwitch = bh.isin("S", "B")
    val hasPitch = ph.isin("L", "R")
    val toRight = desc.rlike(rightPat)
    val toLeft = desc.rlike(leftPat)
    val toMiddle = desc.rlike(middlePat)
    val pullLr = (toRight && bh === "L") || (toLeft && bh === "R")
    val oppoLr = (toRight && bh === "R") || (toLeft && bh === "L")
    val pullSw = hasPitch && ((toRight && ph === "R") || (toLeft && ph === "L"))
    val oppoSw = hasPitch && ((toRight && ph === "L") || (toLeft && ph === "R"))
    df.filter(col("batter_id").isNotNull)
      .withColumn("is_pull", when((isLr && pullLr) || (isSwitch && pullSw), 1.0))
      .withColumn("is_oppo", when((isLr && oppoLr) || (isSwitch && oppoSw), 1.0))
      .withColumn("is_middle", when(toMiddle, 1.0))
      .withColumn("is_gb", col("batted_ball_type") === BattedBallType.GroundBall)
      .withColumn("is_fb", col("batted_ball_type") === BattedBallType.FlyBall)
      .withColumn("is_ld", col("batted_ball_type") === BattedBallType.LineDrive)
      .withColumn("is_pu", col("batted_ball_type") === BattedBallType.PopUp)
      .withColumn("is_hr", col("event_type") === EventType.HomeRun)
  }

  /** The batted-ball table for one grouping (batted_ball.py:77-170) —
    * one hash aggregation; pull_air/oppo_gb fold into the same agg
    * instead of the reference's two extra groupbys. Reference quirk
    * preserved: `batted_balls` counts EVERY plate appearance of the
    * batter (the reference's `play_description: "count"` over the
    * unfiltered frame), and spray regexes may fire on non-batted
    * descriptions — only the gb/fb/ld/pu shares are contact-only. */
  def battedBallStats(df: DataFrame, keys: Seq[String]): DataFrame = {
    def pct(n: Column, d: Column) = when(d > 0, n / d * 100)
    val flagged = addBattedBallFlags(df)
    val grouped = flagged.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("batted_balls"),
      coalesce(sum("is_pull"), lit(0.0)).as("is_pull"),
      coalesce(sum("is_oppo"), lit(0.0)).as("is_oppo"),
      coalesce(sum("is_middle"), lit(0.0)).as("is_middle"),
      count(when(col("is_gb"), 1)).as("is_gb"),
      count(when(col("is_fb"), 1)).as("is_fb"),
      count(when(col("is_ld"), 1)).as("is_ld"),
      count(when(col("is_pu"), 1)).as("is_pu"),
      count(when(col("is_hr"), 1)).as("is_hr"),
      count(when((col("is_fb") || col("is_ld")) && col("is_pull") === 1.0, 1)).as("__pull_air"),
      count(when(col("is_gb") && col("is_oppo") === 1.0, 1)).as("__oppo_gb"))
    val totalBb = col("is_gb") + col("is_fb") + col("is_ld") + col("is_pu")
    val totalDir = col("is_pull") + col("is_oppo") + col("is_middle")
    grouped
      .withColumn("pull_pct", pct(col("is_pull"), totalDir))
      .withColumn("oppo_pct", pct(col("is_oppo"), totalDir))
      .withColumn("middle_pct", pct(col("is_middle"), totalDir))
      .withColumn("gb_pct", pct(col("is_gb"), totalBb))
      .withColumn("fb_pct", pct(col("is_fb"), totalBb))
      .withColumn("ld_pct", pct(col("is_ld"), totalBb))
      .withColumn("pu_pct", pct(col("is_pu"), totalBb))
      .withColumn("fb_per_gb", when(col("is_gb") > 0, col("is_fb") / col("is_gb")))
      .withColumn("hr_per_fb", when(col("is_fb") > 0, col("is_hr") / col("is_fb")))
      .withColumn("pull_air_pct", pct(col("__pull_air"), totalDir))
      .withColumn("oppo_gb_pct", pct(col("__oppo_gb"), totalDir))
      .drop("__pull_air", "__oppo_gb")
  }

  // -------------------------------------------------------------------------
  // rolling wOBA (reference rolling.py:4-59)
  // -------------------------------------------------------------------------

  /** Per-player latest rolling-wOBA now/then/delta for each window,
    * merged wide — the W12 operator per window, one outer join chain
    * (the reference loops groups in Python per window). */
  def rollingWoba(pbp: DataFrame, idCol: String,
      windows: Seq[Int] = Seq(25, 50, 100)): DataFrame = {
    val base = pbp.filter(col(idCol).isNotNull)
    val frames = windows.map { w =>
      Rolling.meanNowVsThen(base, col(idCol),
          Seq(col("contest_id"), col("play_id")), col("woba"), w)
        .select(col(idCol).as("player_id"),
          col("roll_then").as(s"${w}_then"),
          col("roll_now").as(s"${w}_now"),
          col("delta").as(s"${w}_delta"))
    }
    frames.reduce((a, b) => a.join(b, Seq("player_id"), "outer"))
  }

  // -------------------------------------------------------------------------
  // the fan-out (reference main.py:55-85)
  // -------------------------------------------------------------------------

  /**
   * All ~20 leaderboard tables from one enriched pbp scan. The caller
   * caches `pbp`; every table here is lazily-planned so the driver can
   * write them in sequence against the cached scan.
   */
  def runAnalysis(pbp0: DataFrame, weights: Weights, guts: GutsConstants): Map[String, DataFrame] = {
    val sit = Kernel.situations
    // pandas groupby drops null group keys; Spark groupBy keeps them —
    // filter each table's primary key or unresolved ids publish a
    // junk null-keyed leaderboard row
    def keyed(key: String) = pbp0.filter(col(key).isNotNull)
    val pbp = pbp0
    val batPbp = keyed("batter_id")
    val pitPbp = keyed("pitcher_id")
    val batTeamPbp = keyed("bat_team_id")
    val pitTeamPbp = keyed("pitch_team_id")
    // WPA-dependent tables only plan when the enrichment ran (no wpa
    // column → the reference's skip-on-missing, main.py:224-227)
    val valueTables: Map[String, DataFrame] =
      if (!pbp.columns.contains("wpa")) Map.empty
      else Map(
        "value_batter" -> Value.battingPlayer(pbp, guts.runsWin),
        "value_batting_team" -> Value.battingTeam(pbp, guts.runsWin),
        "value_pitcher" -> Value.pitchingPlayer(pbp, guts.runsWin),
        "value_pitching_team" -> Value.pitchingTeam(pbp, guts.runsWin))
    valueTables ++ Map(
      "situational_batter" -> rename(Kernel.condSplits(batPbp, batKeys, sit, weights), batRename),
      "situational_pitcher" -> rename(Kernel.condSplits(pitPbp, pitKeys, sit, weights), pitRename),
      "situational_batting_team" ->
        rename(Kernel.condSplits(batTeamPbp, batTeamRename.keys.toSeq, sit, weights), batTeamRename),
      "situational_pitching_team" ->
        rename(Kernel.condSplits(pitTeamPbp, pitTeamRename.keys.toSeq, sit, weights), pitTeamRename),
      "splits_batter" ->
        rename(Kernel.condSplits(batPbp, batKeys, battingSplitConds, weights), batRename),
      "splits_pitcher" ->
        rename(Kernel.condSplits(pitPbp, pitKeys, pitchingSplitConds, weights), pitRename),
      "splits_batting_team" ->
        rename(Kernel.condSplits(batTeamPbp, batTeamRename.keys.toSeq, battingSplitConds, weights),
          batTeamRename),
      "splits_pitching_team" ->
        rename(Kernel.condSplits(pitTeamPbp, pitTeamRename.keys.toSeq, pitchingSplitConds, weights),
          pitTeamRename),
      "batted_ball_batter" -> rename(battedBallStats(batPbp, batKeys), batRename),
      "batted_ball_batting_team" ->
        rename(battedBallStats(batTeamPbp, batTeamRename.keys.toSeq), batTeamRename),
      "batted_ball_pitcher" ->
        rename(battedBallStats(pitPbp, pitKeys), pitRename),
      "batted_ball_pitching_team" ->
        rename(battedBallStats(pitTeamPbp, pitTeamRename.keys.toSeq), pitTeamRename),
      "rolling_batter" -> rollingWoba(pbp, "batter_id"),
      "rolling_pitcher" -> rollingWoba(pbp, "pitcher_id"),
      "baserunning" -> Baserunning.playerBaserunning(pbp, guts.runsSb, guts.runsCs, guts.runsOut),
      "baserunning_team" -> Baserunning.teamBaserunning(pbp, guts.runsSb, guts.runsCs, guts.runsOut))
  }

  // -------------------------------------------------------------------------
  // publish-time row hygiene (reference main.py:28-52,186-197)
  // -------------------------------------------------------------------------

  /** Per-table minimum-data thresholds (reference `MIN_DATA_COLUMNS`,
    * main.py:28-43): rows under the floor are dropped at publish. */
  val minDataColumns: Map[String, (String, Int)] = {
    val bb = Seq("batted_ball_batter", "batted_ball_batting_team",
      "batted_ball_pitcher", "batted_ball_pitching_team").map(_ -> ("batted_balls", 1))
    val pa = Seq("splits_batter", "splits_pitcher", "splits_batting_team",
      "splits_pitching_team", "situational_batter", "situational_pitcher",
      "situational_batting_team", "situational_pitching_team").map(_ -> ("pa_overall", 1))
    val g = Seq("baserunning", "baserunning_team").map(_ -> ("games", 1))
    (bb ++ pa ++ g).toMap
  }

  /** Per-table publish keys (reference `output_files`, main.py:104-154):
    * the columns the reference dedups the combined frame on. With
    * upsert-by-(year, division) the keys' year/division components are
    * batch constants, so per-batch dedup is equivalent. */
  val publishKeys: Map[String, Seq[String]] = {
    val player = Seq("player_id", "player_name", "team_id", "team_name", "year", "division")
    val team = Seq("team_id", "team_name", "year", "division")
    val rolling = Seq("player_id", "year", "division")
    Map(
      "situational_batter" -> player, "situational_pitcher" -> player,
      "situational_batting_team" -> team, "situational_pitching_team" -> team,
      "splits_batter" -> player, "splits_pitcher" -> player,
      "splits_batting_team" -> team, "splits_pitching_team" -> team,
      "batted_ball_batter" -> player, "batted_ball_batting_team" -> team,
      "batted_ball_pitcher" -> player, "batted_ball_pitching_team" -> team,
      "baserunning" -> player, "baserunning_team" -> team,
      "rolling_batter" -> rolling, "rolling_pitcher" -> rolling,
      "value_batter" -> player, "value_batting_team" -> team,
      "value_pitcher" -> player, "value_pitching_team" -> team)
  }

  /** `drop_empty_rows` (main.py:46-52): below-floor rows out; tables
    * without a configured floor (or missing the column) pass through. */
  def dropEmptyRows(name: String, df: DataFrame): DataFrame =
    minDataColumns.get(name) match {
      case Some((c, floor)) if df.columns.contains(c) =>
        df.filter(coalesce(col(c).cast("double"), lit(0.0)) >= floor)
      case _ => df
    }

  /** Does any table team appear in the history at all? The
    * reference's backoff guard for disjoint id spaces — probed once
    * per table and shared by the filter AND the name enrichment.
    * NOTE the probe scope deviates from the reference deliberately:
    * pandas probes the combined (all-history + batch) frame, which
    * here would mean reading every published table back per batch;
    * the per-slice probe is the scale-sane equivalent and only
    * diverges if the team-id space changes across slices. */
  private def historyOverlap(df: DataFrame, teamHistory: DataFrame): Boolean = {
    val hist = teamHistory.select(col("team_id").cast("string").as("__th_id")).distinct()
    df.join(broadcast(hist), df("team_id").cast("string") === col("__th_id"), "left_semi")
      .limit(1).count() > 0
  }

  private def historyInnerFilter(df: DataFrame, teamHistory: DataFrame,
      division: String): DataFrame = {
    val valid = teamHistory
      .filter(col("division").cast("string") === division)
      .select(col("team_id").cast("string").as("__vt"))
      .distinct()
    df.join(broadcast(valid), df("team_id").cast("string") === col("__vt"), "left_semi")
  }

  /** `filter_by_team_history` (common.py:filter_by_team_history): keep
    * rows whose team appears in the division's team history. Mirrors
    * the reference's guards — tables without a `team_id` pass through,
    * and if NO table team appears in the history at all (disjoint id
    * spaces, e.g. synthetic data) the filter backs off entirely. */
  def filterByTeamHistory(df: DataFrame, teamHistory: DataFrame, division: String): DataFrame = {
    if (!df.columns.contains("team_id")) return df
    if (!historyOverlap(df, teamHistory)) return df
    historyInnerFilter(df, teamHistory, division)
  }

  /** Post-dedup canonical-name enrichment (main.py:196-212): replace
    * `team_name` (and pull `conference`) from the team history on
    * (team_id, division, year). division/year are batch constants
    * under the (year, division) upsert, so the three-key merge
    * becomes a slice filter + broadcast join on team_id. Skipped when
    * the history lacks the merge keys or carries neither pull column
    * (the reference would crash its whole slice on a missing year
    * column; degrading to no-op is the deliberate deviation). */
  def enrichFromTeamHistory(df: DataFrame, teamHistory: DataFrame,
      division: String, year: Int): DataFrame = {
    if (!df.columns.contains("team_id")) return df
    val thCols = teamHistory.columns.toSet
    val pull = Seq("conference", "team_name").filter(thCols.contains)
    if (pull.isEmpty || !thCols.contains("division") || !thCols.contains("year")) return df
    val info = teamHistory
      .filter(col("division").cast("string") === division &&
        col("year").cast("int") === year)
      .select((col("team_id").cast("string").as("__ti")) +: pull.map(col): _*)
      .dropDuplicates("__ti")
    df.drop(pull: _*)
      .join(broadcast(info), df("team_id").cast("string") === col("__ti"), "left")
      .drop("__ti")
  }

  /**
   * The full publish pass for one table, in the reference's order
   * (main.py:160-212): team-history inner filter → minimum-data
   * floors → publish-key dedup → canonical team-name/conference
   * enrichment. One overlap probe gates both history steps (after the
   * inner filter every surviving team is in the history by
   * construction, so the reference's second probe is implied).
   */
  def publish(name: String, df0: DataFrame, teamHistory: Option[DataFrame],
      division: String, year: Int): DataFrame = {
    val applicable = teamHistory.filter(_ => df0.columns.contains("team_id"))
    val overlap = applicable.exists(th => historyOverlap(df0, th))
    val filtered = applicable match {
      case Some(th) if overlap => historyInnerFilter(df0, th, division)
      case _ => df0
    }
    val deduped = dedupByPublishKeys(name, dropEmptyRows(name, filtered))
    applicable match {
      case Some(th) if overlap => enrichFromTeamHistory(deduped, th, division, year)
      case _ => deduped
    }
  }

  /** Publish-key dedup (main.py:191-194): `drop_duplicates` on the
    * intersection of the table's keys with its actual columns. */
  def dedupByPublishKeys(name: String, df: DataFrame): DataFrame =
    publishKeys.get(name) match {
      case Some(keys) =>
        val present = keys.filter(df.columns.contains)
        if (present.isEmpty) df else df.dropDuplicates(present)
      case None => df
    }
}
