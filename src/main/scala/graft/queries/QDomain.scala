package graft.queries

import graft.sources.Tables
import graft.war.{Baserunning, Value}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Domain-form oracle queries for the baserunning value family and the
 * WPA value tables (VERDICT r2 gaps #1/#3): the REAL kernels from
 * [[graft.war.Baserunning]] / [[graft.war.Value]] run over a
 * deterministic pbp-shaped projection of the harness `events` table,
 * and the DuckDB oracle replicates the FULL algorithm (runner-dest
 * lead windows, scenario masks, league-rate broadcasts, sign flips) —
 * not just row counts.
 *
 * The projection is pure integer/CASE arithmetic so Spark and DuckDB
 * derive bit-identical inputs.
 */
object QDomain {

  /** events → pbp-shaped frame (baserunning flavor). */
  def pbpFromEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def tag(prefix: String, n: Column) = concat(lit(prefix), n.cast("string"))
    val r1n = (col("user_id") + col("event_id")) % 40
    val r2n = (col("user_id") + lit(2) * col("event_id") + 7) % 40
    val r3n = (col("user_id") + lit(3) * col("event_id") + 13) % 40
    ev.select(
      (col("user_id") % 200).as("contest_id"),
      col("event_id").as("play_id"),
      tag("b", col("user_id") % 60).as("batter_id"),
      tag("t", col("user_id") % 25).as("bat_team_id"),
      tag("team ", col("user_id") % 25).as("bat_team_name"),
      when(col("event_id") % 3 === 0, tag("p", r1n)).as("r1_id"),
      when(col("event_id") % 3 === 0, tag("P ", r1n)).as("r1_name"),
      when(col("event_id") % 5 === 0, tag("p", r2n)).as("r2_id"),
      when(col("event_id") % 5 === 0, tag("P ", r2n)).as("r2_name"),
      when(col("event_id") % 7 === 0, tag("p", r3n)).as("r3_id"),
      when(col("event_type") === "click", "1B")
        .when(col("event_type") === "purchase", "2B")
        .when(col("event_type") === "signup", "SB")
        .when(col("event_type") === "error", "CS")
        .otherwise("OUT").as("event_type"),
      when(col("value") > 15, "runner scored on the play")
        .when(col("value") > 10, "runner out at third")
        .when(col("value") > 5, "grounded into double play")
        .otherwise("routine play").as("play_description"),
      (col("event_id") % 3).cast("int").as("outs_before"))
  }

  /** The same projection as DuckDB SQL (oracle side). */
  private val pbpCte =
    """pbp AS (
      |  SELECT user_id % 200 AS contest_id,
      |    event_id AS play_id,
      |    'b' || CAST(user_id % 60 AS VARCHAR) AS batter_id,
      |    't' || CAST(user_id % 25 AS VARCHAR) AS bat_team_id,
      |    'team ' || CAST(user_id % 25 AS VARCHAR) AS bat_team_name,
      |    CASE WHEN event_id % 3 = 0 THEN 'p' || CAST((user_id + event_id) % 40 AS VARCHAR) END AS r1_id,
      |    CASE WHEN event_id % 3 = 0 THEN 'P ' || CAST((user_id + event_id) % 40 AS VARCHAR) END AS r1_name,
      |    CASE WHEN event_id % 5 = 0 THEN 'p' || CAST((user_id + 2*event_id + 7) % 40 AS VARCHAR) END AS r2_id,
      |    CASE WHEN event_id % 5 = 0 THEN 'P ' || CAST((user_id + 2*event_id + 7) % 40 AS VARCHAR) END AS r2_name,
      |    CASE WHEN event_id % 7 = 0 THEN 'p' || CAST((user_id + 3*event_id + 13) % 40 AS VARCHAR) END AS r3_id,
      |    CASE WHEN event_type='click' THEN '1B' WHEN event_type='purchase' THEN '2B'
      |         WHEN event_type='signup' THEN 'SB' WHEN event_type='error' THEN 'CS'
      |         ELSE 'OUT' END AS event_type,
      |    CASE WHEN value > 15 THEN 'runner scored on the play'
      |         WHEN value > 10 THEN 'runner out at third'
      |         WHEN value > 5 THEN 'grounded into double play'
      |         ELSE 'routine play' END AS play_description,
      |    CAST(event_id % 3 AS INT) AS outs_before
      |  FROM events)""".stripMargin

  /** Steal union + per-player aggregation, shared by bsr01/bsr03. */
  private val stealCtes =
    """su AS (
      |  SELECT r1_id AS player_id, contest_id,
      |    CASE WHEN event_type IN ('SB','CS') THEN 0 ELSE 1 END AS opp_2b,
      |    CASE WHEN event_type IN ('SB','CS') THEN 1 ELSE 0 END AS att_2b,
      |    CASE WHEN event_type='SB' THEN 1 ELSE 0 END AS sb_2b,
      |    CASE WHEN event_type='CS' THEN 1 ELSE 0 END AS cs_2b,
      |    0 AS opp_3b, 0 AS att_3b, 0 AS sb_3b, 0 AS cs_3b
      |  FROM pbp WHERE r1_id IS NOT NULL
      |  UNION ALL
      |  SELECT r2_id, contest_id, 0, 0, 0, 0,
      |    CASE WHEN event_type IN ('SB','CS') THEN 0 ELSE 1 END,
      |    CASE WHEN event_type IN ('SB','CS') THEN 1 ELSE 0 END,
      |    CASE WHEN event_type='SB' THEN 1 ELSE 0 END,
      |    CASE WHEN event_type='CS' THEN 1 ELSE 0 END
      |  FROM pbp WHERE r2_id IS NOT NULL),
      |steal AS (
      |  SELECT player_id, count(DISTINCT contest_id) AS games,
      |    CAST(SUM(opp_2b) AS BIGINT) AS opp_2b, CAST(SUM(opp_3b) AS BIGINT) AS opp_3b,
      |    CAST(SUM(att_2b) AS BIGINT) AS att_2b, CAST(SUM(att_3b) AS BIGINT) AS att_3b,
      |    CAST(SUM(sb_2b) AS BIGINT) AS sb_2b, CAST(SUM(sb_3b) AS BIGINT) AS sb_3b,
      |    CAST(SUM(cs_2b) AS BIGINT) AS cs_2b, CAST(SUM(cs_3b) AS BIGINT) AS cs_3b
      |  FROM su GROUP BY player_id),
      |rates AS (
      |  SELECT *, sb_2b + sb_3b AS sb, cs_2b + cs_3b AS cs, att_2b + att_3b AS sb_att
      |  FROM steal)""".stripMargin

  /** Runner-dest + scenario-mask + packed union, shared by bsr02/bsr03
    * — replicates Baserunning.webt (leaderboard flavor, runs_out 0.2). */
  private val webtCtes =
    """dests AS (
      |  SELECT *,
      |    lead(r1_id) OVER w AS r1n, lead(r2_id) OVER w AS r2n, lead(r3_id) OVER w AS r3n,
      |    CASE WHEN play_description LIKE '%scored%' THEN 1 ELSE 0 END AS scored_n,
      |    (play_description LIKE '%out at%' OR play_description LIKE '%thrown out%') AS out_at
      |  FROM pbp WINDOW w AS (PARTITION BY contest_id ORDER BY play_id)),
      |dd AS (
      |  SELECT *,
      |    CASE WHEN r1_id IS NULL THEN NULL WHEN r1_id = r1n THEN 1
      |         WHEN r1_id = r2n THEN 2 WHEN r1_id = r3n THEN 3 ELSE 0 END AS r1_dest,
      |    (r1_id IS NOT NULL AND event_type='1B') AS c13,
      |    (r2_id IS NOT NULL AND event_type='1B') AS c2h,
      |    (r1_id IS NOT NULL AND event_type='2B') AS c1h,
      |    (r1_id IS NOT NULL AND scored_n > 0) AS r1_scored,
      |    (r1_id IS NULL AND r2_id IS NOT NULL AND scored_n > 0) AS r2_scored,
      |    (r1_id IS NOT NULL AND out_at) AS r1_out,
      |    (r1_id IS NULL AND r2_id IS NOT NULL AND out_at) AS r2_out
      |  FROM dests),
      |packed AS (
      |  SELECT r1_id AS player_id,
      |    CAST(c13 AS BIGINT) AS opp_13,
      |    CAST(c13 AND r1_dest = 3 AS BIGINT) AS taken_13,
      |    CAST(c13 AND r1_out AS BIGINT) AS out_13,
      |    CAST(c13 AND NOT (c13 AND r1_dest = 3) AND NOT (c13 AND r1_out) AS BIGINT) AS hold_13,
      |    0 AS opp_2h, 0 AS taken_2h, 0 AS out_2h, 0 AS hold_2h,
      |    CAST(c1h AS BIGINT) AS opp_1h,
      |    CAST(c1h AND r1_scored AS BIGINT) AS taken_1h,
      |    CAST(c1h AND r1_out AS BIGINT) AS out_1h,
      |    CAST(c1h AND NOT (c1h AND r1_scored) AND NOT (c1h AND r1_out) AS BIGINT) AS hold_1h
      |  FROM dd WHERE c13 OR c1h
      |  UNION ALL
      |  SELECT r2_id, 0, 0, 0, 0,
      |    CAST(c2h AS BIGINT),
      |    CAST(c2h AND r2_scored AS BIGINT),
      |    CAST(c2h AND r2_out AS BIGINT),
      |    CAST(c2h AND NOT (c2h AND r2_scored) AND NOT (c2h AND r2_out) AS BIGINT),
      |    0, 0, 0, 0
      |  FROM dd WHERE c2h),
      |webt_per AS (
      |  SELECT player_id,
      |    CAST(SUM(opp_13) AS BIGINT) AS opp_13, CAST(SUM(taken_13) AS BIGINT) AS taken_13,
      |    CAST(SUM(out_13) AS BIGINT) AS out_13, CAST(SUM(hold_13) AS BIGINT) AS hold_13,
      |    CAST(SUM(opp_2h) AS BIGINT) AS opp_2h, CAST(SUM(taken_2h) AS BIGINT) AS taken_2h,
      |    CAST(SUM(out_2h) AS BIGINT) AS out_2h, CAST(SUM(hold_2h) AS BIGINT) AS hold_2h,
      |    CAST(SUM(opp_1h) AS BIGINT) AS opp_1h, CAST(SUM(taken_1h) AS BIGINT) AS taken_1h,
      |    CAST(SUM(out_1h) AS BIGINT) AS out_1h, CAST(SUM(hold_1h) AS BIGINT) AS hold_1h
      |  FROM packed GROUP BY player_id),
      |webt_lg AS (
      |  SELECT SUM(opp_13) AS lgopp_13, SUM(taken_13) AS lgtaken_13, SUM(out_13) AS lgout_13,
      |    SUM(opp_2h) AS lgopp_2h, SUM(taken_2h) AS lgtaken_2h, SUM(out_2h) AS lgout_2h,
      |    SUM(opp_1h) AS lgopp_1h, SUM(taken_1h) AS lgtaken_1h, SUM(out_1h) AS lgout_1h
      |  FROM webt_per),
      |webt AS (
      |  SELECT p.*,
      |    ((p.taken_13 - CASE WHEN l.lgopp_13 > 0 THEN CAST(l.lgtaken_13 AS DOUBLE) / l.lgopp_13 ELSE 0.0 END * p.opp_13)
      |      + (p.out_13 - CASE WHEN l.lgopp_13 > 0 THEN CAST(l.lgout_13 AS DOUBLE) / l.lgopp_13 ELSE 0.0 END * p.opp_13) * (-0.2))
      |    + ((p.taken_2h - CASE WHEN l.lgopp_2h > 0 THEN CAST(l.lgtaken_2h AS DOUBLE) / l.lgopp_2h ELSE 0.0 END * p.opp_2h)
      |      + (p.out_2h - CASE WHEN l.lgopp_2h > 0 THEN CAST(l.lgout_2h AS DOUBLE) / l.lgopp_2h ELSE 0.0 END * p.opp_2h) * (-0.2))
      |    + ((p.taken_1h - CASE WHEN l.lgopp_1h > 0 THEN CAST(l.lgtaken_1h AS DOUBLE) / l.lgopp_1h ELSE 0.0 END * p.opp_1h)
      |      + (p.out_1h - CASE WHEN l.lgopp_1h > 0 THEN CAST(l.lgout_1h AS DOUBLE) / l.lgopp_1h ELSE 0.0 END * p.opp_1h) * (-0.2)) AS webt,
      |    p.opp_13 + p.opp_2h + p.opp_1h AS ebt_opps,
      |    p.taken_13 + p.taken_2h + p.taken_1h AS ebt_taken,
      |    p.out_13 + p.out_2h + p.out_1h AS ebt_out,
      |    p.hold_13 + p.hold_2h + p.hold_1h AS ebt_hold
      |  FROM webt_per p CROSS JOIN webt_lg l)""".stripMargin

  private val wgdpCtes =
    """gdp_per AS (
      |  SELECT batter_id AS player_id, count(*) AS gdp_opps,
      |    count(CASE WHEN lower(play_description) LIKE '%double play%' THEN 1 END) AS gdp
      |  FROM pbp
      |  WHERE r1_id IS NOT NULL AND outs_before < 2 AND batter_id IS NOT NULL
      |  GROUP BY batter_id),
      |gdp_lg AS (
      |  SELECT CASE WHEN SUM(gdp_opps) > 0 THEN CAST(SUM(gdp) AS DOUBLE) / SUM(gdp_opps)
      |              ELSE 0.0 END AS r FROM gdp_per),
      |wgdp AS (
      |  SELECT player_id, gdp_opps, gdp,
      |    (gdp_opps * (SELECT r FROM gdp_lg) - gdp) * 0.5 AS wgdp
      |  FROM gdp_per)""".stripMargin

  private val nameMapCte =
    """nm AS (
      |  SELECT player_id, player_name, team_id, team_name FROM (
      |    SELECT r1_id AS player_id, r1_name AS player_name,
      |      bat_team_id AS team_id, bat_team_name AS team_name,
      |      0 AS src, contest_id, play_id
      |    FROM pbp WHERE r1_id IS NOT NULL
      |    UNION ALL
      |    SELECT r2_id, r2_name, bat_team_id, bat_team_name, 1, contest_id, play_id
      |    FROM pbp WHERE r2_id IS NOT NULL)
      |  QUALIFY row_number() OVER (PARTITION BY player_id ORDER BY contest_id, play_id, src) = 1)""".stripMargin

  /**
   * events → WPA-enriched pbp shape (value flavor). The metric columns
   * are dyadic rationals (integer-valued round() divided by powers of
   * two), so group sums are EXACT in both engines — no float-order
   * sensitivity in the oracle compare.
   */
  def pbpValueFromEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def tag(prefix: String, n: Column) = concat(lit(prefix), n.cast("string"))
    ev.select(
      when(col("event_id") % 13 =!= 0, tag("b", col("user_id") % 60)).as("batter_id"),
      when(col("event_id") % 13 =!= 0, tag("B ", col("user_id") % 60)).as("batter_name"),
      tag("t", col("user_id") % 25).as("bat_team_id"),
      tag("team ", col("user_id") % 25).as("bat_team_name"),
      when(col("event_id") % 17 =!= 0, tag("q", (col("user_id") + 3) % 50)).as("pitcher_id"),
      when(col("event_id") % 17 =!= 0, tag("Q ", (col("user_id") + 3) % 50)).as("pitcher_name"),
      tag("u", (col("user_id") + 3) % 20).as("pitch_team_id"),
      tag("crew ", (col("user_id") + 3) % 20).as("pitch_team_name"),
      (round(col("value") * 100) / 128).as("wpa"),
      (round(col("value") * 50) / 64).as("rea"),
      (round(col("value") * 25) / 256).as("wpa_li"),
      (abs(round(col("value") * 100)) / 512 + 0.25).as("li"),
      when(col("event_id") % 11 === 0, 1).otherwise(0).as("sub_fl"),
      when(col("event_id") % 22 === 0, "p").otherwise("x").as("sub_pos"))
  }

  private val pbpValueCte =
    """pbp AS (
      |  SELECT
      |    CASE WHEN event_id % 13 <> 0 THEN 'b' || CAST(user_id % 60 AS VARCHAR) END AS batter_id,
      |    CASE WHEN event_id % 13 <> 0 THEN 'B ' || CAST(user_id % 60 AS VARCHAR) END AS batter_name,
      |    't' || CAST(user_id % 25 AS VARCHAR) AS bat_team_id,
      |    'team ' || CAST(user_id % 25 AS VARCHAR) AS bat_team_name,
      |    CASE WHEN event_id % 17 <> 0 THEN 'q' || CAST((user_id + 3) % 50 AS VARCHAR) END AS pitcher_id,
      |    CASE WHEN event_id % 17 <> 0 THEN 'Q ' || CAST((user_id + 3) % 50 AS VARCHAR) END AS pitcher_name,
      |    'u' || CAST((user_id + 3) % 20 AS VARCHAR) AS pitch_team_id,
      |    'crew ' || CAST((user_id + 3) % 20 AS VARCHAR) AS pitch_team_name,
      |    round(value * 100) / 128 AS wpa,
      |    round(value * 50) / 64 AS rea,
      |    round(value * 25) / 256 AS wpa_li,
      |    abs(round(value * 100)) / 512 + 0.25 AS li,
      |    CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS sub_fl,
      |    CASE WHEN event_id % 22 = 0 THEN 'p' ELSE 'x' END AS sub_pos
      |  FROM events)""".stripMargin

  // ---------------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // BSR1 (A8 domain form): per-runner steal opportunities/attempts/
    // rates — reference leaderboards/baserunning.py:57-134,179-192.
    QueryDef.of("bsr01_steal_stats",
      s"""WITH $pbpCte,
        |$stealCtes
        |SELECT player_id, games, opp_2b, att_2b, sb_2b, cs_2b, opp_3b, att_3b,
        |  sb_3b, cs_3b, sb, cs, sb_att,
        |  round(CASE WHEN sb_att > 0 THEN CAST(sb AS DOUBLE) / sb_att ELSE 0.0 END, 6) AS sb_pct,
        |  round(CASE WHEN att_2b > 0 THEN CAST(sb_2b AS DOUBLE) / att_2b ELSE 0.0 END, 6) AS sb_2b_pct,
        |  round(CASE WHEN games > 0 THEN CAST(sb_att AS DOUBLE) / games ELSE 0.0 END, 6) AS sb_att_per_game
        |FROM rates ORDER BY player_id""".stripMargin) { (s, dir) =>
      Baserunning.playerStealStats(pbpFromEvents(s, dir))
        .select(col("player_id"), col("games"), col("opp_2b"), col("att_2b"),
          col("sb_2b"), col("cs_2b"), col("opp_3b"), col("att_3b"),
          col("sb_3b"), col("cs_3b"), col("sb"), col("cs"), col("sb_att"),
          round(col("sb_pct"), 6).as("sb_pct"),
          round(col("sb_2b_pct"), 6).as("sb_2b_pct"),
          round(col("sb_att_per_game"), 6).as("sb_att_per_game"))
        .orderBy("player_id")
    },

    // BSR2 (A10 domain form): wEBT extra-bases-taken — scenario masks,
    // runner destinations via lead(), league-rate valuation
    // (reference leaderboards/baserunning.py:221-352).
    QueryDef.of("bsr02_webt",
      s"""WITH $pbpCte,
        |$webtCtes
        |SELECT player_id, opp_13, taken_13, out_13, hold_13, opp_2h, taken_2h,
        |  out_2h, hold_2h, opp_1h, taken_1h, out_1h, hold_1h,
        |  ebt_opps, ebt_taken, ebt_out, ebt_hold, round(webt, 6) AS webt
        |FROM webt ORDER BY player_id""".stripMargin) { (s, dir) =>
      Baserunning.webt(pbpFromEvents(s, dir), runsOut = 0.2)
        .select(col("player_id"), col("opp_13"), col("taken_13"), col("out_13"),
          col("hold_13"), col("opp_2h"), col("taken_2h"), col("out_2h"),
          col("hold_2h"), col("opp_1h"), col("taken_1h"), col("out_1h"),
          col("hold_1h"), col("ebt_opps"), col("ebt_taken"), col("ebt_out"),
          col("ebt_hold"), round(col("webt"), 6).as("webt"))
        .orderBy("player_id")
    },

    // BSR3: the COMPOSITE player baserunning leaderboard —
    // steal ⋈ names ⋈ wGDP ⋈ wEBT → wSB → wsb+wgdp+webt
    // (reference leaderboards/baserunning.py:368-468).
    QueryDef.of("bsr03_baserunning",
      s"""WITH $pbpCte,
        |$stealCtes,
        |$webtCtes,
        |$wgdpCtes,
        |$nameMapCte,
        |joined AS (
        |  SELECT r.player_id, nm.player_name, nm.team_id, r.games,
        |    r.sb, r.cs, r.sb_att,
        |    COALESCE(g.gdp_opps, 0) AS gdp_opps, COALESCE(g.gdp, 0) AS gdp,
        |    COALESCE(g.wgdp, 0.0) AS wgdp,
        |    COALESCE(w.ebt_opps, 0) AS ebt_opps, COALESCE(w.ebt_taken, 0) AS ebt_taken,
        |    COALESCE(w.webt, 0.0) AS webt
        |  FROM rates r
        |  LEFT JOIN nm ON r.player_id = nm.player_id
        |  LEFT JOIN wgdp g ON r.player_id = g.player_id
        |  LEFT JOIN webt w ON r.player_id = w.player_id),
        |lg AS (
        |  SELECT CAST(SUM(sb) AS DOUBLE) AS lg_sb, CAST(SUM(cs) AS DOUBLE) AS lg_cs,
        |    CAST(SUM(sb_att) AS DOUBLE) AS lg_opps FROM joined),
        |final AS (
        |  SELECT j.*,
        |    j.sb * 0.2 + j.cs * (-0.475)
        |      - (CASE WHEN l.lg_opps > 0 THEN (l.lg_sb * 0.2 + l.lg_cs * (-0.475)) / l.lg_opps
        |              ELSE 0.0 END) * greatest(j.sb_att, 0) AS wsb
        |  FROM joined j CROSS JOIN lg l)
        |SELECT player_id, player_name, team_id, games, sb, cs, sb_att,
        |  gdp_opps, gdp, ebt_opps, ebt_taken,
        |  round(wsb, 6) AS wsb, round(wgdp, 6) AS wgdp, round(webt, 6) AS webt,
        |  round(wsb + wgdp + webt, 6) AS baserunning
        |FROM final ORDER BY player_id""".stripMargin) { (s, dir) =>
      Baserunning.playerBaserunning(pbpFromEvents(s, dir),
          runsSb = 0.2, runsCs = -0.475, runsOut = 0.2)
        .select(col("player_id"), col("player_name"), col("team_id"),
          col("games"), col("sb"), col("cs"), col("sb_att"),
          col("gdp_opps"), col("gdp"), col("ebt_opps"), col("ebt_taken"),
          round(col("wsb"), 6).as("wsb"), round(col("wgdp"), 6).as("wgdp"),
          round(col("webt"), 6).as("webt"),
          round(col("baserunning"), 6).as("baserunning"))
        .orderBy("player_id")
    },

    // BSR4: the TEAM baserunning roll-up — team steal stats (single
    // conditional projection), team wGDP, team wSB (reference
    // leaderboards/baserunning.py:471-602). The team wEBT float
    // roll-up is excluded from the hash (cross-row double summation
    // is not bit-stable across engines; covered by BaserunningSpec).
    QueryDef.of("bsr04_team_baserunning",
      s"""WITH $pbpCte,
        |team_steal AS (
        |  SELECT bat_team_id AS team_id, count(DISTINCT contest_id) AS games,
        |    CAST(SUM(CASE WHEN r1_id IS NOT NULL AND event_type NOT IN ('SB','CS') THEN 1 ELSE 0 END) AS BIGINT) AS opp_2b,
        |    CAST(SUM(CASE WHEN r2_id IS NOT NULL AND event_type NOT IN ('SB','CS') THEN 1 ELSE 0 END) AS BIGINT) AS opp_3b,
        |    CAST(SUM(CASE WHEN r1_id IS NOT NULL AND event_type IN ('SB','CS') THEN 1 ELSE 0 END) AS BIGINT) AS att_2b,
        |    CAST(SUM(CASE WHEN r2_id IS NOT NULL AND event_type IN ('SB','CS') THEN 1 ELSE 0 END) AS BIGINT) AS att_3b,
        |    CAST(SUM(CASE WHEN r1_id IS NOT NULL AND event_type = 'SB' THEN 1 ELSE 0 END) AS BIGINT) AS sb_2b,
        |    CAST(SUM(CASE WHEN r2_id IS NOT NULL AND event_type = 'SB' THEN 1 ELSE 0 END) AS BIGINT) AS sb_3b,
        |    CAST(SUM(CASE WHEN r1_id IS NOT NULL AND event_type = 'CS' THEN 1 ELSE 0 END) AS BIGINT) AS cs_2b,
        |    CAST(SUM(CASE WHEN r2_id IS NOT NULL AND event_type = 'CS' THEN 1 ELSE 0 END) AS BIGINT) AS cs_3b
        |  FROM pbp GROUP BY bat_team_id),
        |team_rates AS (
        |  SELECT *, sb_2b + sb_3b AS sb, cs_2b + cs_3b AS cs, att_2b + att_3b AS sb_att
        |  FROM team_steal),
        |tgdp_per AS (
        |  SELECT bat_team_id AS team_id, count(*) AS gdp_opps,
        |    count(CASE WHEN lower(play_description) LIKE '%double play%' THEN 1 END) AS gdp
        |  FROM pbp
        |  WHERE r1_id IS NOT NULL AND outs_before < 2 AND bat_team_id IS NOT NULL
        |  GROUP BY bat_team_id),
        |tgdp_lg AS (
        |  SELECT CASE WHEN SUM(gdp_opps) > 0 THEN CAST(SUM(gdp) AS DOUBLE) / SUM(gdp_opps)
        |              ELSE 0.0 END AS r FROM tgdp_per),
        |tjoined AS (
        |  SELECT t.*, COALESCE(g.gdp_opps, 0) AS gdp_opps, COALESCE(g.gdp, 0) AS gdp,
        |    COALESCE((g.gdp_opps * (SELECT r FROM tgdp_lg) - g.gdp) * 0.5, 0.0) AS wgdp
        |  FROM team_rates t LEFT JOIN tgdp_per g ON t.team_id = g.team_id),
        |tlg AS (
        |  SELECT CAST(SUM(sb) AS DOUBLE) AS lg_sb, CAST(SUM(cs) AS DOUBLE) AS lg_cs,
        |    CAST(SUM(sb_att) AS DOUBLE) AS lg_opps FROM tjoined)
        |SELECT team_id, games, opp_2b, att_2b, sb_2b, cs_2b, opp_3b, att_3b,
        |  sb_3b, cs_3b, sb, cs, sb_att, gdp_opps, gdp,
        |  round(CASE WHEN sb_att > 0 THEN CAST(sb AS DOUBLE) / sb_att ELSE 0.0 END, 6) AS sb_pct,
        |  round(j.sb * 0.2 + j.cs * (-0.475)
        |    - (CASE WHEN l.lg_opps > 0 THEN (l.lg_sb * 0.2 + l.lg_cs * (-0.475)) / l.lg_opps
        |            ELSE 0.0 END) * greatest(j.sb_att, 0), 6) AS wsb,
        |  round(wgdp, 6) AS wgdp
        |FROM tjoined j CROSS JOIN tlg l ORDER BY team_id""".stripMargin) { (s, dir) =>
      graft.war.Baserunning.teamBaserunning(pbpFromEvents(s, dir),
          runsSb = 0.2, runsCs = -0.475, runsOut = 0.2)
        .select(col("team_id"), col("games"), col("opp_2b"), col("att_2b"),
          col("sb_2b"), col("cs_2b"), col("opp_3b"), col("att_3b"),
          col("sb_3b"), col("cs_3b"), col("sb"), col("cs"), col("sb_att"),
          col("gdp_opps"), col("gdp"),
          round(col("sb_pct"), 6).as("sb_pct"),
          round(col("wsb"), 6).as("wsb"), round(col("wgdp"), 6).as("wgdp"))
        .orderBy("team_id")
    },

    // VAL1: value_batter — Σwpa with ± splits in ONE agg, rew, pLI,
    // clutch (reference leaderboards/value.py:13-54).
    QueryDef.of("val01_value_batter",
      s"""WITH $pbpValueCte
        |SELECT batter_id AS player_id,
        |  min(batter_name) AS player_name, min(bat_team_id) AS team_id,
        |  round(SUM(wpa), 6) AS wpa,
        |  round(COALESCE(SUM(CASE WHEN wpa < 0 THEN wpa END), 0.0), 6) AS neg_wpa,
        |  round(COALESCE(SUM(CASE WHEN wpa > 0 THEN wpa END), 0.0), 6) AS pos_wpa,
        |  round(SUM(rea), 6) AS rea,
        |  round(SUM(rea) / 13.0, 6) AS rew,
        |  round(AVG(li), 6) AS pli,
        |  round(SUM(wpa_li), 6) AS wpa_li,
        |  round(CASE WHEN AVG(li) > 0 THEN SUM(wpa) / AVG(li) - SUM(wpa_li) END, 6) AS clutch
        |FROM pbp WHERE batter_id IS NOT NULL
        |GROUP BY batter_id ORDER BY player_id""".stripMargin) { (s, dir) =>
      Value.battingPlayer(pbpValueFromEvents(s, dir), runsPerWin = 13.0)
        .select(col("player_id"), col("player_name"), col("team_id"),
          round(col("wpa"), 6).as("wpa"), round(col("neg_wpa"), 6).as("neg_wpa"),
          round(col("pos_wpa"), 6).as("pos_wpa"), round(col("rea"), 6).as("rea"),
          round(col("rew"), 6).as("rew"), round(col("pli"), 6).as("pli"),
          round(col("wpa_li"), 6).as("wpa_li"),
          round(col("clutch"), 6).as("clutch"))
        .orderBy("player_id")
    },

    // VAL2: value_pitching_team — sign-flipped aggregates, ± split over
    // per-row NEGATED wpa, pitching-change count
    // (reference leaderboards/value.py:153-228).
    QueryDef.of("val02_value_pitching_team",
      s"""WITH $pbpValueCte
        |SELECT pitch_team_id AS team_id, min(pitch_team_name) AS team_name,
        |  round(-SUM(wpa), 6) AS wpa,
        |  round(COALESCE(SUM(CASE WHEN -wpa < 0 THEN -wpa END), 0.0), 6) AS neg_wpa,
        |  round(COALESCE(SUM(CASE WHEN -wpa > 0 THEN -wpa END), 0.0), 6) AS pos_wpa,
        |  round(-SUM(rea), 6) AS rea,
        |  round(-SUM(rea) / 13.0, 6) AS rew,
        |  round(AVG(li), 6) AS pli,
        |  round(-SUM(wpa_li), 6) AS wpa_li,
        |  round(CASE WHEN AVG(li) > 0 THEN (-SUM(wpa)) / AVG(li) - (-SUM(wpa_li)) END, 6) AS clutch,
        |  count(CASE WHEN sub_fl = 1 AND sub_pos = 'p' THEN 1 END) AS pitching_changes
        |FROM pbp WHERE pitcher_id IS NOT NULL
        |GROUP BY pitch_team_id ORDER BY team_id""".stripMargin) { (s, dir) =>
      Value.pitchingTeam(pbpValueFromEvents(s, dir), runsPerWin = 13.0)
        .select(col("team_id"), col("team_name"),
          round(col("wpa"), 6).as("wpa"), round(col("neg_wpa"), 6).as("neg_wpa"),
          round(col("pos_wpa"), 6).as("pos_wpa"), round(col("rea"), 6).as("rea"),
          round(col("rew"), 6).as("rew"), round(col("pli"), 6).as("pli"),
          round(col("wpa_li"), 6).as("wpa_li"),
          round(col("clutch"), 6).as("clutch"), col("pitching_changes"))
        .orderBy("team_id")
    })
}
