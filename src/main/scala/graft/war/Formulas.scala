package graft.war

import graft.functions.ScalarFunctions.safeDiv
import graft.metrics.GutsConstants
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Batting rate/value formulas (reference
 * `processors/war_calculation/batting.py:11-131`) as codegen'd Column
 * functions — each is a pure arithmetic kernel applied over the
 * season-stats scan; league scalars arrive as literals (driver
 * aggregates, SURVEY §7.4 #4).
 */
object BattingFormulas {

  def singles(h: Column, d2: Column, d3: Column, hr: Column): Column = h - hr - d3 - d2
  def plateAppearances(ab: Column, bb: Column, ibb: Column, hbp: Column, sf: Column): Column =
    ab + bb + ibb + hbp + sf
  def totalBases(s1: Column, d2: Column, d3: Column, hr: Column): Column =
    s1 + lit(2) * d2 + lit(3) * d3 + lit(4) * hr
  def battingAverage(h: Column, ab: Column): Column = safeDiv(h, ab)
  def onBasePct(h: Column, bb: Column, hbp: Column, ibb: Column, ab: Column, sf: Column): Column =
    safeDiv(h + bb + hbp + ibb, ab + bb + ibb + hbp + sf)
  def sluggingPct(tb: Column, ab: Column): Column = safeDiv(tb, ab)
  def ops(obp: Column, slg: Column): Column = obp + slg
  def isolatedPower(slg: Column, ba: Column): Column = slg - ba
  def babip(h: Column, hr: Column, ab: Column, k: Column, sf: Column): Column =
    safeDiv(h - hr, ab - hr - k + sf)
  def walkPct(bb: Column, pa: Column): Column = safeDiv(bb, pa) * 100
  def strikeoutPct(k: Column, pa: Column): Column = safeDiv(k, pa) * 100
  def stolenBasePct(sb: Column, cs: Column): Column = safeDiv(sb, sb + cs) * 100
  def runsCreated(tb: Column, h: Column, bb: Column, ab: Column): Column =
    safeDiv(tb * (h + bb), ab + bb)
  def opsPlus(obp: Column, slg: Column, lgObp: Double, lgSlg: Double): Column =
    lit(100) * (safeDiv(obp, lit(lgObp)) + safeDiv(slg, lit(lgSlg)) - 1)

  /** wOBA from counting stats and league weights (batting.py:77-88). */
  def woba(bb: Column, hbp: Column, s1: Column, d2: Column, d3: Column, hr: Column,
      ab: Column, ibb: Column, sf: Column, g: GutsConstants): Column = {
    val num = lit(g.wbb) * bb + lit(g.whbp) * hbp + lit(g.w1b) * s1 +
      lit(g.w2b) * d2 + lit(g.w3b) * d3 + lit(g.whr) * hr
    safeDiv(num, ab + bb - ibb + sf + hbp)
  }

  def wraa(wobaVal: Column, lgWoba: Double, wobaScale: Double, pa: Column): Column =
    (wobaVal - lgWoba) / wobaScale * pa
  def wrc(wobaVal: Column, lgWoba: Double, wobaScale: Double, lgRpa: Double, pa: Column): Column =
    ((wobaVal - lgWoba) / wobaScale + lgRpa) * pa
  def wrcPlus(wraaVal: Column, pa: Column, lgRpa: Double, lgWrcPa: Double, pf: Column): Column =
    safeDiv(safeDiv(wraaVal, pa) + lgRpa + (lit(lgRpa) - pf / 100 * lgRpa), lit(lgWrcPa)) * 100

  /** Park/conference-adjusted batting runs (batting.py:119-121). */
  def battingRuns(wraaVal: Column, pa: Column, pf: Column,
      lgRpa: Double, confRpa: Column): Column =
    wraaVal + (lit(lgRpa) - pf / 100 * lgRpa) * pa + (lit(lgRpa) - confRpa) * pa

  /** Replacement-level runs share (batting.py:124-127). */
  def replacementRuns(pa: Column, totalPa: Double, teamCount: Int,
      totalGames: Double, rpw: Double): Column = {
    val gamesPlayed = totalGames * 2 / teamCount
    val repConstant = teamCount / 2.0 * gamesPlayed - teamCount * gamesPlayed * 0.294
    lit(repConstant * rpw) * safeDiv(pa, lit(totalPa))
  }

  /** wSB: SB run value above the league rate (batting.py:102-116).
    * League scalars precomputed by the caller. */
  def wsb(sb: Column, cs: Column, opps: Column, runsOut: Double, lgWsb: Double): Column = {
    val runCs = -(2 * runsOut + 0.075)
    sb * 0.2 + cs * runCs - lit(lgWsb) * opps
  }
}

/**
 * Pitching formulas (reference
 * `processors/war_calculation/pitching.py:10-90`).
 */
object PitchingFormulas {

  def era(er: Column, ip: Column): Column = safeDiv(er * 9, ip)
  def k9(so: Column, ip: Column): Column = safeDiv(so * 9, ip)
  def bb9(bb: Column, ip: Column): Column = safeDiv(bb * 9, ip)
  def h9(h: Column, ip: Column): Column = safeDiv(h * 9, ip)
  def hr9(hr: Column, ip: Column): Column = safeDiv(hr * 9, ip)
  def ra9(r: Column, ip: Column): Column = safeDiv(r * 9, ip)
  def whip(bb: Column, h: Column, ip: Column): Column = safeDiv(bb + h, ip)
  def kPct(so: Column, bf: Column): Column = safeDiv(so, bf) * 100
  def bbPct(bb: Column, bf: Column): Column = safeDiv(bb, bf) * 100

  def eraPlus(playerEra: Column, lgEra: Double, pf: Column): Column =
    lit(100) * (lit(2) - playerEra / lgEra * (lit(100) / pf))

  /** Dynamic runs-per-win (pitching.py:73-74). */
  def dynamicRpw(ipPerGame: Column, confRa9: Column, pra9: Column): Column =
    (((lit(18) - ipPerGame) * confRa9 + ipPerGame * pra9) / 18 + 2) * 1.5

  /** Starter/reliever replacement level (pitching.py:77-79). */
  def replacementLevel(gs: Column, app: Column): Column = {
    val gsRate = safeDiv(gs, app)
    lit(0.03) * (lit(1) - gsRate) + lit(0.12) * gsRate
  }

  /** Wins above replacement from runs-against-average (pitching.py:82-85). */
  def pitchingWar(raap9: Column, drpw: Column, replacement: Column, ip: Column): Column =
    (safeDiv(raap9, drpw) + replacement) * (ip / 9)

  /** Reliever leverage multiplier (pitching.py:87-90). */
  def leverageAdjustment(war: Column, gmli: Column, app: Column, gs: Column): Column = {
    val reliefPct = when(app > 0, (app - gs) / app).otherwise(0.0)
    war * (reliefPct * (lit(1) + gmli) / 2 + (lit(1) - reliefPct))
  }
}
