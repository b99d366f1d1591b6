package graft.metrics

import graft.functions.ScalarFunctions
import graft.pbp.EventType
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** League constants record (reference
  * `processors/war_calculation/models.py:43-67` Pydantic schema). */
final case class GutsConstants(
    year: Int, division: String,
    wbb: Double, whbp: Double, w1b: Double, w2b: Double, w3b: Double, whr: Double,
    wobaScale: Double, woba: Double,
    runsSb: Double, runsCs: Double, csRate: Double,
    runsPa: Double, runsOut: Double, runsWin: Double,
    cfip: Double)

/**
 * A4: GUTS constants (reference `processors/get_guts.py:29-127`) —
 * league wOBA, stolen-base run values, run environment (runs/PA,
 * runs/out, runs/win via the two-level per-game aggregate), FIP
 * constant. All global sums/means: each input collapses to a 1-row
 * aggregate on the driver (tiny), mirroring SURVEY §7.4 #4's
 * global-scalar feedback design.
 */
object Guts {

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def safeDiv(n: Double, d: Double, fill: Double = 0.0): Double =
    if (d > 0) n / d else fill

  /**
   * @param pbpWithMetrics parsed pbp (runs_on_play, outs_on_play,
   *                       event_type, bat_order, contest_id)
   * @param lwNormalized   [[LinearWeights.normalized]] output
   * @param batting        season batting sums (h, 2b, 3b, hr, bb, hbp, ab, sf)
   * @param pitching       season pitching sums (ip, er, hr_a, bb, hbp, so)
   */
  def compute(
      pbpWithMetrics: DataFrame,
      lwNormalized: DataFrame,
      batting: DataFrame,
      pitching: DataFrame,
      year: Int,
      division: String): GutsConstants = {

    // wOBA weights from the normalized linear weights (get_guts.py:29-66)
    val lw = lwNormalized.select("events", "normalized_weight").collect()
      .map(r0 => r0.getString(0) -> (if (r0.isNullAt(1)) 0.0 else r0.getDouble(1))).toMap
    val wbb = lw.getOrElse("walk", 0.0)
    val whbp = lw.getOrElse("hit_by_pitch", 0.0)
    val w1b = lw.getOrElse("single", 0.0)
    val w2b = lw.getOrElse("double", 0.0)
    val w3b = lw.getOrElse("triple", 0.0)
    val whr = lw.getOrElse("home_run", 0.0)
    val wobaScale = lw.getOrElse("woba_scale", 1.0)

    val b = batting.agg(
      sum("h").cast("double").as("h"), sum("2b").cast("double").as("d2"),
      sum("3b").cast("double").as("d3"), sum("hr").cast("double").as("hr"),
      sum("bb").cast("double").as("bb"), sum("hbp").cast("double").as("hbp"),
      sum("ab").cast("double").as("ab"), sum("sf").cast("double").as("sf")).first()
    val (h, d2, d3, hr, bb, hbp, ab, sf) = (b.getDouble(0), b.getDouble(1), b.getDouble(2),
      b.getDouble(3), b.getDouble(4), b.getDouble(5), b.getDouble(6), b.getDouble(7))
    val singles = h - d2 - d3 - hr
    val wobaNum = bb * wbb + hbp * whbp + singles * w1b + d2 * w2b + d3 * w3b + hr * whr
    val woba = r(safeDiv(wobaNum, ab + bb + hbp + sf), 3)

    // baserunning constants (get_guts.py:69-88)
    val p = pbpWithMetrics.agg(
      sum("runs_on_play").cast("double").as("runs"),
      sum("outs_on_play").cast("double").as("outs"),
      count(when(col("event_type") === EventType.StolenBase, 1)).cast("double").as("sb"),
      count(when(col("event_type") === EventType.CaughtStealing, 1)).cast("double").as("cs"),
      count(when(col("bat_order").isNotNull, 1)).cast("double").as("pa")).first()
    val (runs, outs, sb, cs, pa) = (p.getDouble(0), p.getDouble(1), p.getDouble(2),
      p.getDouble(3), p.getDouble(4))
    val runsOutRaw = safeDiv(runs, outs)
    val runsCs = r(-(2 * runsOutRaw + 0.075), 3)
    val csRate = r(safeDiv(cs, sb + cs), 3)

    // run environment (get_guts.py:91-105): runs/win via the
    // two-level groupBy(contest).sum → global mean
    val perGameMean = pbpWithMetrics
      .groupBy("contest_id").agg(sum("runs_on_play").cast("double").as("g"))
      .agg(avg("g")).first().getDouble(0)
    val runsWin = r((perGameMean / 2) * 1.5 + 3, 3)

    // FIP constant (get_guts.py:108-122)
    val pit = pitching
      .withColumn("ip_float", ScalarFunctions.ipToFloat(col("ip").cast("double")))
      .agg(sum("ip_float").cast("double"), sum("er").cast("double"),
        sum("hr_a").cast("double"), sum("bb").cast("double"),
        sum("hbp").cast("double"), sum("so").cast("double")).first()
    val (ip, er, hrA, pbb, phbp, so) = (pit.getDouble(0), pit.getDouble(1), pit.getDouble(2),
      pit.getDouble(3), pit.getDouble(4), pit.getDouble(5))
    val lgEra = er * 9 / ip
    val fipComp = (13 * hrA + 3 * (pbb + phbp) - 2 * so) / ip
    val cfip = r(lgEra - fipComp, 3)

    GutsConstants(year, division,
      wbb = wbb, whbp = whbp, w1b = w1b, w2b = w2b, w3b = w3b, whr = whr,
      wobaScale = wobaScale, woba = woba,
      runsSb = r(0.2, 3), runsCs = runsCs, csRate = csRate,
      runsPa = r(safeDiv(runs, pa), 4), runsOut = r(runsOutRaw, 4), runsWin = runsWin,
      cfip = cfip)
  }
}
