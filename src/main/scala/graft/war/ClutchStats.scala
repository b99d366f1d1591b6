package graft.war

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * PBP-derived per-player/team aggregates feeding WAR (reference
 * `processors/war_calculation/pitching.py:93-175`, `batting.py`
 * clutch blocks) — all single hash aggregations over the enriched pbp
 * scan; GMLI is the A12 lead+first-appearance window shape.
 */
object ClutchStats {

  /** Batter clutch: Σrea/Σwpa/Σwpa_li, mean li, clutch = wpa/li −
    * wpa_li (null li → null clutch). `idCol` picks batter_id or
    * bat_team_id. */
  def clutch(pbp: DataFrame, idCol: String, flipSign: Boolean = false): DataFrame = {
    val s = if (flipSign) -1.0 else 1.0
    pbp.groupBy(idCol).agg(
        (sum("rea") * s).as("rea"),
        (sum("wpa") * s).as("wpa"),
        (sum("wpa_li") * s).as("wpa_li"),
        avg("li").as("li_mean"))
      .withColumn("clutch",
        when(col("li_mean") > 0, col("wpa") / col("li_mean") - col("wpa_li")))
  }

  /** GMLI: mean of the NEXT play's leverage at each reliever's first
    * appearance per game (pitching.py:160-172; relievers = first
    * appearance with inning > 1). */
  def gmli(pbp: DataFrame): DataFrame = {
    val w = Window.partitionBy("pitcher_id", "contest_id").orderBy("play_id")
    pbp.filter(col("pitcher_id").isNotNull)
      .withColumn("__next_li", lead("li", 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("inning") > 1)
      .groupBy("pitcher_id")
      .agg(avg("__next_li").as("gmli"))
  }

  /** Pitcher batted-ball profile: flyouts, groundouts, fly balls and
    * HR/FB% (pitching.py:93-113). */
  def pitcherBattedBalls(pbp: DataFrame): DataFrame = {
    val valid = pbp.filter(col("pitcher_id").isNotNull && col("pitcher_id") =!= "")
    valid.groupBy(col("pitcher_id").as("player_id")).agg(
        count(when(col("play_description").rlike("(?i)\\bfli(?:ed|es) out\\b"), 1)).as("fo"),
        count(when(col("play_description").rlike("(?i)\\bground(?:ed|s) out\\b"), 1)).as("go"),
        count(when(col("batted_ball_type") === "FB", 1)).as("fb"),
        count(when(col("event_type") === "HR", 1)).as("__hr"))
      .withColumn("hr_div_fb",
        graft.functions.ScalarFunctions.safeDiv(col("__hr"), col("fb")) * 100)
      .drop("__hr")
  }
}
