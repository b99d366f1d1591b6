package graft.metrics

import graft.pbp.EventType
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The pbp metric-enrichment stage (reference
 * `processors/add_pbp_metrics.py:36-231`): wOBA weight per event,
 * run-expectancy before/after/delta/REA, win expectancy + leverage +
 * WPA, and the leverage/TTO flags.
 *
 * Every reference dict lookup (`build_re_lookup`/`build_we_lookup`/
 * `build_li_lookup` + per-row `df.apply`) becomes a broadcast hash
 * join — the lookup tables are KBs; at 100 TB of pbp the big side
 * streams map-side with zero shuffle, and the only window is the
 * per-game max-inning clamp (one exchange on contest_id, shared by
 * the TTO counter).
 */
object PbpMetrics {

  /** wOBA weight column from normalized linear weights
    * (add_pbp_metrics.py:34-56): woba-event rows get their class
    * weight, everything else 0.0. */
  def addWoba(pbp: DataFrame, lwNormalized: DataFrame): DataFrame = {
    val wobaEvents = Map(
      EventType.Walk -> "walk", EventType.IntentionalWalk -> "walk",
      EventType.HitByPitch -> "hit_by_pitch", EventType.Single -> "single",
      EventType.Double -> "double", EventType.Triple -> "triple",
      EventType.HomeRun -> "home_run")
    val classMap = wobaEvents.foldLeft(lit(null).cast("string")) { case (acc, (et, cls)) =>
      when(col("event_type") === et, cls).otherwise(acc)
    }
    val weights = lwNormalized.select(col("events").as("__wcls"),
      col("normalized_weight").as("__w"))
    pbp.withColumn("__wcls", classMap)
      .join(broadcast(weights), Seq("__wcls"), "left")
      .withColumn("woba", coalesce(col("__w"), lit(0.0)))
      .drop("__wcls", "__w")
  }

  /** [[addWoba]] with the weights as a driver-side literal map
    * (events class → normalized weight). The weights table is O(1)
    * rows at any data scale, so a `typedlit` map lookup replaces the
    * broadcast join entirely — one fewer exchange and the projection
    * stays inside a single codegen stage. */
  def addWobaLit(pbp: DataFrame, weights: Map[String, Double]): DataFrame = {
    val wobaEvents = Map(
      EventType.Walk -> "walk", EventType.IntentionalWalk -> "walk",
      EventType.HitByPitch -> "hit_by_pitch", EventType.Single -> "single",
      EventType.Double -> "double", EventType.Triple -> "triple",
      EventType.HomeRun -> "home_run")
    val classMap = wobaEvents.foldLeft(lit(null).cast("string")) { case (acc, (et, cls)) =>
      when(col("event_type") === et, cls).otherwise(acc)
    }
    pbp.withColumn("woba",
      coalesce(element_at(typedlit(weights), classMap), lit(0.0)))
  }

  /** [[addRunExpectancy]] with the ER matrix as a literal map keyed
    * `"<bases>|<outs>"` — same O(1)-dimension reasoning as
    * [[addWobaLit]]; unknown states stay null like the left join. */
  def addRunExpectancyLit(pbp: DataFrame, er: Map[String, Double]): DataFrame = {
    val erLit = typedlit(er)
    def look(bases: String, outs: String) =
      element_at(erLit, concat(col(bases), lit("|"), col(outs).cast("string")))
    pbp
      .withColumns(Map(
        "re_before" -> look("bases_before", "outs_before"),
        "re_after" ->
          when(col("inn_end_fl") === true || col("outs_after") >= 3, 0.0)
            .otherwise(look("bases_after", "outs_after"))))
      .withColumn("re_delta", col("re_after") - col("re_before"))
      .withColumn("rea", col("re_delta") + col("runs_on_play"))
  }

  /** Flatten a wide ER matrix (one row per base state, erv_0..erv_2)
    * into the `"<bases>|<outs>"` map [[addRunExpectancyLit]] takes. */
  def erMatrixToMap(erWide: DataFrame): Map[String, Double] =
    erWide.collect().flatMap { r =>
      val bases = r.getString(r.fieldIndex("bases"))
      Seq(0, 1, 2).map { o =>
        s"$bases|$o" -> r.getDouble(r.fieldIndex(s"erv_$o"))
      }
    }.toMap

  /** Run expectancy before/after + delta + REA
    * (add_pbp_metrics.py:59-95). After-state: 0.0 at end of inning or
    * 3rd out; unknown states null (reference pd.NA). */
  def addRunExpectancy(pbp: DataFrame, erWide: DataFrame): DataFrame = {
    val re = ExpectedRuns.unpivot(erWide)
    val reB = re.select(col("bases").as("__bb"), col("outs").as("__ob"), col("erv").as("__reb"))
    val reA = re.select(col("bases").as("__ba"), col("outs").as("__oa"), col("erv").as("__rea"))
    pbp
      .join(broadcast(reB),
        col("bases_before") === col("__bb") && col("outs_before") === col("__ob"), "left")
      .join(broadcast(reA),
        col("bases_after") === col("__ba") && col("outs_after") === col("__oa"), "left")
      .withColumn("re_before", col("__reb"))
      .withColumn("re_after",
        when(col("inn_end_fl") === true || col("outs_after") >= 3, 0.0)
          .otherwise(col("__rea")))
      .withColumn("re_delta", col("re_after") - col("re_before"))
      .withColumn("rea", col("re_delta") + col("runs_on_play"))
      .drop("__bb", "__ob", "__reb", "__ba", "__oa", "__rea")
  }

  /**
   * Win expectancy, leverage index and WPA
   * (add_pbp_metrics.py:128-231). `weTable`/`liTable` are keyed by
   * (inning, half, runners, outs, score_diff) with value columns
   * `win_expectancy` / `leverage_index`.
   *
   * The effective-inning clamp maps short/long games onto the 9-inning
   * table; the after-state key rolls over to the next half inning when
   * the inning ended; game-end rows override to 1.0/0.0 (ties fall
   * back to the table).
   */
  def addWinExpectancy(pbp: DataFrame, weTable: DataFrame, liTable: DataFrame): DataFrame = {
    val wGame = Window.partitionBy("contest_id")

    val base = pbp
      .withColumn("__max_inn", max("inning").over(wGame))
      .withColumn("__eff_inn",
        least(col("inning") + greatest(lit(9) - col("__max_inn"), lit(0)), lit(9)))
      .withColumn("score_diff_before", col("home_score_before") - col("away_score_before"))
      .withColumn("score_diff_after", col("home_score_after") - col("away_score_after"))

    def weKeyed(suffix: String) = weTable.select(
      col("inning").as(s"__i$suffix"), col("half").as(s"__h$suffix"),
      col("runners").as(s"__r$suffix"), col("outs").as(s"__o$suffix"),
      col("score_diff").as(s"__d$suffix"), col("win_expectancy").as(s"__we$suffix"))
    val liKeyed = liTable.select(
      col("inning").as("__il"), col("half").as("__hl"), col("runners").as("__rl"),
      col("outs").as("__ol"), col("score_diff").as("__dl"), col("leverage_index").as("__li"))

    // before-state join (+ leverage on the same key)
    val withBefore = base
      .join(broadcast(weKeyed("b")),
        col("__eff_inn") === col("__ib") && col("half") === col("__hb") &&
          col("bases_before") === col("__rb") && col("outs_before") === col("__ob") &&
          col("score_diff_before") === col("__db"), "left")
      .withColumn("home_win_exp_before", col("__web"))
      .join(broadcast(liKeyed),
        col("__eff_inn") === col("__il") && col("half") === col("__hl") &&
          col("bases_before") === col("__rl") && col("outs_before") === col("__ol") &&
          col("score_diff_before") === col("__dl"), "left")
      .withColumn("li", col("__li"))

    // after-state key with inning rollover (add_pbp_metrics.py:186-196)
    val rolled = withBefore
      .withColumn("__a_runners",
        when(col("inn_end_fl") === true, "NNN").otherwise(col("bases_after")))
      .withColumn("__a_outs",
        when(col("inn_end_fl") === true, 0).otherwise(col("outs_after")))
      .withColumn("__a_inn",
        when(col("inn_end_fl") === true && col("half") === "Bottom",
          least(col("__eff_inn") + 1, lit(9))).otherwise(col("__eff_inn")))
      .withColumn("__a_half",
        when(col("inn_end_fl") === true,
          when(col("half") === "Bottom", "Top").otherwise("Bottom"))
          .otherwise(col("half")))

    val withAfter = rolled
      .join(broadcast(weKeyed("a")),
        col("__a_inn") === col("__ia") && col("__a_half") === col("__ha") &&
          col("__a_runners") === col("__ra") && col("__a_outs") === col("__oa") &&
          col("score_diff_after") === col("__da"), "left")
      .withColumn("home_win_exp_after",
        when(col("game_end_fl") === true && col("home_score_after") > col("away_score_after"), 1.0)
          .when(col("game_end_fl") === true && col("away_score_after") > col("home_score_after"), 0.0)
          .otherwise(col("__wea")))

    withAfter
      .withColumn("delta_home_win_exp", col("home_win_exp_after") - col("home_win_exp_before"))
      .withColumn("wpa",
        when(col("half") === "Bottom", col("delta_home_win_exp"))
          .otherwise(-col("delta_home_win_exp")))
      .withColumn("wpa_li",
        when(coalesce(col("li"), lit(0.0)) =!= 0.0,
          coalesce(col("wpa"), lit(0.0)) / col("li")).otherwise(0.0))
      .drop(withAfter.columns.filter(_.startsWith("__")).toIndexedSeq: _*)
  }

  /** TTO counter + leverage flags (add_pbp_metrics.py:234-241). */
  def addFlags(pbp: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("contest_id", "pitcher_name", "batter_name", "bat_order")
      .orderBy("play_id")
    pbp
      .withColumn("times_through_order", row_number().over(w))
      .withColumn("high_leverage_fl", col("li") >= 2)
      .withColumn("low_leverage_fl", col("li") <= 0.85)
  }

  /** Full enrichment chain. `pbp` must carry a `pitcher_name` column
    * (from [[graft.pbp.PitcherQueue]], or a literal when lineups are
    * unavailable). */
  def enrich(
      pbp: DataFrame, lwNormalized: DataFrame, erWide: DataFrame,
      weTable: DataFrame, liTable: DataFrame): DataFrame =
    addFlags(addWinExpectancy(addRunExpectancy(addWoba(pbp, lwNormalized), erWide),
      weTable, liTable))
}
