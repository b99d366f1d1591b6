package graft.leaderboards

import graft.functions.ScalarFunctions.safeDiv
import graft.pbp.EventType
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Leaderboard aggregation kernels (reference
 * `processors/leaderboards/common.py:23-63`, `situational.py:19-150`,
 * `batted_ball.py:77-161`).
 *
 * The reference runs the batting kernel through a per-group Python
 * `apply` loop and re-filters the frame once per situation; here the
 * kernel is ONE vectorized conditional aggregation, and the
 * situational table computes all five situations in a SINGLE pass
 * (`sum(when(sit && cond))` columns) — the plan SURVEY §2.4 A5/A6
 * calls the big perf win: one scan + one shuffle regardless of the
 * number of situations.
 */
object Kernel {

  /** wOBA weights by linear-weight class (from
    * [[graft.metrics.LinearWeights.normalized]]). */
  type Weights = Map[String, Double]

  private def cnt(cond: Column): Column = count(when(cond, 1))

  /** The conditional-count core shared by all kernel variants: event
    * counts under an extra situation predicate. */
  private def kernelAggs(sit: Column, suffix: String, weights: Weights): Seq[Column] = {
    def et(t: String) = cnt(sit && col("event_type") === t)
    val walks = et(EventType.Walk)
    val hbp = et(EventType.HitByPitch)
    val singles = et(EventType.Single)
    val doubles = et(EventType.Double)
    val triples = et(EventType.Triple)
    val hrs = et(EventType.HomeRun)
    val outs = et(EventType.GenericOut) + et(EventType.Strikeout)
    val errors = et(EventType.Error)
    val sf = cnt(sit && col("sf_fl") === 1)
    val rea = sum(when(sit, col("rea")))
    Seq(
      walks.as(s"__bb$suffix"), hbp.as(s"__hbp$suffix"), singles.as(s"__1b$suffix"),
      doubles.as(s"__2b$suffix"), triples.as(s"__3b$suffix"), hrs.as(s"__hr$suffix"),
      outs.as(s"__outs$suffix"), errors.as(s"__e$suffix"), sf.as(s"__sf$suffix"),
      rea.as(s"__rea$suffix"))
  }

  /** Derive (woba, ba, pa, rea, slg, obp) columns from the counted
    * aggregates (common.py:36-63, incl. pa==0 → null semantics). */
  private def derive(df: DataFrame, suffix: String, out: String, weights: Weights): DataFrame = {
    def c(n: String) = col(s"__$n$suffix")
    val hits = c("1b") + c("2b") + c("3b") + c("hr")
    val ab = hits + c("outs") + c("e")
    val pa = ab + c("bb") + c("sf") + c("hbp")
    val wobaNum = lit(weights.getOrElse("walk", 0.0)) * c("bb") +
      lit(weights.getOrElse("hit_by_pitch", 0.0)) * c("hbp") +
      lit(weights.getOrElse("single", 0.0)) * c("1b") +
      lit(weights.getOrElse("double", 0.0)) * c("2b") +
      lit(weights.getOrElse("triple", 0.0)) * c("3b") +
      lit(weights.getOrElse("home_run", 0.0)) * c("hr")
    val wobaDenom = ab + c("bb") + c("sf") + c("hbp")
    val sfx = if (out.isEmpty) "" else s"_$out"
    df
      .withColumn(s"pa$sfx", pa)
      .withColumn(s"woba$sfx", when(pa === 0, lit(null)).otherwise(
        when(wobaDenom > 0, wobaNum / wobaDenom)))
      .withColumn(s"ba$sfx", when(pa === 0, lit(null)).otherwise(when(ab > 0, hits / ab)))
      .withColumn(s"slg$sfx", when(pa === 0, lit(null)).otherwise(
        when(ab > 0, (c("1b") + c("2b") * 2 + c("3b") * 3 + c("hr") * 4) / ab)))
      .withColumn(s"obp$sfx", when(pa === 0, lit(null)).otherwise(
        when(wobaDenom > 0, (hits + c("bb") + c("hbp")) / wobaDenom)))
      .withColumn(s"rea$sfx", when(pa === 0, lit(0.0)).otherwise(coalesce(c("rea"), lit(0.0))))
  }

  /** Pre-enrichment frames may lack `rea` — the reference treats it
    * as 0 then (common.py:47 `if "rea" in group.columns else 0`). */
  private def withRea(pbp: DataFrame): DataFrame =
    if (pbp.columns.contains("rea")) pbp else pbp.withColumn("rea", lit(0.0))

  /** A5: the batting-metric kernel for one grouping — one hash agg. */
  def battingMetrics(pbp0: DataFrame, keys: Seq[String], weights: Weights): DataFrame = {
    val pbp = withRea(pbp0)
    val aggs = kernelAggs(lit(true), "", weights)
    val grouped = pbp.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    derive(grouped, "", "", weights)
      .drop(grouped.columns.filter(_.startsWith("__")).toIndexedSeq: _*)
  }

  /** Situation predicates (situational.py:8-27): RISP, runners on,
    * high/low leverage, overall. Runner columns use the state
    * machine's ""-for-empty convention. */
  def situations: Seq[(String, Column)] = {
    def occupied(c: String) = col(c).isNotNull && col(c) =!= ""
    Seq(
      "risp" -> (occupied("r2_name") || occupied("r3_name")),
      "runners_on" -> (occupied("r1_name") || occupied("r2_name") || occupied("r3_name")),
      "high_leverage" -> (col("high_leverage_fl") === true),
      "low_leverage" -> (col("low_leverage_fl") === true),
      "overall" -> lit(true))
  }

  /** A6: all five situations in ONE pass — wide output columns
    * `<stat>_<situation>` (situational.py's filter-per-situation ×
    * pivot, collapsed to a single aggregation). */
  def situational(pbp: DataFrame, keys: Seq[String], weights: Weights): DataFrame =
    condSplits(pbp, keys, situations, weights)

  /** The generic one-pass multi-condition kernel: every named split
    * becomes `sum(when(cond, …))` columns in a SINGLE aggregation
    * (splits.py / situational.py collapse onto this). */
  def condSplits(
      pbp0: DataFrame, keys: Seq[String], splits: Seq[(String, Column)],
      weights: Weights): DataFrame = {
    val pbp = withRea(pbp0)
    val aggs = splits.flatMap { case (name, cond) => kernelAggs(cond, s"_$name", weights) }
    val grouped = pbp.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val derived = splits.foldLeft(grouped) { case (d, (name, _)) =>
      derive(d, s"_$name", name, weights)
    }
    derived.drop(grouped.columns.filter(_.startsWith("__")).toIndexedSeq: _*)
  }

  /** Handedness splits (reference `leaderboards/splits.py:26-177`):
    * the kernel under vs-R / vs-L / vs-S conditions on `handCol`,
    * again in ONE pass — wide `<stat>_vs_<hand>` columns. */
  def handednessSplits(
      pbp: DataFrame, keys: Seq[String], handCol: String, weights: Weights): DataFrame =
    condSplits(pbp, keys, Seq("R", "L", "S").map(h => s"vs_$h" -> (col(handCol) === h)), weights)

  /** A7: batted-ball type profile — conditional sums + ratios in the
    * same agg (batted_ball.py:77-161 shape). */
  def battedBallProfile(pbp: DataFrame, keys: Seq[String]): DataFrame = {
    def bb(t: String) = cnt(col("batted_ball_type") === t)
    val grouped = pbp
      .filter(col("batted_ball_type").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("batted_balls"),
        bb("GB").as("gb"), bb("FB").as("fb"), bb("LD").as("ld"),
        bb("PU").as("pu"), bb("BU").as("bu"))
    grouped
      .withColumn("gb_pct", safeDiv(col("gb") * 100.0, col("batted_balls")))
      .withColumn("fb_pct", safeDiv(col("fb") * 100.0, col("batted_balls")))
      .withColumn("ld_pct", safeDiv(col("ld") * 100.0, col("batted_balls")))
      .withColumn("pu_pct", safeDiv(col("pu") * 100.0, col("batted_balls")))
      .withColumn("gb_fb_ratio", safeDiv(col("gb"), col("fb")))
  }

  /** Handedness enrichment via broadcast dimension join
    * (common.py:67-117's Series.map, J2 shape). */
  def addHandedness(pbp: DataFrame, info: DataFrame): DataFrame = {
    val norm: Column => Column = c => {
      val u = upper(trim(c))
      when(u.isin("RIGHT", "R"), "R")
        .when(u.isin("LEFT", "L"), "L")
        .when(u.isin("SWITCH", "S"), "S")
        .when(u.isin("BOTH", "B"), "B")
    }
    val throwsDim = info.filter(col("player_id").isNotNull)
      .dropDuplicates("player_id")
      .select(col("player_id").as("__tid"), norm(col("throws")).as("pitcher_hand"))
    val batsDim = info.filter(col("player_id").isNotNull)
      .dropDuplicates("player_id")
      .select(col("player_id").as("__bid"), norm(col("bats")).as("batter_hand"))
    pbp
      .join(broadcast(throwsDim), col("pitcher_id") === col("__tid"), "left")
      .join(broadcast(batsDim), col("batter_id") === col("__bid"), "left")
      .drop("__tid", "__bid")
  }
}
