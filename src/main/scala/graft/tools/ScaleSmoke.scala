package graft.tools

import graft.GraftSession
import graft.app.RunAll
import graft.queries.QPbp
import org.apache.spark.sql.functions._

/**
 * Full-DAG scale smoke — `runMain graft.tools.ScaleSmoke [sfDir]`:
 * drives RunAll end-to-end (teams → pitchers n/a → standardize n/a →
 * metrics → guts → WAR → the whole leaderboard fan-out) over the
 * synthetic raw pbp derived from the events table (~100k plays /
 * ~1.5k games at sf0.1), with synthetic WE/LI covering every state
 * and synthetic season stats. Prints per-stage rows and total
 * wall-clock — the check that the ORCHESTRATION (not just each
 * operator) stays sane as volume grows.
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scale-smoke")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val raw = QPbp.rawPbpFromEvents(spark, sfDir)

    val teams = raw.select(col("contest_id")).distinct()
      .withColumn("away_team_id", concat(lit("T"), (col("contest_id") % 50).cast("string")))
      .withColumn("home_team_id", concat(lit("T"), ((col("contest_id") + 1) % 50).cast("string")))
      .withColumn("away_team_name", col("away_team_id"))
      .withColumn("home_team_name", col("home_team_id"))

    val states = for {
      inn <- 1 to 9; half <- Seq("Top", "Bottom")
      runners <- Seq("NNN", "YNN", "NYN", "NNY", "YYN", "YNY", "NYY", "YYY")
      outs <- 0 to 2; diff <- -40 to 40
    } yield (inn, half, runners, outs, diff)
    val we = states.map { case (i, h, r, o, d) => (i, h, r, o, d, 0.5) }
      .toDF("inning", "half", "runners", "outs", "score_diff", "win_expectancy")
    val li = states.map { case (i, h, r, o, d) => (i, h, r, o, d, 1.1) }
      .toDF("inning", "half", "runners", "outs", "score_diff", "leverage_index")

    // season stats for the 50×20 batter names the raw generator emits
    val batters = raw
      .select(regexp_extract(coalesce(col("away_text"), col("home_text")),
        "^(P\\d+ Smith\\d+)", 1).as("player_id"))
      .filter(col("player_id") =!= "").distinct()
    val battingStats = batters
      .withColumn("team_id", concat(lit("T"),
        (abs(hash(col("player_id"))) % 50).cast("string")))
      .withColumn("team_name", col("team_id"))
      .withColumn("conference", concat(lit("C"), (abs(hash(col("team_id"))) % 6).cast("string")))
      .withColumn("pos", lit("ss"))
      .withColumn("gp", lit(20)).withColumn("ab", lit(60))
      .withColumn("h", lit(18)).withColumn("2b", lit(4)).withColumn("3b", lit(1))
      .withColumn("hr", lit(2)).withColumn("bb", lit(8)).withColumn("ibb", lit(1))
      .withColumn("hbp", lit(2)).withColumn("k", lit(12)).withColumn("sf", lit(1))
      .withColumn("sh", lit(1)).withColumn("sb", lit(5)).withColumn("cs", lit(2))
      .withColumn("r", lit(12))
    val pitchingStats = battingStats.limit(200)
      .select(col("player_id"), col("team_id"), col("team_name"), col("conference"))
      .withColumn("app", lit(10)).withColumn("gs", lit(5))
      .withColumn("ip", lit(40.1)).withColumn("er", lit(18)).withColumn("r", lit(22))
      .withColumn("era", lit(4.03)).withColumn("h", lit(35)).withColumn("bb", lit(15))
      .withColumn("hbp", lit(4)).withColumn("so", lit(38)).withColumn("hr_a", lit(3))
      .withColumn("bf", lit(170))
    val parkFactors = (0 until 50).map(i => (s"T$i", 95.0 + i % 11)).toDF("team_id", "pf")
    val rankings = (0 until 50).map(i => (s"T$i", 0.3 + (i % 7) * 0.1, s"${10 + i % 8}-${8 + i % 5}"))
      .toDF("massey_team", "sos_val", "record")
    val mappings = (0 until 50).map(i => (s"T$i", s"T$i"))
      .toDF("ncaa_team_name", "massey_team_name")

    val outDir = s"/tmp/graft_scale_smoke_${System.nanoTime()}"
    val t0 = System.nanoTime()
    val stages = RunAll.run(spark, raw, outDir, RunAll.Inputs(
      weTable = Some(we), liTable = Some(li), teams = Some(teams),
      battingStats = Some(battingStats), pitchingStats = Some(pitchingStats),
      parkFactors = Some(parkFactors), rankings = Some(rankings),
      mappings = Some(mappings)))
    val dt = (System.nanoTime() - t0) / 1e9
    stages.foreach(s => println(f"STAGE ${s.name}%-42s ${s.rows}%10d rows"))
    println(f"SCALE_SMOKE_TOTAL $dt%.1f s, ${stages.length} stages")
    spark.stop()
  }
}
