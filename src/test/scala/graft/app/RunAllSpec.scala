package graft.app

import graft.SparkTestSession
import graft.war.{FieldSpec, SchemaFinalize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end DAG: raw pbp → five parquet stage outputs, each
  * re-readable (the reference's file-based dataflow edges). */
class RunAllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("RunAll produces every stage output with coherent rows") {
    val raw = Seq(
      (1L, 1, 1, "Adams singled to left", null),
      (1L, 2, 1, "Brown walked", null),
      (1L, 3, 1, "Cole homered, 3 RBI; Adams scored; Brown scored", null),
      (1L, 4, 1, "Dunn struck out swinging", null),
      (1L, 5, 1, null, "Evans grounded into double play"),
      (1L, 6, 2, "Foley flied out to cf", null),
      (2L, 1, 1, "Giles reached on an error by ss", null),
      (2L, 2, 1, "Hart singled, RBI; Giles scored", null))
      .toDF("contest_id", "seq", "inning", "away_text", "home_text")
    val outDir = s"/tmp/graft_runall_${System.nanoTime()}"

    val stages = RunAll.run(spark, raw, outDir)
    val byName = stages.map(s => s.name -> s.rows).toMap
    assert(byName("parsed_pbp") === 8)
    assert(byName("expected_runs") === 8) // 8 base states, zero-filled
    assert(byName("linear_weights") >= 4) // walk/single/hr/out classes
    assert(byName("pbp_with_metrics") === 8)
    assert(byName("leaderboard_batting") >= 5)
    // every output re-readable from disk
    stages.foreach(s => assert(spark.read.parquet(s.path).count() === s.rows))
    // enrichment carried woba + rea columns
    val m = spark.read.parquet(s"$outDir/pbp_with_metrics")
    assert(m.columns.contains("woba") && m.columns.contains("rea"))
  }

  test("RunAll with WE/LI tables runs the full WPA/leverage enrichment") {
    val raw = Seq(
      (1L, 1, 9, "Adams walked", null),
      (1L, 2, 9, "Brown grounded out to ss; Adams out at second", null),
      (1L, 3, 9, null, "Cole homered"))
      .toDF("contest_id", "seq", "inning", "away_text", "home_text")
    // minimal lookup tables covering the states this game visits
    val states = for {
      half <- Seq("Top", "Bottom"); runners <- Seq("NNN", "YNN")
      outs <- 0 to 2; diff <- -1 to 1
    } yield (9, half, runners, outs, diff)
    val we = states.map { case (i, h, r, o, d) => (i, h, r, o, d, 0.5) }
      .toDF("inning", "half", "runners", "outs", "score_diff", "win_expectancy")
    val li = states.map { case (i, h, r, o, d) => (i, h, r, o, d, 1.0) }
      .toDF("inning", "half", "runners", "outs", "score_diff", "leverage_index")

    val outDir = s"/tmp/graft_runall_weli_${System.nanoTime()}"
    RunAll.run(spark, raw, outDir, weTable = Some(we), liTable = Some(li))
    val m = spark.read.parquet(s"$outDir/pbp_with_metrics")
    assert(m.columns.contains("wpa") && m.columns.contains("li")
      && m.columns.contains("times_through_order"))
    // every play's before-state is covered by the WE table → li populated
    assert(m.filter(col("li").isNull).count() === 0)
    // walk-off HR: game-end row gets home_win_exp_after = 1.0
    val last = m.orderBy(col("play_id").desc).limit(1).collect().head
    assert(last.getAs[Double]("home_win_exp_after") === 1.0)
  }

  test("SchemaFinalize: defaults, nullable ints, non-finite scrub, ordered select") {
    val df = Seq(
      ("a", Some(1L), Some(1.5)),
      ("b", None, Some(Double.NaN)),
      (null, Some(3L), None))
      .toDF("name", "maybe_id", "score")
    val fields = Seq(
      SchemaFinalize.strCol("name", "unknown"),
      SchemaFinalize.intColNullable("maybe_id"),
      SchemaFinalize.floatCol("score"),
      SchemaFinalize.intCol("missing_count", 7))
    val out = SchemaFinalize.finalizeSchema(df, fields).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "unknown"))
    assert(out(1).isNullAt(1)) // nullable int stays null
    assert(out(1).isNullAt(2)) // NaN scrubbed to null
    assert(out.forall(_.getLong(3) === 7L)) // missing col filled with default
    assert(SchemaFinalize.battingWar.map(_.name).contains("sos_adj_war"))
  }
}
