package graft.pbp

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parser-stage test on a synthetic two-game fixture —
  * exercises metadata → flags → outs → runs (window forms of the
  * reference's O(n²) loops) → base state → classify through Spark. */
class PbpPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (contest_id, seq, inning, away_text, home_text)
  private val game1 = Seq(
    (1L, 1, 1, "Adams singled to left", null),
    (1L, 2, 1, "Brown walked", null),
    (1L, 3, 1, "Cole homered, 3 RBI; Adams scored; Brown scored", null),
    (1L, 4, 1, "Dunn struck out swinging", null),
    (1L, 5, 1, "", ""), // dropped by metadata
    (1L, 6, 1, null, "Evans grounded into double play"),
    (1L, 7, 2, "Foley flied out to cf", null))
  private val game2 = Seq(
    (2L, 1, 1, null, "Giles reached on an error by ss"),
    (2L, 2, 1, null, "Giles stole second"),
    (2L, 3, 1, null, "Hart singled, RBI; Giles scored"))

  private lazy val parsed = PbpPipeline.parse(
    (game1 ++ game2).toDF("contest_id", "seq", "inning", "away_text", "home_text"))
    .orderBy("contest_id", "play_id")

  private lazy val rows: Array[Row] = parsed.collect()
  private def g1 = rows.filter(_.getAs[Long]("contest_id") == 1L)
  private def g2 = rows.filter(_.getAs[Long]("contest_id") == 2L)

  test("metadata drops empty rows and assigns contiguous play_id per game") {
    assert(g1.map(_.getAs[Int]("play_id")).toSeq === (1 to 6))
    assert(g2.map(_.getAs[Int]("play_id")).toSeq === (1 to 3))
    assert(g1.map(_.getAs[String]("half")).toSeq ===
      Seq("Top", "Top", "Top", "Top", "Bottom", "Top"))
  }

  test("boundary flags") {
    assert(g1.head.getAs[Boolean]("new_game_fl"))
    assert(g1.last.getAs[Boolean]("game_end_fl"))
    assert(g1.count(_.getAs[Boolean]("new_inn_fl")) === 3) // 1-Top, 1-Bottom, 2-Top
  }

  test("outs: per-play and running exclusive cumsum per inning-half") {
    val outs = g1.map(r => (r.getAs[Int]("outs_on_play"), r.getAs[Int]("outs_before")))
    // plays: single, walk, HR, K, DP(own half), flyout(new inning)
    assert(outs === Array((0, 0), (0, 0), (0, 0), (1, 0), (2, 0), (1, 0)))
    assert(g1(3).getAs[Int]("outs_after") === 1)
  }

  test("runs_on_play: explicit scored counts and RBI fallback") {
    // HR line: homered + 2×scored = 3 explicit (RBI ignored since explicit>0)
    assert(g1(2).getAs[Int]("runs_on_play") === 3)
    // g2 single: "RBI" + "Giles scored" → explicit 1
    assert(g2(2).getAs[Int]("runs_on_play") === 1)
    assert(g1(0).getAs[Int]("runs_on_play") === 0)
  }

  test("runs_this_inn / runs_roi window forms match the reference's loop semantics") {
    // 1-Top inning: total 3 runs, all on play 3
    val top1 = g1.take(4)
    assert(top1.map(_.getAs[Int]("runs_this_inn")).toSeq === Seq(3, 3, 3, 3))
    assert(top1.map(_.getAs[Int]("runs_roi")).toSeq === Seq(3, 3, 3, 0))
  }

  test("base state: forces, HR clear, runner events") {
    assert(g1(0).getAs[String]("r1_after") === "Adams")
    assert(g1(1).getAs[String]("bases_after") === "YYN")
    assert(g1(2).getAs[String]("bases_before") === "YYN")
    assert(g1(2).getAs[String]("bases_after") === "NNN") // HR clears
    // game 2: error→1st, steal→2nd, single scores Giles
    assert(g2(0).getAs[String]("r1_after") === "Giles")
    assert(g2(1).getAs[String]("r2_after") === "Giles")
    assert(g2(1).getAs[String]("batter_name") === "")
    assert(g2(2).getAs[String]("bases_after") === "YNN") // Hart on 1st
  }

  test("withPitchers folds the queue machine per game against lineups") {
    import org.apache.spark.sql.functions._
    // pitch team = the team NOT batting: Top → home pitches
    val withTeam = parsed.withColumn("pitch_team_id",
      when(col("half") === "Top", concat(lit("H"), col("contest_id")))
        .otherwise(concat(lit("A"), col("contest_id"))))
    val lineups = Seq(
      (1L, "H1", "Starter H1", "ph1", 0), (1L, "H1", "Reliever H1", "ph2", 1),
      (1L, "A1", "Starter A1", "pa1", 0),
      (2L, "A2", "Starter A2", "pa9", 0))
      .toDF("contest_id", "team_id", "player_name", "player_id", "pitch_order")
    val out = PbpPipeline.withPitchers(withTeam, lineups)
      .orderBy("contest_id", "play_id").collect()
    val g1p = out.filter(_.getAs[Long]("contest_id") == 1L)
    // Top-half plays faced H1's starter; the Bottom-half play faced A1's
    assert(g1p(0).getAs[String]("pitcher_name") === "Starter H1")
    assert(g1p(0).getAs[String]("pitcher_id") === "ph1")
    assert(g1p(4).getAs[String]("pitcher_name") === "Starter A1")
    // game 2 uses its own queue
    val g2p = out.filter(_.getAs[Long]("contest_id") == 2L)
    assert(g2p.head.getAs[String]("pitcher_name") === "Starter A2") // game 2 is Bottom-half → away team pitches
  }

  test("event classification end-to-end") {
    assert(g1.map(_.getAs[String]("event_type")).toSeq ===
      Seq("1B", "BB", "HR", "SO", "OUT", "OUT"))
    assert(g2.map(_.getAs[String]("event_type")).toSeq === Seq("E", "SB", "1B"))
    assert(g1(4).getAs[String]("batted_ball_type") === "GB") // grounded into DP
    assert(g1(5).getAs[String]("batted_ball_type") === "FB")
  }

  test("parse's shuffle-skipping fold ≡ the explicit-repartition fold on many games") {
    // 24 games × ~30 plays across many partitions: the parse chain
    // relies on the metadata window's hash(contest_id) exchange to
    // satisfy the fold's clustering (alreadyPartitioned = true); this
    // must equal the safe path that reshuffles explicitly
    val raw = (1 to 24).flatMap { g =>
      (1 to 30).map { i =>
        val txt = (i % 5) match {
          case 0 => s"P$g A$i singled to left"
          case 1 => s"P$g B$i walked"
          case 2 => s"P$g C$i homered, 2 RBI; P$g B${i - 1} scored"
          case 3 => s"P$g D$i struck out swinging"
          case _ => s"P$g E$i flied out to cf"
        }
        (g.toLong, i, (i % 9) + 1, if (i % 2 == 0) txt else null,
          if (i % 2 == 1) txt else null)
      }
    }.toDF("contest_id", "seq", "inning", "away_text", "home_text")
      .repartition(7) // scatter games across partitions first

    val viaSkip = PbpPipeline.parse(raw)
    val pre = PbpPipeline.runs(PbpPipeline.outs(PbpPipeline.flags(PbpPipeline.metadata(raw))))
    val viaShuffle = PbpPipeline.batOrder(PbpPipeline.scores(PbpPipeline.classify(
      PbpPipeline.baseState(pre, alreadyPartitioned = false))))

    val cols = Seq("contest_id", "play_id", "batter_name", "bases_before",
      "bases_after", "outs_before", "runs_on_play", "event_type", "bat_order")
    val a = viaSkip.select(cols.head, cols.tail: _*)
      .orderBy("contest_id", "play_id").collect().toSeq
    val b = viaShuffle.select(cols.head, cols.tail: _*)
      .orderBy("contest_id", "play_id").collect().toSeq
    assert(a === b)
    assert(a.length === 24 * 30)
  }

  test("scraped-scores runs branch: year gate picks score deltas over text") {
    // text says 1 run (homer) + 0 runs; the scraped scores say the
    // second play actually plated TWO (text drift — main.py:57-71's
    // reason for the branch)
    val raw = Seq(
      (9L, 1, 1, "Ace homered", null, 1, 0),
      (9L, 2, 1, "Bell singled", null, 3, 0),
      (9L, 3, 1, null, "Cruz flied out", 3, 0))
      .toDF("contest_id", "seq", "inning", "away_text", "home_text",
        "away_score", "home_score")

    val scoreBranch = PbpPipeline.parse(raw, year = 2026, currentYear = 2026)
      .orderBy("play_id").collect()
    assert(scoreBranch.map(_.getAs[Int]("runs_on_play")).toSeq === Seq(1, 2, 0))
    assert(scoreBranch(1).getAs[Int]("away_score_before") === 1)
    assert(scoreBranch(1).getAs[Int]("away_score_after") === 3)
    assert(scoreBranch(2).getAs[Int]("home_score_after") === 0)
    // rest-of-inning window shared with the text branch
    assert(scoreBranch(0).getAs[Int]("runs_this_inn") === 3)
    assert(scoreBranch(1).getAs[Int]("runs_roi") === 2)

    // same rows, pre-current year → text branch ignores score columns
    val textBranch = PbpPipeline.parse(raw, year = 2024, currentYear = 2026)
      .orderBy("play_id").collect()
    assert(textBranch.map(_.getAs[Int]("runs_on_play")).toSeq === Seq(1, 0, 0))
  }
}
