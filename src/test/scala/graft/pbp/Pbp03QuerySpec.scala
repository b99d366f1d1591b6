package graft.pbp

import graft.SparkTestSession
import graft.queries.QPbp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end invariants of the pbp03 chain (X2 pitcher queue +
  * standardize_names over synthetic raw pbp) at sf0.001 — the pinned
  * sf0.01 VALUES oracle is the driver gate; this spec catches gross
  * regressions locally without re-freezing. */
class Pbp03QuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val summary =
    QPbp.pitcherStandardizeSummary(spark, SparkTestSession.sfDir).collect()

  test("every queue tier appears: starters, relievers, closers, sub-in fallbacks") {
    val names = summary.map(_.getString(0))
    assert(names.exists(_.startsWith("Ace")), "queue index 0 never initialized")
    assert(names.exists(_.startsWith("Mid")) || names.exists(_.startsWith("Low")),
      "queue never advanced on a pitcher sub")
    assert(names.exists(_.startsWith("Rel")),
      "queue exhaustion never fell back to the sub-in name")
    assert(!names.contains(""), "unexpected empty-queue quirk rows")
  }

  test("pitcher ids are always assigned (exhaustion keeps the previous id)") {
    summary.foreach { r =>
      assert(r.getLong(3) === r.getLong(1), s"${r.getString(0)}: with_pid < n")
    }
  }

  test("the standardize cascade matches the noisy lineup forms") {
    val total = summary.map(_.getLong(1)).sum
    val batters = summary.map(_.getLong(4)).sum
    val runners = summary.map(_.getLong(5)).sum
    // batter names resolve via exact / "Last, First" variation /
    // UPPERCASE-lowercase tiers; sub lines carry no batter
    assert(batters > total * 8 / 10, s"batter match rate too low: $batters/$total")
    assert(runners > 0, "runner names never matched")
  }

  test("pitcher assignment is keyed per game (no cross-game leakage)") {
    val parsed = PbpPipeline.parse(QPbp.rawPbpWithSubs(spark, SparkTestSession.sfDir))
      .withColumn("pitch_team_id", when(col("half") === "Top",
        concat(lit("H"), col("contest_id"))).otherwise(concat(lit("A"), col("contest_id"))))
    val assigned = PbpPipeline.withPitchers(parsed,
      QPbp.pitchingLineups(spark, SparkTestSession.sfDir))
    // a pitcher id encodes its (side, contest): it must match the row's
    val leaked = assigned
      .filter(col("pitcher_id").isNotNull &&
        !col("pitcher_id").startsWith(concat(lit("pid-"), col("pitch_team_id"), lit("-"))))
      .count()
    assert(leaked === 0L)
  }
}
