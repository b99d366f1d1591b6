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
