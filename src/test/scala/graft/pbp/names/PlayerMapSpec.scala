package graft.pbp.names

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's ONLY unit-test file reproduced verbatim
 * (reference `tests/processors/test_map_ncaa_to_cube.py:9-73`, all 7
 * cases) plus a Spark-wrapper round trip.
 */
class PlayerMapSpec extends AnyFunSuite {
  import PlayerMap._

  // --- the 7 reference cases ------------------------------------------------

  test("parse hash-dash name (ref test_parse_hash_dash_name)") {
    assert(parseJerseyFromName("# 12 - Jane Smith") === ((Some(12), "Jane Smith")))
  }

  test("parse No.-en-dash name (ref test_parse_no_dot_dash)") {
    assert(parseJerseyFromName("No. 7 – Alex Lee") === ((Some(7), "Alex Lee")))
  }

  test("parse digits only (ref test_parse_digits_only)") {
    assert(parseJerseyFromName("42") === ((Some(42), "")))
  }

  test("parse plain name (ref test_parse_plain_name)") {
    assert(parseJerseyFromName("Sam Jones") === ((None, "Sam Jones")))
  }

  test("resolve maps jersey-prefixed name via fuzzy tier when number missing " +
      "(ref test_resolve_maps_jersey_from_name_when_number_missing)") {
    val idx = CubeIndex(
      byName = Map("Jane Smith" -> "pid_js"), names = Vector("Jane Smith"),
      byLast = Map.empty, byInitLast = Map.empty, byNumber = Map(12 -> "pid_js"))
    assert(resolve("# 12 - Jane Smith", None, idx) === Some("pid_js"))
  }

  test("resolve: column number wins over wrong prefix in name " +
      "(ref test_resolve_column_number_wins_over_wrong_prefix_in_name)") {
    val idx = CubeIndex(
      byName = Map("Other Guy" -> "pid5"), names = Vector("Other Guy"),
      byLast = Map.empty, byInitLast = Map.empty,
      byNumber = Map(5 -> "pid5", 12 -> "pid12"))
    assert(resolve("# 12 - Other Guy", Some(5), idx) === Some("pid5"))
  }

  test("resolve: unique last name after number miss " +
      "(ref test_resolve_stripped_name_for_exact_match_after_number_miss)") {
    val idx = CubeIndex(
      byName = Map("Pat Brown" -> "pid_pb"), names = Vector("Pat Brown"),
      byLast = Map("brown" -> List("pid_pb")), byInitLast = Map.empty,
      byNumber = Map(99 -> "pid99"))
    assert(resolve("# 12 - Pat Brown", None, idx) === Some("pid_pb"))
  }

  // --- cascade details beyond the reference tests --------------------------

  test("cascade priority: exact > unique-last > init-last > fuzzy; ambiguity blocks a tier") {
    val idx = CubeIndex.build(Seq(
      ("John Smith", "p1", Some(10)),
      ("Jake Smith", "p2", Some(11)),
      ("Ann Taylor", "p3", None)))
    assert(resolve("John Smith", None, idx) === Some("p1")) // exact
    assert(resolve("Q Taylor", None, idx) === Some("p3")) // unique last (smith ambiguous)
    // last AND init+last ambiguous → falls through to fuzzy, which
    // scores "j smith"/"john smith" at 82.4 (> "jake smith" at 77.8)
    assert(resolve("J Smith", None, idx) === Some("p1"))
    assert(resolve("Jon Smith", None, idx).isDefined) // fuzzy resolves a typo
    assert(resolve("Zz Qq", None, idx) === None) // below cutoff
  }

  test("Spark wrapper broadcasts the index and resolves lineups map-side") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cube = Seq(
      ("t1", 2024, "Jane Smith", "pid_js", Some(12)),
      ("t1", 2024, "Pat Brown", "pid_pb", None),
      ("t2", 2024, "Jane Smith", "pid_other", Some(3)))
      .toDF("team_id", "year", "player_name", "player_id", "number")
    val lineups = Seq(
      ("t1", 2024, "# 12 - Jane Smith", Some(12)),
      ("t1", 2024, "Brown", None),
      ("t1", 2024, "Nobody Here At All", None),
      ("t2", 2024, "Jane Smith", None))
      .toDF("team_id", "year", "player_name", "number")
    val out = PlayerMap.resolveLineups(spark, lineups, cube)
      .select("player_name", "player_id").as[(String, Option[String])].collect().toMap
    assert(out("# 12 - Jane Smith") === Some("pid_js")) // via number column
    assert(out("Brown") === Some("pid_pb")) // unique last name
    assert(out("Jane Smith") === Some("pid_other")) // per-team index isolation
    assert(out("Nobody Here At All") === None)
  }

  test("enrichLineups fills ONLY missing/placeholder ids, keeps valid ones") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cube = Seq(("t1", 2024, "Jane Smith", "pid_js", Option.empty[Int]))
      .toDF("team_id", "year", "player_name", "player_id", "number")
    val lineups = Seq(
      ("t1", 2024, "Jane Smith", Option.empty[Int], "already_set"),
      ("t1", 2024, "Jane Smith", Option.empty[Int], ""),
      ("t1", 2024, "Jane Smith", Option.empty[Int], "nan"),
      ("t1", 2024, "Jane Smith", Option.empty[Int], null))
      .toDF("team_id", "year", "player_name", "number", "player_id")
    val out = PlayerMap.enrichLineups(spark, lineups, cube)
      .select("player_id").as[String].collect().sorted
    assert(out.toSeq === Seq("already_set", "pid_js", "pid_js", "pid_js"))
  }

  test("cogrouped scale path ≡ broadcast path (no driver collect beyond threshold)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val cube = (1 to 40).map(i =>
      (s"t${i % 4}", 2024, s"Player$i Last$i", s"pid_$i",
        if (i % 3 == 0) Some(i) else None))
      .toDF("team_id", "year", "player_name", "player_id", "number")
    val lineups = (1 to 60).map { i =>
      val n = i % 40 + 1
      (s"t${n % 4}", 2024,
        if (i % 5 == 0) s"# $n - Player$n Last$n" else s"Player$n Last$n",
        if (i % 7 == 0) Some(n) else None)
    }.toDF("team_id", "year", "player_name", "number")

    val broadcastOut = PlayerMap.resolveLineups(spark, lineups, cube)
      .select("team_id", "player_name", "number", "player_id")
      .collect().map(_.toSeq).toSet
    // force the scale path with a tiny threshold
    val cogroupOut = PlayerMap.resolveLineups(spark, lineups, cube, maxBroadcastRows = 5)
      .select("team_id", "player_name", "number", "player_id")
      .collect().map(_.toSeq).toSet
    assert(broadcastOut === cogroupOut)
    assert(broadcastOut.nonEmpty)
  }
}
