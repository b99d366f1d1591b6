package graft.io

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PublishSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(root: java.nio.file.Path, rel: String, lines: String*): Unit = {
    val p = root.resolve(rel)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  test("glob matching follows fnmatch: * crosses separators, first entry wins") {
    val config = Seq(
      Publish.Mapping("war/*_batting_war_*.csv", "batting"),
      Publish.Mapping("war/*.csv", "war_misc"))
    assert(Publish.matchTable("war/d1_batting_war_2024.csv", config) === Some("batting"))
    assert(Publish.matchTable("war/other.csv", config) === Some("war_misc"))
    assert(Publish.matchTable("lineups/x.csv", config) === None)
    // fnmatch's * is not globstar-limited: a/*/c matches nested paths
    assert(Publish.matchTable("war/deep/nested_batting_war_x.csv", config) === Some("batting"))
  }

  test("glob character classes follow fnmatch: [!seq] negates, stray [ is literal") {
    val config = Seq(Publish.Mapping("war/[!d]*.csv", "not_d"))
    assert(Publish.matchTable("war/x1_file.csv", config) === Some("not_d"))
    assert(Publish.matchTable("war/d1_file.csv", config) === None)
    assert(Publish.matchTable("war/!bang.csv", config) === Some("not_d"))
    val cls = Seq(Publish.Mapping("war/d[123]_*.csv", "div"))
    assert(Publish.matchTable("war/d2_x.csv", cls) === Some("div"))
    assert(Publish.matchTable("war/d4_x.csv", cls) === None)
    // unterminated class: literal bracket, no PatternSyntaxException
    val stray = Seq(Publish.Mapping("war/br[oken*.csv", "broken"))
    assert(Publish.matchTable("war/br[oken_x.csv", stray) === Some("broken"))
    assert(Publish.matchTable("war/broken_x.csv", stray) === None)
  }

  test("year suffix extraction requires a trailing _YYYY stem") {
    assert(Publish.extractYear("d1_pbp_2024.csv") === Some(2024))
    assert(Publish.extractYear("d1_pbp_2024x.csv") === None)
    assert(Publish.extractYear("pf.csv") === None)
    assert(Publish.extractYear("war_202.csv") === None)
  }

  test("collectFiles: sorted order, excluded dirs, year-mismatch skip") {
    val root = java.nio.file.Files.createTempDirectory("graft_pubspec")
    write(root, "war/z_batting_war_2024.csv", "a", "1")
    write(root, "war/a_batting_war_2024.csv", "a", "1")
    write(root, "war/a_batting_war_2023.csv", "a", "1")
    write(root, "war/no_year.csv", "a", "1")
    write(root, "_tmp/a_batting_war_2024.csv", "a", "1")
    val config = Seq(Publish.Mapping("war/*.csv", "batting"))

    val all = Publish.collectFiles(root.toString, None, config)("batting")
    assert(all.map(_.split('/').last) ===
      Seq("a_batting_war_2023.csv", "a_batting_war_2024.csv", "no_year.csv", "z_batting_war_2024.csv"))

    val y24 = Publish.collectFiles(root.toString, Some(2024), config)("batting")
    // unyeared files always load; mismatched years are skipped
    assert(y24.map(_.split('/').last) ===
      Seq("a_batting_war_2024.csv", "no_year.csv", "z_batting_war_2024.csv"))
  }

  test("renameDivisionPrefixes: d{N}_* -> ncaa_{N}_*, dry-run untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_pubspec_ren")
    write(root, "war/d1_batting_war_2024.csv", "a", "1")
    write(root, "war/d2_pitching.csv", "a", "1")
    write(root, "war/d4_other.csv", "a", "1") // d4: not a division prefix
    write(root, "notes.csv", "a", "1")
    val dry = Publish.renameDivisionPrefixes(root.toString, dryRun = true)
    assert(dry === Seq(
      "war/d1_batting_war_2024.csv" -> "war/ncaa_1_batting_war_2024.csv",
      "war/d2_pitching.csv" -> "war/ncaa_2_pitching.csv"))
    assert(java.nio.file.Files.exists(root.resolve("war/d1_batting_war_2024.csv")))
    val real = Publish.renameDivisionPrefixes(root.toString)
    assert(real === dry)
    assert(java.nio.file.Files.exists(root.resolve("war/ncaa_1_batting_war_2024.csv")))
    assert(!java.nio.file.Files.exists(root.resolve("war/d1_batting_war_2024.csv")))
    assert(java.nio.file.Files.exists(root.resolve("war/d4_other.csv")))
  }

  test("publish: keep-first dedup across file order, year refresh replaces one slice") {
    val root = java.nio.file.Files.createTempDirectory("graft_pubspec2")
    val url = s"jdbc:derby:${root.resolve("db")};create=true"
    val config = Seq(Publish.Mapping("war/*_batting_war_*.csv", "batting"))
    val hdr = "player_id,year,division,v"
    write(root, "war/a_batting_war_2023.csv", hdr, "p1,2023,d1,10", "p2,2023,d1,20")
    write(root, "war/a_batting_war_2024.csv", hdr, "p1,2024,d1,30")
    // later-sorted duplicate of (p1,2023,d1) must lose
    write(root, "war/b_batting_war_2023.csv", hdr, "p1,2023,d1,999")

    val r1 = Publish.publish(spark, root.toString, config, url)
    assert(r1.map(r => (r.table, r.rowsLoaded)) === Seq(("batting", 3L)))
    val got1 = spark.read.format("jdbc").option("url", url).option("dbtable", "batting")
      .load().collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSet
    assert(got1 === Set(("p1", 2023, 10), ("p2", 2023, 20), ("p1", 2024, 30)))

    // refresh 2024 only: 2023 rows must survive untouched
    val root2 = java.nio.file.Files.createTempDirectory("graft_pubspec3")
    write(root2, "war/a_batting_war_2024.csv", hdr, "p1,2024,d1,31", "p9,2024,d1,40")
    val r2 = Publish.publish(spark, root2.toString, config, url, year = Some(2024))
    assert(r2.map(r => (r.table, r.rowsLoaded)) === Seq(("batting", 4L)))
    val got2 = spark.read.format("jdbc").option("url", url).option("dbtable", "batting")
      .load().collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSet
    assert(got2 === Set(("p1", 2023, 10), ("p2", 2023, 20), ("p1", 2024, 31), ("p9", 2024, 40)))
  }

  test("year refresh without a key registry keeps every slice row (no arbitrary dedup)") {
    val root = java.nio.file.Files.createTempDirectory("graft_pubspec4")
    val url = s"jdbc:derby:${root.resolve("db")};create=true"
    // 'mystery' has no defaultDedupKeys entry
    val config = Seq(Publish.Mapping("misc/mystery_*.csv", "mystery"))
    val hdr = "id,year,v"
    write(root, "misc/mystery_2023.csv", hdr, "a,2023,1", "b,2023,2", "c,2023,3")
    Publish.publish(spark, root.toString, config, url)
    val root2 = java.nio.file.Files.createTempDirectory("graft_pubspec5")
    write(root2, "misc/mystery_2023.csv", hdr, "d,2023,4", "e,2023,5")
    val r = Publish.publish(spark, root2.toString, config, url, year = Some(2023))
    // the refreshed slice must carry BOTH rows — a dedup keyed on the
    // slice column alone would collapse it to one
    assert(r.map(x => (x.table, x.rowsLoaded)) === Seq(("mystery", 2L)))
  }

  test("year refresh of a table keyed WITHOUT the slice column: existing rows win") {
    val root = java.nio.file.Files.createTempDirectory("graft_pubspec6")
    val url = s"jdbc:derby:${root.resolve("db")};create=true"
    // schedules is keyed (contest_id) only — reference MIN(rowid)
    // semantics keep the first-loaded row across slices
    val config = Seq(Publish.Mapping("sched/*_schedules_*.csv", "schedules"))
    val hdr = "contest_id,year,opp"
    write(root, "sched/d1_schedules_2023.csv", hdr, "g1,2023,X", "g2,2023,Y")
    Publish.publish(spark, root.toString, config, url)
    val root2 = java.nio.file.Files.createTempDirectory("graft_pubspec7")
    // g2 re-appears labeled 2024: the existing 2023 row must win
    write(root2, "sched/d1_schedules_2024.csv", hdr, "g2,2024,Z", "g3,2024,W")
    Publish.publish(spark, root2.toString, config, url, year = Some(2024))
    val got = spark.read.format("jdbc").option("url", url).option("dbtable", "schedules")
      .load().collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(("g1", 2023, "X"), ("g2", 2023, "Y"), ("g3", 2024, "W")))
  }
}
