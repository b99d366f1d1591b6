package graft.pbp.names

import graft.functions.Fuzzy
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The standardize_names stage for batter/runner identities (reference
 * `processors/pbp_parser/names/names.py:100-293`): every parsed name
 * column (batter, r1–r3, player_of_interest) is resolved against the
 * game's own batting lineup first — exact lowercase, normalized,
 * generated variations, then fuzzy `token_sort_ratio ≥ 70` over the
 * game lookup's variation keys — falling back to the TEAM-wide
 * [[NameVariants.matchName]] cascade, else the original name with a
 * null id.
 *
 * Spark shape: lineups are game-keyed dims, so per-game matching runs
 * inside ONE cogroup on contest_id (the [[graft.pbp.PbpPipeline
 * .withPitchers]] pattern) — lookups never leave their task; the
 * team-wide fallback lookup is roster-scale and BROADCAST. The
 * matched columns join back on (contest, play) — two dim-sized
 * shuffles total, independent of pbp volume.
 */
object StandardizeNames {

  /** Per-game variation lookup (names.py:100-128): key → (canonical
    * lineup name, player id); first writer wins, insertion-ordered
    * (the fuzzy tier's candidate order). */
  def buildGameLookup(rows: Seq[(String, String)])
      : scala.collection.mutable.LinkedHashMap[String, (String, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
    rows.foreach { case (name, pid) =>
      if (name != null && name.trim.nonEmpty) {
        val key = name.trim.toLowerCase
        if (!m.contains(key)) m += key -> ((name, pid))
        val (first, last, num) = NameVariants.parseNameParts(name)
        NameVariants.generateNameVariations(first, last, num).foreach { v =>
          val vk = v.trim.toLowerCase
          if (vk.nonEmpty && !m.contains(vk)) m += vk -> ((name, pid))
        }
      }
    }
    m
  }

  /** The in-game cascade (names.py:131-179). Returns
    * (standardized name, matched id or null). */
  def matchPlayerInGame(
      name: String, team: String,
      gameLookup: scala.collection.mutable.LinkedHashMap[String, (String, String)],
      fullLookup: Map[String, Map[String, (String, String)]],
      fullOrdered: Map[String, Vector[String]],
      threshold: Double = 70.0): (String, String) = {
    if (name == null || name.trim.isEmpty) return ("", null)
    val original = name.trim
    if (team == null || team.isEmpty) return (original, null)

    val nameLower = original.toLowerCase
    gameLookup.get(nameLower).foreach(r => return r)
    gameLookup.get(NameVariants.normalizeName(name)).foreach(r => return r)

    val (first, last, number) = NameVariants.parseNameParts(name)
    NameVariants.generateNameVariations(first, last, number).foreach { v =>
      gameLookup.get(v.trim.toLowerCase).foreach(r => return r)
    }

    if (gameLookup.nonEmpty) {
      var best = -1.0
      var bestKey: String = null
      gameLookup.keysIterator.foreach { k =>
        val s = Fuzzy.tokenSortRatio(nameLower, k)
        if (s > best) { best = s; bestKey = k }
      }
      if (best >= threshold) return gameLookup(bestKey)
    }

    NameVariants.matchName(name, team, fullLookup, fullOrdered, threshold) match {
      case Some((canonical, pid)) => (canonical, pid)
      case None => (original, null)
    }
  }

  private val nameCols = Seq(
    ("batter_name", "batter_name", "batter_id"),
    ("r1_name", "r1_name", "r1_id"),
    ("r2_name", "r2_name", "r2_id"),
    ("r3_name", "r3_name", "r3_id"),
    ("player_of_interest", "player_name", "player_id"))

  /**
   * Standardize the five name columns of a parsed pbp frame against
   * batting lineups. `parsed` needs (contest_id, play_id,
   * bat_team_id, batter_name, r1_name, r2_name, r3_name,
   * player_of_interest); `battingLineups` (contest_id, team_id,
   * player_name, player_id).
   */
  def apply(spark: SparkSession, parsed: DataFrame, battingLineups: DataFrame,
      threshold: Double = 70.0, maxBroadcastRows: Long = 2000000L): DataFrame = {
    import spark.implicits._

    // team-wide fallback lookup: roster-scale dim, broadcast — but
    // NEVER an unconditional collect of an input table: probe with
    // limit(max+1) first, and beyond the threshold degrade to
    // game-lookup-only matching (the cross-game fallback tier is an
    // enrichment, not a correctness requirement) instead of OOMing
    // the driver.
    val rosterDim = battingLineups
      .select(col("team_id").cast("string"), col("player_name").cast("string"),
        col("player_id").cast("string"))
      .distinct()
    val fits = rosterDim.limit(math.min(maxBroadcastRows + 1, Int.MaxValue.toLong).toInt).count() <= maxBroadcastRows
    if (!fits) System.err.println(
      s"[graft-metric] standardize_names_fallback_disabled roster > $maxBroadcastRows rows; " +
        "cross-game fallback tier skipped (game-lookup matching only)")
    val rosterRows =
      if (!fits) Seq.empty
      else rosterDim.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), Option.empty[String]))
        .sortBy(r => (r._1, r._3, r._2)) // deterministic insertion order
        .toSeq
    val fullLookup = NameVariants.buildNameLookup(rosterRows)
    val fullOrdered = NameVariants.orderedKeys(rosterRows)
    val bcLookup = spark.sparkContext.broadcast((fullLookup, fullOrdered))

    val plays = parsed.select(
      col("contest_id").cast("long"), col("play_id").cast("int"),
      col("bat_team_id").cast("string"),
      col("batter_name").cast("string"), col("r1_name").cast("string"),
      col("r2_name").cast("string"), col("r3_name").cast("string"),
      col("player_of_interest").cast("string"))
      .as[(Long, Int, String, String, String, String, String, String)]
    val lineups = battingLineups.select(
      col("contest_id").cast("long"), col("team_id").cast("string"),
      col("player_name").cast("string"), col("player_id").cast("string"))
      .as[(Long, String, String, String)]

    val matched = plays.groupByKey(_._1).cogroup(lineups.groupByKey(_._1)) {
      (contestId, ps, ls) =>
        val (full, ordered) = bcLookup.value
        // per-team game lookup, lineup rows in deterministic order
        val byTeam = ls.toSeq.sortBy(r => (r._2, r._4, r._3)).groupBy(_._2)
          .map { case (team, rows) =>
            team -> buildGameLookup(rows.map(r => (r._3, r._4)))
          }
        val emptyLookup = scala.collection.mutable.LinkedHashMap
          .empty[String, (String, String)]
        ps.map { p =>
          val team = p._3
          val gl = byTeam.getOrElse(team, emptyLookup)
          def m(n: String) = matchPlayerInGame(n, team, gl, full, ordered, threshold)
          val (bn, bi) = m(p._4)
          val (r1n, r1i) = m(p._5)
          val (r2n, r2i) = m(p._6)
          val (r3n, r3i) = m(p._7)
          val (pn, pi) = m(p._8)
          (contestId, p._2, bn, bi, r1n, r1i, r2n, r2i, r3n, r3i, pn, pi)
        }
    }.toDF("contest_id", "play_id", "batter_name", "batter_id",
      "r1_name", "r1_id", "r2_name", "r2_id", "r3_name", "r3_id",
      "player_name", "player_id")

    parsed
      .drop("batter_name", "r1_name", "r2_name", "r3_name",
        "player_of_interest", "batter_id", "r1_id", "r2_id", "r3_id",
        "player_name", "player_id")
      .join(matched, Seq("contest_id", "play_id"), "left")
  }
}
