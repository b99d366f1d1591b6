package graft.pbp.names

import graft.functions.Fuzzy
import graft.pbp.Positions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Player-identity reconciliation (reference
 * `processors/reconcile_players.py`): roster-name cleaning and the
 * team-blocked headshot matching cascade — exact normalized name,
 * jersey-number disambiguation on collisions, then `WRatio ≥ 90`
 * fuzzy fallback, keep-first per player.
 *
 * Like the fuzzy join (J7), matching is blocked per team: candidate
 * sets are roster-sized and processed in memory inside a cogroup —
 * one shuffle per side on the team key, no cross-team pairs.
 */
object Reconcile {

  private def s(x: String): String = if (x == null) "" else x

  private def nfkc(x: String): String =
    java.text.Normalizer.normalize(s(x), java.text.Normalizer.Form.NFKC)

  /** Jersey-prefix strip + titlecase (reconcile_players.py:26-33). */
  def cleanName(name: String): String = {
    var t = nfkc(name)
    t = t.replaceAll("(?i)^\\s*(?:no\\.?|number)?\\s*\\d{1,3}\\s*[-–—.:]\\s*", "")
    t = t.replaceAll("^\\s*\\d{1,3}\\s+", "")
    t = t.replaceAll("^\\s*\\d{1,3}(?=[A-Za-z])", "")
    t = t.replaceAll("\\s+", " ").trim
    // Python str.title(): capitalize after any non-letter
    val sb = new StringBuilder
    var prevLetter = false
    t.foreach { c =>
      if (Character.isLetter(c)) {
        sb.append(if (prevLetter) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevLetter = true
      } else { sb.append(c); prevLetter = false }
    }
    sb.toString
  }

  /** Strip trailing "previous school:" clauses (reconcile_players
    * .py:35-49). */
  def cleanHighSchool(x: String): String = {
    var t = nfkc(s(x).trim)
    if (t.isEmpty) return ""
    t = t.split("(?i)\\b(?:previous|prev|last)\\s*school\\s*:?|\\b(?:previous|prev)\\s*sch(?:ool)?\\s*:?|\\blast\\s*sch(?:ool)?\\s*:?", 2)(0)
    t.replaceAll("\\s+", " ").replaceAll("^[\\s\\t\\r\\n\\-–—:;|,]+|[\\s\\t\\r\\n\\-–—:;|,]+$", "")
  }

  /** Reconcile-side name normalizer: leading digits stripped, then
    * word-chars-only lowercase (reconcile_players.py:52-57). */
  def normalizeRosterName(name: String): String = {
    var t = s(name)
    t = t.replaceAll("^\\s*\\d{1,3}\\s*", "")
    t = java.util.regex.Pattern
      .compile("[^\\w\\s]", java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
      .matcher(t).replaceAll("")
    t.replaceAll("\\s+", " ").trim.toLowerCase
  }

  /** One roster player visible to the matcher. */
  final case class RosterRow(playerId: String, nameNorm: String, number: String)
  /** One scraped headshot row. */
  final case class HeadshotRow(nameNorm: String, number: String, imgUrl: String)
  final case class Matched(playerId: String, imgUrl: String)

  /**
   * The per-team matching cascade (reconcile_players.py:240-270):
   * exact normalized-name equality (number disambiguates multiple
   * hits), else WRatio ≥ 90 fuzzy best (first roster occurrence wins
   * ties), keep-first per player id.
   */
  def matchTeam(roster: Seq[RosterRow], shots: Seq[HeadshotRow]): Seq[Matched] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Matched]
    val seen = scala.collection.mutable.Set.empty[String]
    shots.foreach { tr =>
      if (tr.nameNorm.nonEmpty && tr.imgUrl.nonEmpty) {
        var direct = roster.filter(_.nameNorm == tr.nameNorm)
        if (tr.number.nonEmpty && direct.length > 1)
          direct = direct.filter(_.number == tr.number)
        if (direct.isEmpty) {
          var best = -1.0; var bestRows: Seq[RosterRow] = Seq.empty
          roster.foreach { r =>
            val sc = Fuzzy.wRatio(tr.nameNorm, r.nameNorm)
            if (sc > best) { best = sc; bestRows = roster.filter(_.nameNorm == r.nameNorm) }
          }
          if (best >= 90) {
            direct = bestRows
            if (tr.number.nonEmpty && direct.length > 1)
              direct = direct.filter(_.number == tr.number)
          }
        }
        direct.headOption.foreach { r =>
          if (!seen.contains(r.playerId)) {
            seen += r.playerId
            out += Matched(r.playerId, tr.imgUrl)
          }
        }
      }
    }
    out.toSeq
  }

  /** Spark wrapper: cogroup rosters and headshots on the team key.
    * rosters: (team, player_id, player_name_norm, number);
    * headshots: (team, tr_name_norm, number, img_url). */
  def buildHeadshotMatches(
      spark: SparkSession, rosters: DataFrame, headshots: DataFrame): DataFrame = {
    import spark.implicits._
    val r = rosters.select(col("team").cast("string"), col("player_id").cast("string"),
      col("player_name_norm").cast("string"), coalesce(col("number").cast("string"), lit("")))
      .as[(String, String, String, String)]
    val h = headshots.select(col("team").cast("string"), col("tr_name_norm").cast("string"),
      coalesce(col("number").cast("string"), lit("")), col("img_url").cast("string"))
      .filter(col("img_url") =!= "")
      .as[(String, String, String, String)]

    r.groupByKey(_._1).cogroup(h.groupByKey(_._1)) { (team, rs, hs) =>
      val roster = rs.map(x => RosterRow(x._2, x._3, x._4.trim)).toSeq
      val shots = hs.map(x => HeadshotRow(x._2.trim, x._3.trim, x._4.trim)).toSeq
      matchTeam(roster, shots).iterator.map(m => (team, m.playerId, m.imgUrl))
    }.toDF("team", "player_id", "img_url")
  }

  // -------------------------------------------------------------------------
  // Multi-year cube assignment (reconcile_players.py:295-513)
  // -------------------------------------------------------------------------

  final case class CubeMatch(
      player_id: String, img_url: String, b_t: String, high_school: String,
      year: Int, match_type: String)

  /**
   * The multi-year headshot→cube-player cascade
   * (reconcile_players.py:420-470): per headshot row, (1) DIRECT match
   * on (team, year, normalized name); (2) FUZZY `WRatio ≥ 90`
   * extractOne among the same team-year's players; (3) FUZZY_FALLBACK
   * among the team's players across ALL years. Blocked per team via
   * cogroup — each group holds one program's multi-year roster
   * (hundreds of rows), so the cascade runs in memory; the shuffle is
   * one exchange per side on team_id regardless of total volume.
   *
   * Candidate order is pinned to ascending (year, player_id)
   * (the reference's order is its concat-of-CSV-files order, which
   * does not survive a shuffle); extractOne keeps the FIRST
   * strictly-best candidate, matching rapidfuzz.
   *
   * @param stats     (team_id, year, name_norm, player_id) deduped
   * @param headshots (team_id, year, name_norm, img_url, b_t,
   *                  high_school)
   */
  def matchHeadshotsMultiYear(
      spark: SparkSession, stats: DataFrame, headshots: DataFrame): DataFrame = {
    import spark.implicits._
    val st = stats.select(col("team_id").cast("long"), col("year").cast("int"),
      col("name_norm").cast("string"), col("player_id").cast("string"))
      .as[(Long, Int, String, String)]
    val hs = headshots.select(col("team_id").cast("long"), col("year").cast("int"),
      col("name_norm").cast("string"),
      coalesce(col("img_url").cast("string"), lit("")),
      coalesce(col("b_t").cast("string"), lit("")),
      coalesce(col("high_school").cast("string"), lit("")))
      .as[(Long, Int, String, String, String, String)]

    st.groupByKey(_._1).cogroup(hs.groupByKey(_._1)) { (_, ss, hh) =>
      // (year, player_id)-ordered candidates; norms precomputed
      val all = ss.toArray.sortBy(r => (r._2, r._4)) // (team, year, norm, pid)
      val byYearName = all.groupBy(r => (r._2, r._3))
      val byYear = all.groupBy(_._2)

      def extractOne(target: String, cands: Array[(Long, Int, String, String)])
          : Option[(Long, Int, String, String)] = {
        var best = -1.0
        var bestRow: (Long, Int, String, String) = null
        var i = 0
        while (i < cands.length) {
          val sc = Fuzzy.wRatio(target, cands(i)._3)
          if (sc > best) { best = sc; bestRow = cands(i) }
          i += 1
        }
        if (best >= 90.0) Some(bestRow) else None
      }

      hh.flatMap { h =>
        val (_, year, nameNorm, imgUrl, bt, highSchool) = h
        def mk(pid: String, tpe: String) =
          CubeMatch(pid, imgUrl, bt, highSchool, year, tpe)
        byYearName.get((year, nameNorm)).map(_.head) match {
          case Some(r) => Some(mk(r._4, "direct"))
          case None =>
            byYear.get(year).flatMap(extractOne(nameNorm, _)) match {
              case Some(r) => Some(mk(r._4, "fuzzy"))
              case None =>
                extractOne(nameNorm, all).map(r => mk(r._4, "fuzzy_fallback"))
            }
        }
      }
    }.toDF()
  }

  /** Keep the LATEST year's match per player
    * (reconcile_players.py:476-478's sort-desc + drop_duplicates),
    * tie-broken deterministically. */
  def latestMatchPerPlayer(matches: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("player_id")
      .orderBy(col("year").desc, col("match_type"), col("img_url"))
    matches.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * Apply matches onto cube_player_info
   * (reconcile_players.py:484-505): img_url OVERRIDES (falling back to
   * the existing value), bats/throws/high_school fill ONLY when blank;
   * incoming b_t re-normalized and split.
   */
  def updateCubeInfo(cubeInfo: DataFrame, matches: DataFrame): DataFrame = {
    val normBt = udf((x: String) => Positions.normalizeBT(x))
    val cleanHs = udf((x: String) => cleanHighSchool(x))
    val m = latestMatchPerPlayer(matches).select(
      col("player_id"),
      col("img_url").as("__img_in"),
      normBt(col("b_t")).as("__bt_in"),
      cleanHs(col("high_school")).as("__hs_in"))
    def blank(c: String) = trim(coalesce(col(c), lit(""))) === ""
    cubeInfo.join(broadcast(m), Seq("player_id"), "left")
      .withColumn("img_url",
        coalesce(when(col("__img_in") =!= "", col("__img_in")), col("img_url")))
      .withColumn("bats",
        when(blank("bats"), coalesce(element_at(split(col("__bt_in"), "/"), 1), lit("")))
          .otherwise(col("bats")))
      .withColumn("throws",
        when(blank("throws"), coalesce(get(split(col("__bt_in"), "/"), lit(1)), lit("")))
          .otherwise(col("throws")))
      .withColumn("high_school",
        when(blank("high_school"), coalesce(col("__hs_in"), lit("")))
          .otherwise(col("high_school")))
      .drop("__img_in", "__bt_in", "__hs_in")
  }

  /**
   * cube_player_info upsert from season stats
   * (reconcile_players.py:515-512 add_missing_players_to_cube_info):
   * stub rows (player_id + player_name, everything else null) for ids
   * present in stats but absent from the info table; blank
   * player_name filled from the stats name (smallest non-empty name
   * wins — the reference's sort + keep-first); dedup keep-first on
   * player_id. One anti-join + one union, no driver materialization.
   */
  def addMissingPlayers(cubeInfo: DataFrame, stats: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("player_id")
      .orderBy(when(trim(coalesce(col("player_name"), lit(""))) === "", 1).otherwise(0),
        col("player_name"))
    val players = stats
      .select(trim(col("player_id").cast("string")).as("player_id"),
        coalesce(col("player_name").cast("string"), lit("")).as("player_name"))
      .filter(col("player_id").isNotNull && col("player_id") =!= "")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val nameMap = players.withColumnRenamed("player_name", "__name_in")
    val filled = cubeInfo
      .join(broadcast(nameMap), Seq("player_id"), "left")
      .withColumn("player_name",
        when(trim(coalesce(col("player_name"), lit(""))) === "",
          coalesce(col("__name_in"), col("player_name")))
          .otherwise(col("player_name")))
      .drop("__name_in")

    val stubs = players.join(cubeInfo.select("player_id"), Seq("player_id"), "left_anti")
    val stubsAligned = filled.columns.foldLeft(stubs) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(filled.schema(c).dataType))
    }.select(filled.columns.map(col).toIndexedSeq: _*)

    filled.unionByName(stubsAligned)
      .dropDuplicates("player_id")
  }

  /** Fill-if-empty enrichment + normalizers (reconcile_players
    * .py:279-293): roster fields fall back to headshot-sourced values
    * only when blank; bats/throws and positions standardized. */
  def enrichWithHeadshots(rosters: DataFrame, hs: DataFrame,
      fields: Seq[String] = Seq("img_url", "b_t", "pos")): DataFrame = {
    val normBt = udf((x: String) => Positions.normalizeBT(x))
    val stdPos = udf((x: String) => Positions.standardizePos(x))
    val hsRenamed = fields.foldLeft(hs) { (d, f) =>
      if (d.columns.contains(f)) d.withColumnRenamed(f, s"${f}_hs") else d
    }
    val merged = rosters.join(hsRenamed, Seq("player_id"), "left")
    val filled = fields.foldLeft(merged) { (d, f) =>
      if (d.columns.contains(s"${f}_hs"))
        d.withColumn(f,
          when(trim(coalesce(col(f), lit(""))) === "", coalesce(col(s"${f}_hs"), lit("")))
            .otherwise(col(f)))
          .drop(s"${f}_hs")
      else d
    }
    filled
      .withColumn("b_t", normBt(col("b_t")))
      .withColumn("pos", stdPos(col("pos")))
  }
}
