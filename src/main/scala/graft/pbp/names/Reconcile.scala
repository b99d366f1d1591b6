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
