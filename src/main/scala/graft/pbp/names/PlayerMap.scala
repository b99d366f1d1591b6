package graft.pbp.names

import graft.functions.Fuzzy
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Lineup name → player-id resolution (reference
 * `processors/map_ncaa_to_cube.py`): per (team, year), the cascade
 *   1. jersey number column  2. exact full name
 *   3. unique last name      4. unique first-initial + last name
 *   5. fuzzy `token_sort_ratio ≥ 70` (rapidfuzz default_process)
 * plus the jersey-prefix parser for names like "# 12 - Jane Smith".
 *
 * The cube index is roster-sized per (team, year): built once and
 * BROADCAST; resolution is then a map-side pass over lineups — no
 * shuffle of the big side. The reference's own 7 unit tests
 * (`tests/processors/test_map_ncaa_to_cube.py:9-73`) are reproduced
 * verbatim in PlayerMapSpec.
 */
object PlayerMap {

  /** `^ (no.|#|number)? (ddd) (sep) rest $` — jersey-style prefix
    * (map_ncaa_to_cube.py:27-31). */
  private val JerseyLeading =
    "(?i)^\\s*(?:no\\.?|#|number\\s*)?\\s*(\\d{1,3})\\s*([-–—.:]|\\s+)\\s*(.+)$".r

  /** (jersey number, remaining name) (map_ncaa_to_cube.py:34-43). */
  def parseJerseyFromName(raw: String): (Option[Int], String) = {
    val s = Option(raw).getOrElse("").trim
    if (s.isEmpty) return (None, "")
    if (s.matches("\\d{1,3}")) return (Some(s.toInt), "")
    JerseyLeading.findFirstMatchIn(s) match {
      case Some(m) => (Some(m.group(1).toInt), m.group(3).trim)
      case None => (None, s)
    }
  }

  /** Per-(team, year) roster index (map_ncaa_to_cube.py:101-127).
    * `names` keeps insertion order — extractOne tie-breaks on it. */
  final case class CubeIndex(
      byName: Map[String, String],
      names: Vector[String],
      byLast: Map[String, List[String]],
      byInitLast: Map[String, List[String]],
      byNumber: Map[Int, String])

  object CubeIndex {
    val empty: CubeIndex = CubeIndex(Map.empty, Vector.empty, Map.empty, Map.empty, Map.empty)

    /** Build from ordered (player_name, player_id, number) rows. */
    def build(rows: Seq[(String, String, Option[Int])]): CubeIndex = {
      var byName = Map.empty[String, String]
      var names = Vector.empty[String]
      var byLast = Map.empty[String, List[String]]
      var byInit = Map.empty[String, List[String]]
      var byNum = Map.empty[Int, String]
      rows.foreach { case (rawName, pid, num) =>
        val name = Option(rawName).getOrElse("").trim
        if (!byName.contains(name)) names = names :+ name
        byName += name -> pid
        val parts = name.split("\\s+").filter(_.nonEmpty)
        if (parts.nonEmpty) {
          val last = parts.last.toLowerCase
          byLast += last -> (byLast.getOrElse(last, Nil) :+ pid)
          if (parts.length >= 2) {
            val il = s"${parts.head.head.toUpper} ${parts.last}".toLowerCase
            byInit += il -> (byInit.getOrElse(il, Nil) :+ pid)
          }
        }
        num.foreach(n => byNum += n -> pid)
      }
      CubeIndex(byName, names, byLast, byInit, byNum)
    }
  }

  /** The resolution cascade (map_ncaa_to_cube.py:126-175). */
  def resolve(
      playerName: String, number: Option[Int], idx: CubeIndex,
      threshold: Double = 70.0): Option[String] = {
    val name = Option(playerName).getOrElse("").trim

    // 1. jersey number column
    number.flatMap(idx.byNumber.get) match {
      case Some(pid) => return Some(pid)
      case None => ()
    }

    // 2. exact full name
    idx.byName.get(name) match {
      case Some(pid) => return Some(pid)
      case None => ()
    }

    // 3. unique last name
    val parts = name.split("\\s+").filter(_.nonEmpty)
    if (parts.nonEmpty) {
      idx.byLast.getOrElse(parts.last.toLowerCase, Nil) match {
        case pid :: Nil => return Some(pid)
        case _ => ()
      }
    }

    // 4. unique first-initial + last
    if (parts.length >= 2) {
      val il = s"${parts.head.head.toUpper} ${parts.last}".toLowerCase
      idx.byInitLast.getOrElse(il, Nil) match {
        case pid :: Nil => return Some(pid)
        case _ => ()
      }
    }

    // 5. fuzzy token_sort_ratio (default_process) — extractOne
    // semantics: best score, first candidate wins ties, cutoff ≥ threshold
    var bestScore = -1.0
    var bestName: String = null
    idx.names.foreach { cand =>
      val s = Fuzzy.tokenSortRatioProcessed(name, cand)
      if (s > bestScore) { bestScore = s; bestName = cand }
    }
    if (bestScore >= threshold && bestName != null) idx.byName.get(bestName) else None
  }

  /**
   * Spark wrapper: resolve every lineup row against the cube roster
   * index. `cube` (player_name, player_id, number nullable, team_id,
   * year) is dimension-sized: collected, indexed per (team, year) and
   * broadcast; `lineups` (player_name, number nullable, team_id,
   * year) streams map-side.
   */
  def resolveLineups(spark: SparkSession, lineups: DataFrame, cube: DataFrame): DataFrame = {
    val rows = cube
      .select(col("team_id").cast("string"), col("year").cast("int"),
        col("player_name").cast("string"), col("player_id").cast("string"),
        col("number").cast("int"))
      .collect()
    val grouped = rows.groupBy(r => (r.getString(0), r.getInt(1)))
      .map { case (k, rs) =>
        k -> CubeIndex.build(rs.toSeq.map(r =>
          (r.getString(2), r.getString(3), if (r.isNullAt(4)) None else Some(r.getInt(4)))))
      }
    val bc = spark.sparkContext.broadcast(grouped)

    val resolveUdf = udf((team: String, year: Int, name: String, number: java.lang.Integer) => {
      val idx = bc.value.getOrElse((team, year), CubeIndex.empty)
      resolve(name, Option(number).map(_.intValue), idx).orNull
    })
    lineups.withColumn("player_id",
      resolveUdf(col("team_id").cast("string"), col("year").cast("int"),
        col("player_name"), col("number").cast("int")))
  }
}
