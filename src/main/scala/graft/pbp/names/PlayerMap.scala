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
   * year) is usually dimension-sized: probed with `limit(max+1)`, and
   * when it fits, collected, indexed per (team, year) and broadcast so
   * `lineups` streams map-side with ZERO shuffle. Beyond the
   * threshold it falls back to [[resolveLineupsCogrouped]] — no
   * unconditional `collect()` of an input table (the round-2 driver-OOM
   * scale risk).
   *
   * Candidate order is pinned to ascending player_id in BOTH paths so
   * fuzzy tie-breaks are deterministic regardless of physical layout.
   */
  def resolveLineups(spark: SparkSession, lineups: DataFrame, cube: DataFrame,
      maxBroadcastRows: Long = 2000000L): DataFrame = {
    val cubeSlim = cube
      .select(col("team_id").cast("string"), col("year").cast("int"),
        col("player_name").cast("string"), col("player_id").cast("string"),
        col("number").cast("int"))
    val fits = cubeSlim.limit(math.min(maxBroadcastRows + 1, Int.MaxValue.toLong).toInt).count() <= maxBroadcastRows
    if (!fits) return resolveLineupsCogrouped(spark, lineups, cube)

    val rows = cubeSlim.collect()
    val grouped = rows.groupBy(r => (r.getString(0), r.getInt(1)))
      .map { case (k, rs) =>
        k -> CubeIndex.build(rs.toSeq.sortBy(r => Option(r.getString(3)).getOrElse(""))
          .map(r =>
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

  /** Fill-only-missing driver semantics (reference
    * `map_ncaa_to_cube.py:180-234` enrich_lineups): rows that already
    * carry a valid player_id keep it; only blank/"nan"/"None" ids go
    * through the resolution cascade. */
  def enrichLineups(spark: SparkSession, lineups: DataFrame, cube: DataFrame,
      maxBroadcastRows: Long = 2000000L): DataFrame = {
    val hasExisting = lineups.columns.contains("player_id")
    val withExisting =
      if (hasExisting) lineups.withColumnRenamed("player_id", "__pid_existing")
      else lineups.withColumn("__pid_existing", lit(null).cast("string"))
    val valid = trim(coalesce(col("__pid_existing"), lit(""))) =!= "" &&
      !col("__pid_existing").isin("nan", "None")
    resolveLineups(spark, withExisting, cube, maxBroadcastRows)
      .withColumn("player_id", when(valid, col("__pid_existing")).otherwise(col("player_id")))
      .drop("__pid_existing")
  }

  /**
   * Scale path (the [[graft.operators.FuzzyJoin]] cogroup shape): the
   * DISTINCT probes (team, year, name, number) cogroup with the cube on
   * the (team, year) block key — each group is roster-sized, the
   * per-group index never leaves its task — then the resolutions join
   * back onto the full lineups (null-safe on number). Two shuffles of
   * dimension-sized data, zero driver materialization.
   */
  def resolveLineupsCogrouped(
      spark: SparkSession, lineups: DataFrame, cube: DataFrame): DataFrame = {
    import spark.implicits._
    val probes = lineups
      .select(col("team_id").cast("string"), col("year").cast("int"),
        col("player_name").cast("string"), col("number").cast("int"))
      .distinct()
      .as[(String, Int, String, Option[Int])]
    val cands = cube
      .select(col("team_id").cast("string"), col("year").cast("int"),
        col("player_name").cast("string"), col("player_id").cast("string"),
        col("number").cast("int"))
      .as[(String, Int, String, String, Option[Int])]

    val resolved = probes.groupByKey(p => (p._1, p._2))
      .cogroup(cands.groupByKey(c => (c._1, c._2))) { case ((team, year), ps, cs) =>
        val idx = CubeIndex.build(
          cs.toSeq.sortBy(c => Option(c._4).getOrElse("")).map(c => (c._3, c._4, c._5)))
        ps.map(p => (team, year, p._3, p._4, resolve(p._3, p._4, idx).orNull))
      }
      .toDF("__rt", "__ry", "__rn", "__rnum", "player_id")

    lineups.drop("player_id")
      .join(resolved,
        col("team_id").cast("string") === col("__rt") &&
          col("year").cast("int") === col("__ry") &&
          (col("player_name").cast("string") <=> col("__rn")) &&
          (col("number").cast("int") <=> col("__rnum")), "left")
      .drop("__rt", "__ry", "__rn", "__rnum")
  }
}
