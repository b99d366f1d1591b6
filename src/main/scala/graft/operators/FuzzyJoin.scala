package graft.operators

import graft.functions.Fuzzy
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Group-blocked fuzzy name resolution — the reference's player/team
 * reconciliation cascade (reference `processors/names/helpers.py:
 * 157-202`, `processors/names/names.py:131-179`,
 * `processors/map_ncaa_to_cube.py:125-175`).
 *
 * This is NOT a cartesian similarity join: candidates are pre-blocked
 * by a grouping key (team, (contest, team), …) whose groups are
 * roster-sized, so each group's cascade runs in memory inside a
 * `cogroup` — the shuffle is one exchange per side on the block key,
 * independent of total data volume.
 *
 * Cascade (mirroring the reference's priority order and thresholds):
 *   1. exact normalized equality
 *   2. best `token_sort_ratio` ≥ 70
 *   3. best `partial_ratio` ≥ 85
 *   4. no match (null id, score 0)
 */
object FuzzyJoin {

  final case class Resolved(
      group: String, name: String,
      matched_name: String, matched_id: String,
      score: Double, method: String)

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll("\\s+", " ").trim

  /** Resolve each (group, name) on the left against the right's
    * (group, cand_name, cand_id) candidates. */
  def resolve(spark: SparkSession, left: DataFrame, right: DataFrame): DataFrame = {
    import spark.implicits._
    val l = left.select(col("group").cast("string"), col("name").cast("string"))
      .as[(String, String)]
    val r = right.select(col("group").cast("string"), col("cand_name").cast("string"),
      col("cand_id").cast("string")).as[(String, String, String)]

    l.groupByKey(_._1).cogroup(r.groupByKey(_._1)) { (g, ls, rs) =>
      val cands = rs.map { case (_, n, id) => (n, id) }.toArray
      val byNorm = cands.groupBy { case (n, _) => norm(n) }
      ls.map { case (_, name) =>
        val nn = norm(name)
        byNorm.get(nn).map(_.head) match {
          case Some((cn, cid)) => Resolved(g, name, cn, cid, 100.0, "exact")
          case None if cands.isEmpty => Resolved(g, name, null, null, 0.0, "none")
          case None =>
            val tsBest = cands.maxBy { case (n, id) => (Fuzzy.tokenSortRatio(nn, norm(n)), id) }
            val tsScore = Fuzzy.tokenSortRatio(nn, norm(tsBest._1))
            if (tsScore >= 70.0)
              Resolved(g, name, tsBest._1, tsBest._2, tsScore, "token_sort")
            else {
              val pBest = cands.maxBy { case (n, id) => (Fuzzy.partialRatio(nn, norm(n)), id) }
              val pScore = Fuzzy.partialRatio(nn, norm(pBest._1))
              if (pScore >= 85.0)
                Resolved(g, name, pBest._1, pBest._2, pScore, "partial")
              else Resolved(g, name, null, null, 0.0, "none")
            }
        }
      }
    }.toDF()
  }
}
