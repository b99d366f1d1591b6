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
 *
 * Tie-breaking matches rapidfuzz `process.extractOne` (reference
 * `names/helpers.py:188-193`): the FIRST candidate in iteration order
 * wins ties; a later candidate must score STRICTLY higher to replace
 * it. Because a shuffled cogroup iterator has no stable order, the
 * candidate order is pinned to ascending `cand_id` (deterministic
 * across runs; the reference's order is its input-file order, which
 * does not survive a shuffle).
 */
object FuzzyJoin {

  final case class Resolved(
      group: String, name: String,
      matched_name: String, matched_id: String,
      score: Double, method: String)

  private[operators] def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll("\\s+", " ").trim

  /** First candidate with the strictly-best score (rapidfuzz
    * extractOne semantics); None when below `threshold`. */
  private def extractOne(
      target: String, cands: Array[(String, String, String)], // (name, norm, id)
      scorer: (String, String) => Double, threshold: Double): Option[(String, String, Double)] = {
    var bestScore = -1.0
    var bestName: String = null
    var bestId: String = null
    var i = 0
    while (i < cands.length) {
      val s = scorer(target, cands(i)._2)
      if (s > bestScore) { bestScore = s; bestName = cands(i)._1; bestId = cands(i)._3 }
      i += 1
    }
    if (bestScore >= threshold) Some((bestName, bestId, bestScore)) else None
  }

  /** Resolve each (group, name) on the left against the right's
    * (group, cand_name, cand_id) candidates. */
  def resolve(spark: SparkSession, left: DataFrame, right: DataFrame): DataFrame = {
    import spark.implicits._
    val l = left.select(col("group").cast("string"), col("name").cast("string"))
      .as[(String, String)]
    val r = right.select(col("group").cast("string"), col("cand_name").cast("string"),
      col("cand_id").cast("string")).as[(String, String, String)]

    l.groupByKey(_._1).cogroup(r.groupByKey(_._1)) { (g, ls, rs) =>
      // pinned candidate order: ascending id (see scaladoc), norms precomputed once
      val cands = rs.map { case (_, n, id) => (n, norm(n), id) }.toArray.sortBy(_._3)
      val byNorm = cands.groupBy(_._2)
      ls.map { case (_, name) =>
        val nn = norm(name)
        byNorm.get(nn).map(_.minBy(_._3)) match {
          case Some((cn, _, cid)) => Resolved(g, name, cn, cid, 100.0, "exact")
          case None if cands.isEmpty => Resolved(g, name, null, null, 0.0, "none")
          case None =>
            extractOne(nn, cands, Fuzzy.tokenSortRatio, 70.0) match {
              case Some((cn, cid, s)) => Resolved(g, name, cn, cid, s, "token_sort")
              case None =>
                extractOne(nn, cands, Fuzzy.partialRatio, 85.0) match {
                  case Some((cn, cid, s)) => Resolved(g, name, cn, cid, s, "partial")
                  case None => Resolved(g, name, null, null, 0.0, "none")
                }
            }
        }
      }
    }.toDF()
  }
}
