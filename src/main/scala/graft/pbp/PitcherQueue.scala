package graft.pbp

import scala.collection.mutable

/**
 * X2: the pitcher queue machine (reference
 * `processors/pbp_parser/names/names.py:40-97`, `fill_pitcher_names`)
 * as a pure per-game fold.
 *
 * Per (game, pitching-team): an index into the ordered pitching
 * lineup queue, advanced on every pitcher substitution (`sub_pos ==
 * "p"`); the first play a team pitches initializes index 0. When the
 * queue is exhausted, the reference falls back to the sub-in name
 * (keeping the previous pitcher id) — preserved here, including the
 * quirk that a non-sub first appearance past an empty queue yields
 * "" (names.py:84-89).
 *
 * Null/missing pitch-team rows resolve against a (game, None) key
 * that is never populated → empty name, null id (names.py:63-66).
 */
object PitcherQueue {

  final case class PlayRow(pitchTeamId: Option[String], isPitcherSub: Boolean, subIn: String)
  final case class Assigned(pitcherName: String, pitcherId: Option[String])

  /**
   * @param plays   one game's plays in order
   * @param queues  per pitching team: ordered (player_name, player_id)
   */
  def runGame(
      plays: Seq[PlayRow],
      queues: Map[String, Seq[(String, String)]]): Seq[Assigned] = {

    val pitcherIndex = mutable.Map.empty[String, Int]
    val currentName = mutable.Map.empty[String, String]
    val currentId = mutable.Map.empty[String, Option[String]]

    plays.map { row =>
      row.pitchTeamId match {
        case None =>
          // the (contest, None) slot is never written in the reference
          Assigned("", None)
        case Some(team) =>
          if (row.isPitcherSub || !currentName.contains(team)) {
            val idx = pitcherIndex.get(team) match {
              case None => pitcherIndex(team) = 0; 0
              case Some(i) => pitcherIndex(team) = i + 1; i + 1
            }
            val queue = queues.getOrElse(team, Seq.empty)
            if (idx < queue.length) {
              currentName(team) = queue(idx)._1
              currentId(team) = Option(queue(idx)._2)
            } else {
              currentName(team) =
                if (row.isPitcherSub && row.subIn.nonEmpty) row.subIn
                else currentName.getOrElse(team, "")
              currentId(team) = currentId.getOrElse(team, None)
            }
          }
          Assigned(currentName.getOrElse(team, ""), currentId.getOrElse(team, None))
      }
    }
  }
}
