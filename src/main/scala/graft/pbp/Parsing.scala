package graft.pbp

import Regexes._

/**
 * Pure row-level parsing helpers — X3 (outs classifier), X4
 * (event/batted-ball classifiers), X5 (sub-play splitter), X6 (name
 * extraction) and the destination/meta helpers they compose
 * (reference `processors/pbp_parser/helpers.py:33-173`,
 * `columns.py:56-118,532-678`). 100% pure functions, unit-testable
 * without Spark; exposed to DataFrames via UDFs in [[PbpPipeline]].
 */
object Parsing {

  @inline private def s(x: String): String = if (x == null) "" else x.trim

  // hot-path patterns precompiled once: String.split(regex) and
  // String.replaceAll compile their pattern on EVERY call, and these
  // run per play row
  private val SplitRx = java.util.regex.Pattern.compile("(?:;|3a|:)")
  private val WsRx = java.util.regex.Pattern.compile("\\s+")

  /** X5: split a description into up to four sub-plays on `;`, `3a`,
    * or `:` (reference helpers.py:33-39). */
  def splitPlayersText(desc: String): (String, String, String, String) = {
    if (desc == null || desc.isEmpty) return ("", "", "", "")
    val parts = SplitRx.split(desc, -1)
    def p(i: Int) = if (i < parts.length) parts(i).trim else ""
    (p(0), p(1), p(2), p(3))
  }

  /** FC single-out inference (reference helpers.py:42-57). */
  def inferOutsFromFc(p1: String, hasP2: Boolean, hasP3: Boolean, hasP4: Boolean,
      outsAlready: Int): Int = {
    if (outsAlready != 0) return 0
    val t = s(p1)
    if (t.isEmpty) return 0
    if (found(RxReached, t)) return 0
    if (!found(RxFc, t)) return 0
    if (found(RxDp, t) || found(RxTp, t)) return 0
    if (!hasP2 && !hasP3 && !hasP4) 1 else 0
  }

  /** X3: outs on play with reason trail (reference columns.py:56-118).
    * Priority: catcher's interference (0), triple play (3), double
    * play (2); else per-sub-play runner-out / K / batter-out counting
    * with K-safe exclusion, plus FC inference; capped at 3. */
  def outsOnPlay(p1: String, p2: String, p3: String, p4: String): (Int, String) = {
    val texts = Array(s(p1), s(p2), s(p3), s(p4))
    val full = texts.filter(_.nonEmpty).mkString(" ")
    if (full.isEmpty) return (0, "")

    if (found(RxCi, full)) return (0, "CATCH_INTERF")
    if (found(RxTp, full)) return (3, "TRIPLE_PLAY")
    if (found(RxDp, full)) return (2, "DOUBLE_PLAY")

    var outs = 0
    val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
    for (t <- texts if t.nonEmpty) {
      if (found(RxRunnerOut, t)) { outs += 1; reasons += "RUNNER_OUT" }
      else if (found(RxK, t) && found(RxKSafe, t)) ()
      else if (found(RxK, t)) { outs += 1; reasons += "K" }
      else if (found(RxBatterOut, t) && !found(RxReached, t)) { outs += 1; reasons += "BATTER_OUT" }
    }

    val fc = inferOutsFromFc(texts(0), texts(1).nonEmpty, texts(2).nonEmpty, texts(3).nonEmpty, outs)
    if (fc != 0) { outs += fc; reasons += "FC_OUT" }

    outs = math.min(outs, 3)
    if (outs != 0) (outs, reasons.mkString("+")) else (0, "")
  }

  /** Meta/sub rows produce no batter (reference helpers.py:68-79). */
  def blankIfSubOrMeta(p1: String, subFl: Boolean): Boolean = {
    if (subFl) return true
    val t = s(p1)
    if (t.isEmpty) return true
    if (found(RxSubLine, t)) return true
    if (t.startsWith("(")) return true
    if (!found(RxPlayVerb, t)) return true
    false
  }

  /** p1 describes a runner, not the batter (reference helpers.py:82-90). */
  def isRunnerOnlyEvent(p1: String): Boolean = {
    val t = s(p1)
    if (t.isEmpty) return false
    if (found(RxBatterVerbs, t)) return false
    found(RxRunnerOnlyVerbs, t)
  }

  /** X6 (reference helpers.py:93-116). */
  def extractRunnerNameFromP1(p1: String): String = {
    val t = s(p1); if (t.isEmpty) "" else captureName(RxRunnerP1Name, t)
  }

  def extractBatterName(p1: String, subFl: Boolean): String = {
    val t = s(p1)
    if (blankIfSubOrMeta(t, subFl)) return ""
    if (isRunnerOnlyEvent(t)) return ""
    captureName(RxBatterName, t)
  }

  /** [[extractBatterName]] when the caller has ALREADY established the
    * row is neither blank/meta nor runner-only — lets the base-state
    * fold evaluate those regex gates once per row instead of thrice. */
  private[pbp] def batterNameUnchecked(p1: String): String =
    captureName(RxBatterName, s(p1))

  def extractRunnerName(px: String): String = {
    val t = s(px); if (t.isEmpty) "" else captureName(RxRunnerName, t)
  }

  /** Batter destination after p1 (reference helpers.py:142-158). */
  def batterDest(p1: String): String = {
    val t = s(p1)
    if (t.isEmpty) return ""
    if (found(RxHr, t)) return "H"
    if (found(RxTriple, t)) return "3"
    if (found(RxDouble, t)) return "2"
    if (found(RxSingle, t)) return "1"
    if (found(RxBb, t) || found(RxHbp, t) || found(RxReached, t)) return "1"
    if (found(RxBatOut, t)) return "OUT"
    ""
  }

  /** Runner destination in a sub-play (reference helpers.py:161-173).
    * OUT takes precedence over H/3/2. */
  def runnerDest(px: String): String = {
    val t = s(px)
    if (t.isEmpty) return ""
    if (found(RxOut, t)) return "OUT"
    if (found(RxToH, t)) return "H"
    if (found(RxTo3, t)) return "3"
    if (found(RxTo2, t)) return "2"
    ""
  }

  /** X4: event-type cascade — ~25 priority-ordered tiers (reference
    * columns.py:532-615). `subFl`-rows and parenthesized p1 are NP. */
  def classifyEventType(text: String, p1: String, subFl: Boolean): String = {
    val t = s(text)
    val p = s(p1)
    import EventType._

    if (subFl) return NoPlay
    if (p.startsWith("(")) return NoPlay
    if (found(RxLineupChange, t)) return NoPlay
    if (found(RxNoPlay, t)) return NoPlay

    if (found(RxHr, t)) return HomeRun
    if (found(RxTriple, t)) return Triple
    if (found(RxDouble, t)) return Double
    if (found(RxSingle, t)) return Single

    if (found(RxKWp, t)) return StrikeoutWildPitch
    if (found(RxKPb, t)) return StrikeoutPassedBall
    if (found(RxK, t) && !found(RxKSafe, t)) return Strikeout
    if (found(RxKSafe, t)) return Strikeout

    if (found(RxIbb, t)) return IntentionalWalk
    if (found(RxBb, t)) return Walk
    if (found(RxHbp, t)) return HitByPitch

    if (found(RxDefensiveIndiff, t)) return DefensiveIndiff
    if (found(RxStolenBase, t) && !found(RxCaughtStealing, t)) return StolenBase
    if (found(RxCaughtStealing, t)) return CaughtStealing
    if (found(RxPickoffError, t)) return PickoffError
    if (found(RxPickoff, t)) return Pickoff

    if (found(RxWildPitch, t)) return WildPitch
    if (found(RxPassedBall, t)) return PassedBall
    if (found(RxBalk, t)) return Balk

    if (found(RxCi, t) || found(RxInterference, t)) return Interference
    if (found(RxDroppedFoul, t)) return FoulError
    if (found(RxFc, t)) return FieldersChoice

    if (found(RxError, t) && !found(RxBatterOut, t)) return Error

    if (found(RxTp, t)) return GenericOut
    if (found(RxDp, t)) return GenericOut
    if (found(RxBatterOut, t)) return GenericOut
    if (found(RxRunnerOut, t)) return GenericOut

    if (found(RxAdvance, t)) return OtherAdvance

    Unknown
  }

  /** Events that can carry a batted-ball type (reference columns.py:622-630). */
  val battedBallEvents: Set[String] = Set(
    EventType.Single, EventType.Double, EventType.Triple, EventType.HomeRun,
    EventType.GenericOut, EventType.FieldersChoice, EventType.Error)

  // Batted-ball cascade (reference columns.py:632-655). NOTE the
  // fly-ball pattern's trailing empty alternative `|)` is preserved
  // from the reference: it makes the FB tier match ANY text containing
  // a word boundary, so batted-ball events that reach that tier are
  // always FB rather than null — a latent reference quirk kept for
  // output fidelity (SURVEY §7.4 #2).
  private val bbCascade: Seq[(java.util.regex.Pattern, String)] = Seq(
    java.util.regex.Pattern.compile(
      "\\b(?:grounded|grounds|ground(?:ed)?\\s+out|ground\\s+ball)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.GroundBall,
    java.util.regex.Pattern.compile(
      "\\b(?:bunt(?:ed)?|sacrifice\\s+bunt)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.Bunt,
    java.util.regex.Pattern.compile(
      "\\b(?:lined|lines|lin(?:ed|es)\\s+out|line\\s+drive)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.LineDrive,
    java.util.regex.Pattern.compile(
      "\\b(?:popped|pops|pop(?:ped)?\\s+(?:out|up)|pop\\s+up|infield\\s+fly)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.PopUp,
    java.util.regex.Pattern.compile(
      "\\b(?:fouled\\s+out|foul(?:ed|s)\\s+out)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.PopUp,
    java.util.regex.Pattern.compile(
      "\\b(?:flied|flies|fli(?:ed|es)\\s+out|fly\\s+(?:out|ball)|flyout|home run|homers|)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.FlyBall,
    java.util.regex.Pattern.compile(
      "\\b(?:sacrifice\\s+fly)\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE) -> BattedBallType.FlyBall)

  /** X4b: batted-ball type, or null for non-batted events / no match
    * (reference columns.py:658-678). */
  def classifyBattedBall(text: String, eventType: String): String = {
    if (!battedBallEvents.contains(eventType)) return null
    val t = s(text)
    bbCascade.collectFirst { case (rx, bb) if rx.matcher(t).find() => bb }.orNull
  }

  /** Sub-line parse: (sub_fl, sub_in, sub_out, sub_pos) (reference
    * columns.py:256-308). Cascade: "X to POS for Y" → "X in for
    * [POS] Y" → "X pinch hit|ran for Y" (ph/pr). */
  def parseSubstitution(desc: String): (Boolean, String, String, String) = {
    val txt = WsRx.matcher(s(desc)).replaceAll(" ")
    val mToFor = RxToFor.matcher(txt)
    if (mToFor.find()) {
      return (true, s(mToFor.group("in")), s(mToFor.group("out")),
        Positions.canonPos(s(mToFor.group("pos"))))
    }
    val mInFor = RxInFor.matcher(txt)
    if (mInFor.find()) {
      val pos = Option(mInFor.group("pos")).getOrElse("")
      return (true, s(mInFor.group("in")), s(mInFor.group("out")), Positions.canonPos(s(pos)))
    }
    val mPinch = RxPinch.matcher(txt)
    if (mPinch.find()) {
      val pos = if (s(mPinch.group("ptype")).equalsIgnoreCase("hit")) "ph" else "pr"
      return (true, s(mPinch.group("in")), s(mPinch.group("out")), pos)
    }
    (false, "", "", "")
  }
}
