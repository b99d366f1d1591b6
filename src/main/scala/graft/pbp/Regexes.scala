package graft.pbp

import java.util.regex.Pattern

/**
 * Play-description regex bank — semantic port of the reference's
 * pattern library (reference `processors/pbp_parser/regexes.py:1-259`).
 * Patterns are kept verbatim where possible (they ARE the spec: the
 * classifier cascade is priority-sensitive, SURVEY §7.4 #2); Python
 * `re.I` becomes `Pattern.CASE_INSENSITIVE`, `(?P<name>…)` becomes
 * `(?<name>…)`. All patterns sit in the Java∩Python common subset
 * (no lookbehind, no backrefs), so matching is identical.
 */
object Regexes {

  private def ci(p: String): Pattern = Pattern.compile(p, Pattern.CASE_INSENSITIVE)

  // base verb fragments (regexes.py:7-46)
  private val GroundedOut = "ground(?:ed|s) out"
  private val FliedOut = "fli(?:ed|es) out"
  private val LinedOut = "lin(?:ed|es) out"
  private val PoppedOut = "pop(?:ped|s) (?:out|up)"
  private val FouledOut = "foul(?:ed|s) out"
  private val StruckOut = "str(?:uck|ikes) out"
  private val InfieldFly = "infield fly"
  private val BatterOutVerbs =
    s"(?:$GroundedOut|$FliedOut|$LinedOut|$PoppedOut|$FouledOut|$InfieldFly)"

  private val Singled = "singled"
  private val Doubled = "doubled"
  private val Tripled = "tripled"
  private val Homered = "homer(?:ed|s)"
  private val HomeRun = "home run"
  private val Walked = "walked"
  private val Ibb = "intentionally walked|was intentionally walked"
  private val Hbp = "hit by pitch"
  private val Reached = "reached"
  private val BatterReachVerbs =
    s"(?:$Singled|$Doubled|$Tripled|$Homered|$Walked|$Hbp|$Reached)"

  private val Advanced = "advanc(?:ed|es)"
  private val Stole = "st(?:ole|eals)"
  private val Scored = "scor(?:ed|es)"
  private val PickedOff = "picked off"
  private val CaughtStealing = "caught stealing"
  private val TaggedOut = "tagged out"
  private val OutAtBase = "out at (?:first|second|third|home)"
  private val OutOnPlay = "out on the play"
  private val RunnerActionVerbs =
    s"(?:$Advanced|$Stole|$Scored|$PickedOff|$CaughtStealing|$TaggedOut|$OutAtBase)"

  private val SacFly = "sacrifice fly"
  private val SacBunt = "sacrific(?:e bunt|es|ed)"

  // multi-out plays (regexes.py:52-53)
  val RxTp: Pattern = ci("\\btriple play\\b")
  val RxDp: Pattern = ci("\\bdouble play\\b")

  // strikeouts (regexes.py:56-66)
  val RxK: Pattern = ci(s"\\b$StruckOut\\b")
  val RxKSafe: Pattern = ci(
    s"\\b$StruckOut\\b.*\\b(" +
      "reached first|reached base|reached on|safe at first|" +
      "wild pitch|passed ball|dropped 3rd strike|dropped third strike|" +
      "fielder'?s choice|error\\(|\\bE\\d\\b|bobble|advanced on" +
      ")\\b")
  val RxKWp: Pattern = ci(s"\\b$StruckOut\\b.*\\bwild pitch\\b")
  val RxKPb: Pattern = ci(s"\\b$StruckOut\\b.*\\bpassed ball\\b")

  // batter outs (regexes.py:69-80)
  val RxBatterOut: Pattern = ci(s"\\b(?:$SacFly|$SacBunt|$BatterOutVerbs)\\b")
  val RxSacFly: Pattern = ci(s"\\b$SacFly\\b")
  val RxSacBunt: Pattern = ci(s"\\b$SacBunt\\b")

  // hits and reaches (regexes.py:83-93)
  val RxSingle: Pattern = ci(s"\\b$Singled\\b")
  val RxDouble: Pattern = ci(s"\\b$Doubled\\b")
  val RxTriple: Pattern = ci(s"\\b$Tripled\\b")
  val RxHr: Pattern = ci(s"\\b(?:$Homered|$HomeRun)\\b")
  val RxBb: Pattern = ci(s"\\b$Walked\\b")
  val RxIbb: Pattern = ci(s"\\b(?:$Ibb)\\b")
  val RxHbp: Pattern = ci(s"\\b$Hbp\\b")
  val RxReached: Pattern = ci(s"\\b$Reached\\b")

  val RxFc: Pattern = ci("\\bfielder'?s choice\\b")

  // runner outs (regexes.py:99-107)
  val RxRunnerOut: Pattern =
    ci(s"\\b(?:$OutAtBase|$PickedOff|$CaughtStealing|$OutOnPlay)\\b")
  val RxStolenBase: Pattern = ci(s"\\b$Stole\\s+(?:second|third|home)\\b")
  val RxCaughtStealing: Pattern =
    ci(s"\\b(?:$CaughtStealing|out at (?:second|third|home)\\s+c\\s+to)\\b")
  val RxPickoff: Pattern = ci(s"\\b$PickedOff\\b")
  val RxPickoffError: Pattern = ci(s"\\b$PickedOff\\b.*\\b(?:error|E\\d)\\b")

  // runner advances (regexes.py:110-117)
  val RxAdvance: Pattern = ci(s"\\b$Advanced\\b")
  val RxTo2: Pattern = ci(s"\\b(?:$Advanced|$Stole)\\s+to\\s+second\\b|\\bstole second\\b")
  val RxTo3: Pattern = ci(s"\\b(?:$Advanced|$Stole)\\s+to\\s+third\\b|\\bstole third\\b")
  val RxToH: Pattern = ci(s"\\b(?:$Advanced)\\s+to\\s+home\\b|\\bstole home\\b|\\b$Scored\\b")
  val RxOut: Pattern = ci(
    s"\\b(?:$OutAtBase|out at second|out at third|out at home|$PickedOff|$CaughtStealing|$TaggedOut)\\b")

  // pitcher/catcher events (regexes.py:120-123)
  val RxWildPitch: Pattern = ci("\\bwild pitch\\b")
  val RxPassedBall: Pattern = ci("\\bpassed ball\\b")
  val RxBalk: Pattern = ci("\\bbalk\\b")
  val RxCi: Pattern = ci("\\bcatcher'?s? interference\\b")

  // errors (regexes.py:126-128)
  val RxError: Pattern = ci("\\b(?:error|muffed|dropped|bobbled|E\\d)\\b")
  val RxDroppedFoul: Pattern = ci("\\bdropped foul\\b")
  val RxInterference: Pattern = ci("\\binterference\\b")

  val RxDefensiveIndiff: Pattern = ci("\\bdefensive indifference\\b")

  // non-play events (regexes.py:134-143)
  val RxNoPlay: Pattern = ci(
    "\\b(?:no play|halted|delay|postponed|ejected|suspended|coach visit|mound visit|" +
      "timeout|injury|review|challenged|overturned|confirmed|stands|sunny|rain|" +
      "hitting out of turn)\\b")
  val RxLineupChange: Pattern =
    ci("^\\s*(?:lineup changed|pinch (?:hit|ran)|to\\s+\\w+\\s+for)\\b")
  val RxSubLine: Pattern =
    ci("^\\s*(?:lineup changed:\\s*)?.*?\\b(?:in for|to\\b.*\\bfor\\b|pinch (?:hit|ran) for)\\b")

  // composite (regexes.py:149-166)
  val RxBatterVerbs: Pattern = ci(
    s"\\b(?:$BatterReachVerbs|$StruckOut|$BatterOutVerbs|$Ibb|fouled into double play|pinch hit)\\b")
  val RxRunnerOnlyVerbs: Pattern = ci(s"\\b$RunnerActionVerbs\\b")
  val RxPlayVerb: Pattern = ci(
    s"\\b(?:$BatterReachVerbs|$StruckOut|$BatterOutVerbs|$RunnerActionVerbs|double play|triple play)\\b")
  val RxBatOut: Pattern = ci(s"\\b(?:$StruckOut|$BatterOutVerbs)\\b")

  // name extraction (regexes.py:172-189)
  val RxBatterName: Pattern = ci(
    s"^\\s*(?<name>.+?)\\s+(?:$BatterReachVerbs|$StruckOut|$GroundedOut|grounded|$FliedOut|flied|" +
      s"$LinedOut|lined|$PoppedOut|popped|$FouledOut|$InfieldFly|out)\\b")
  val RxRunnerName: Pattern = ci(
    s"^\\s*(?<name>.+?)\\s+(?:$Advanced|$Stole|$Scored|out|$PickedOff|$CaughtStealing)\\b")
  val RxRunnerP1Name: Pattern = ci(
    s"^\\s*(?<name>.+?)\\s+(?:$Advanced|$Stole|$Scored|out at|$PickedOff|$CaughtStealing|$TaggedOut)\\b")

  // substitution-line parsers (reference columns.py:259-270)
  private val PosAlt =
    "p|c|1b|2b|3b|ss|lf|cf|rf|dh|pitcher|catcher|first base|second base|third base|" +
      "shortstop|left field|center field|right field|first baseman|second baseman|third baseman"
  val RxToFor: Pattern = ci(
    s"^\\s*(?:lineup changed:\\s*)?(?<in>.+?)\\s+to\\s+(?<pos>$PosAlt)\\s+for\\s+(?<out>.+?)\\s*$$")
  val RxInFor: Pattern = ci(
    s"^\\s*(?:lineup changed:\\s*)?(?<in>.+?)\\s+in\\s+for\\s+(?:(?<pos>$PosAlt)\\s+)?(?<out>.+?)\\s*$$")
  val RxPinch: Pattern = ci(
    "^\\s*(?:lineup changed:\\s*)?(?<in>.+?)\\s+pinch\\s+(?<ptype>hit|ran)\\s+for\\s+(?<out>.+?)\\s*$")

  /** Python `rx.search(s)` equivalent. */
  @inline def found(p: Pattern, s: String): Boolean = p.matcher(s).find()

  /** First match's named group `name`, or "" when no match. */
  def captureName(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group("name").trim else ""
  }
}
