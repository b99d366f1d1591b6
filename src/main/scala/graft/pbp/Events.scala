package graft.pbp

/** Event-type codes (reference `processors/pbp_parser/constants.py:12-38`
  * — a StrEnum; stored as strings). */
object EventType {
  val Unknown = "UNK"
  val NoPlay = "NP"
  val GenericOut = "OUT"
  val Strikeout = "SO"
  val StolenBase = "SB"
  val DefensiveIndiff = "DEF_IND"
  val CaughtStealing = "CS"
  val PickoffError = "POE"
  val Pickoff = "PO"
  val WildPitch = "WP"
  val PassedBall = "PB"
  val Balk = "BK"
  val OtherAdvance = "ADV"
  val FoulError = "FE"
  val Walk = "BB"
  val IntentionalWalk = "IBB"
  val HitByPitch = "HBP"
  val Interference = "CI"
  val Error = "E"
  val FieldersChoice = "FC"
  val Single = "1B"
  val Double = "2B"
  val Triple = "3B"
  val HomeRun = "HR"
  val StrikeoutPassedBall = "SO_PB"
  val StrikeoutWildPitch = "SO_WP"
}

/** Batted-ball codes (reference constants.py:4-9). */
object BattedBallType {
  val GroundBall = "GB"
  val LineDrive = "LD"
  val FlyBall = "FB"
  val PopUp = "PU"
  val Bunt = "BU"
}

/** Position canonicalization (reference constants.py:41-79). */
object Positions {
  val posMap: Map[String, String] = Map(
    "p" -> "p", "pitcher" -> "p",
    "c" -> "c", "catcher" -> "c",
    "1b" -> "1b", "first baseman" -> "1b", "first base" -> "1b",
    "2b" -> "2b", "second baseman" -> "2b", "second base" -> "2b",
    "3b" -> "3b", "third baseman" -> "3b", "third base" -> "3b",
    "ss" -> "ss", "shortstop" -> "ss",
    "lf" -> "lf", "left fielder" -> "lf", "left field" -> "lf",
    "cf" -> "cf", "center fielder" -> "cf", "center field" -> "cf",
    "rf" -> "rf", "right fielder" -> "rf", "right field" -> "rf",
    "dh" -> "dh", "designated hitter" -> "dh",
    "ph" -> "ph", "pinch hitter" -> "ph",
    "pr" -> "pr", "pinch runner" -> "pr")

  def canonPos(x: String): String = {
    if (x == null) return ""
    val s = x.trim.toLowerCase
    posMap.getOrElse(s, s)
  }
}
