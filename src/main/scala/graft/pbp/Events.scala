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

  /** Bats/throws normalizer (reference
    * `processors/reconcile_players.py:66-80`): NFKC, uppercase,
    * `\`/`|`→`/`, single letter doubles, first two handedness letters
    * otherwise. */
  def normalizeBT(bt: String): String = {
    if (bt == null) return ""
    var s = java.text.Normalizer.normalize(bt, java.text.Normalizer.Form.NFKC)
      .toUpperCase.trim
    if (s.isEmpty) return ""
    s = s.replace("\\", "/").replace("|", "/").replaceAll("\\s+", "")
    val pair = "^([LRSH])/?([LRSH])$".r
    s match {
      case pair(a, b) => s"$a/$b"
      case _ =>
        val letters = s.filter("LRSH".contains(_))
        if (letters.length >= 2) s"${letters(0)}/${letters(1)}"
        else if (letters.length == 1) s"${letters(0)}/${letters(0)}"
        else ""
    }
  }

  /** Full-word position standardizer (reconcile_players.py:83-131):
    * NFKC, split on `/`, `,`, `;`, " OR ", map to canonical codes,
    * dedup keep-first, join at most three. */
  private val stdPosMap: Map[String, String] = Map(
    "CATCHER" -> "C", "C" -> "C", "FIRST BASE" -> "1B", "1B" -> "1B",
    "SECOND BASE" -> "2B", "2B" -> "2B", "THIRD BASE" -> "3B", "3B" -> "3B",
    "SHORTSTOP" -> "SS", "SS" -> "SS", "LEFT FIELD" -> "LF", "LF" -> "LF",
    "CENTER FIELD" -> "CF", "CF" -> "CF", "RIGHT FIELD" -> "RF", "RF" -> "RF",
    "OUTFIELD" -> "OF", "OF" -> "OF", "INFIELD" -> "INF", "IF" -> "INF",
    "INF" -> "INF", "PITCHER" -> "P", "RHP" -> "P", "LHP" -> "P", "P" -> "P",
    "DESIGNATED HITTER" -> "DH", "DH" -> "DH",
    "UTILITY" -> "UT", "UTIL" -> "UT", "UT" -> "UT")

  def standardizePos(pos: String): String = {
    if (pos == null) return ""
    var s = java.text.Normalizer.normalize(pos, java.text.Normalizer.Form.NFKC)
      .toUpperCase.trim
    if (s.isEmpty) return ""
    s = s.replaceAll("[.\\s]+", " ").trim
    val parts = s.split("/|,|;| OR ").map(_.trim).filter(_.nonEmpty)
    val mapped = parts.map(p =>
      stdPosMap.getOrElse(p, stdPosMap.getOrElse(p.replace(" ", ""), p)))
      .distinct.filter(_.nonEmpty)
    if (mapped.isEmpty) ""
    else if (mapped.length == 1) mapped.head
    else mapped.take(3).mkString("/")
  }
}
