package graft.pbp

import org.scalatest.funsuite.AnyFunSuite

/** X3/X4/X5/X6 fixtures mirroring reference semantics
  * (`processors/pbp_parser/columns.py:56-118,532-678`,
  * `helpers.py:33-173`). */
class ParsingSpec extends AnyFunSuite {

  // ---- X5 split (helpers.py:33-39)
  test("splitPlayersText splits on ; 3a : and pads to 4") {
    assert(Parsing.splitPlayersText("Smith singled; Jones advanced to second") ===
      (("Smith singled", "Jones advanced to second", "", "")))
    assert(Parsing.splitPlayersText("A walked3aB scored:C out at third") ===
      (("A walked", "B scored", "C out at third", "")))
    assert(Parsing.splitPlayersText(null) === (("", "", "", "")))
    assert(Parsing.splitPlayersText("only one part") === (("only one part", "", "", "")))
  }

  // ---- X3 outs classifier (columns.py:56-118)
  test("catcher's interference => 0 outs, CATCH_INTERF") {
    assert(Parsing.outsOnPlay("Smith reached on catcher's interference", "", "", "") ===
      ((0, "CATCH_INTERF")))
  }
  test("triple/double play precedence over per-part counting") {
    assert(Parsing.outsOnPlay("Smith grounded into triple play", "Jones out at second",
      "Brown out at third", "") === ((3, "TRIPLE_PLAY")))
    assert(Parsing.outsOnPlay("Smith grounded into double play", "Jones out at second",
      "", "") === ((2, "DOUBLE_PLAY")))
  }
  test("K counts one out; K-safe does not") {
    assert(Parsing.outsOnPlay("Smith struck out swinging", "", "", "") === ((1, "K")))
    assert(Parsing.outsOnPlay("Smith struck out, reached first on a wild pitch", "", "", "") ===
      ((0, "")))
  }
  test("strikes out (present tense) also counts") {
    assert(Parsing.outsOnPlay("Smith strikes out looking", "", "", "")._1 === 1)
  }
  test("batter out + runner out accumulate per sub-play") {
    assert(Parsing.outsOnPlay("Smith flied out to cf", "Jones out at home", "", "") ===
      ((2, "BATTER_OUT+RUNNER_OUT")))
  }
  test("reached overrides batter-out verbs in the same sub-play") {
    assert(Parsing.outsOnPlay("Smith grounded out, reached on an error", "", "", "") === ((0, "")))
  }
  test("fielder's choice with no further sub-plays infers one out") {
    assert(Parsing.outsOnPlay("Smith hit into a fielder's choice", "", "", "") === ((1, "FC_OUT")))
    // with a runner sub-play present, no FC inference
    assert(Parsing.outsOnPlay("Smith hit into a fielder's choice",
      "Jones advanced to second", "", "") === ((0, "")))
    // reached on FC => no out
    assert(Parsing.outsOnPlay("Smith reached on a fielder's choice", "", "", "") === ((0, "")))
  }
  test("outs capped at 3") {
    assert(Parsing.outsOnPlay("Smith popped out", "A out at second", "B out at third",
      "C out at home")._1 === 3)
  }

  // ---- X4 event classifier (columns.py:532-615)
  private def ev(t: String, p1: String = null, sub: Boolean = false) =
    Parsing.classifyEventType(t, if (p1 == null) t else p1, sub)

  test("substitution and meta rows are NO_PLAY") {
    assert(ev("Jones to p for Smith", sub = true) === EventType.NoPlay)
    assert(ev("(2-1 BK)", "(2-1 BK)") === EventType.NoPlay)
    assert(ev("Lineup changed: Smith to c for Jones") === EventType.NoPlay)
    assert(ev("No play. Coach visit to the mound.") === EventType.NoPlay)
  }
  test("hit priority: HR > 3B > 2B > 1B") {
    assert(ev("Smith homered to left, Jones scored") === EventType.HomeRun)
    assert(ev("Smith tripled down the line") === EventType.Triple)
    assert(ev("Smith doubled, then Jones singled") === EventType.Double)
    assert(ev("Smith singled up the middle") === EventType.Single)
  }
  test("strikeout variants") {
    assert(ev("Smith struck out swinging, wild pitch, reached first") ===
      EventType.StrikeoutWildPitch)
    assert(ev("Smith struck out, passed ball, reached first") === EventType.StrikeoutPassedBall)
    assert(ev("Smith struck out looking") === EventType.Strikeout)
    assert(ev("Smith struck out, reached on a dropped third strike") === EventType.Strikeout)
  }
  test("walk family") {
    assert(ev("Smith was intentionally walked") === EventType.IntentionalWalk)
    assert(ev("Smith walked") === EventType.Walk)
    assert(ev("Smith hit by pitch") === EventType.HitByPitch)
  }
  test("baserunning family") {
    assert(ev("Jones stole second") === EventType.StolenBase)
    assert(ev("Jones caught stealing at second") === EventType.CaughtStealing)
    assert(ev("Jones picked off at first, error by the pitcher") === EventType.PickoffError)
    assert(ev("Jones picked off at first") === EventType.Pickoff)
    assert(ev("Jones advanced to second on defensive indifference") === EventType.DefensiveIndiff)
  }
  test("battery events and misc") {
    assert(ev("Jones advanced to second on a wild pitch") === EventType.WildPitch)
    assert(ev("Jones advanced to second on a passed ball") === EventType.PassedBall)
    assert(ev("Jones advanced to second on a balk") === EventType.Balk)
    assert(ev("Smith reached on catcher's interference") === EventType.Interference)
    assert(ev("Smith hit into a fielder's choice") === EventType.FieldersChoice)
  }
  test("error only when no batter-out verb") {
    assert(ev("Smith reached on an error by ss") === EventType.Error)
    assert(ev("Smith flied out to cf, error on the throw, batter safe") === EventType.GenericOut)
  }
  test("generic outs and advance fallback") {
    assert(ev("Smith grounded out to ss") === EventType.GenericOut)
    // "out at third c to" is the CS shorthand (regexes.py:101-103)…
    assert(ev("Jones out at third c to 3b") === EventType.CaughtStealing)
    // …while a plain runner out is a generic out
    assert(ev("Jones out at third on the throw") === EventType.GenericOut)
    assert(ev("Jones advanced to second") === EventType.OtherAdvance)
    assert(ev("rain briefly interrupted play in the 4th") === EventType.NoPlay)
    assert(ev("something entirely novel happened") === EventType.Unknown)
  }

  // ---- X4b batted-ball (columns.py:632-678)
  test("batted-ball cascade by priority") {
    assert(Parsing.classifyBattedBall("Smith grounded out to ss", EventType.GenericOut) ===
      BattedBallType.GroundBall)
    assert(Parsing.classifyBattedBall("Smith sacrifice bunted", EventType.GenericOut) ===
      BattedBallType.Bunt)
    assert(Parsing.classifyBattedBall("Smith lined out to cf", EventType.GenericOut) ===
      BattedBallType.LineDrive)
    assert(Parsing.classifyBattedBall("Smith popped out to 2b", EventType.GenericOut) ===
      BattedBallType.PopUp)
    assert(Parsing.classifyBattedBall("Smith fouled out to c", EventType.GenericOut) ===
      BattedBallType.PopUp)
    assert(Parsing.classifyBattedBall("Smith flied out to rf", EventType.GenericOut) ===
      BattedBallType.FlyBall)
  }
  test("non-batted events yield null") {
    assert(Parsing.classifyBattedBall("Smith walked", EventType.Walk) === null)
  }
  test("reference quirk preserved: FB tier's empty alternative matches any wordy text") {
    // columns.py:649 `|)` — a single with no trajectory verb still gets FB
    assert(Parsing.classifyBattedBall("Smith singled up the middle", EventType.Single) ===
      BattedBallType.FlyBall)
  }

  // ---- X6 name extraction (helpers.py:93-116)
  test("batter and runner name extraction") {
    assert(Parsing.extractBatterName("Smith, John singled to left", subFl = false) === "Smith, John")
    assert(Parsing.extractBatterName("Jones to p for Smith", subFl = true) === "")
    assert(Parsing.extractRunnerName("Jones advanced to second") === "Jones")
    assert(Parsing.extractRunnerNameFromP1("Jones stole second") === "Jones")
    assert(Parsing.extractRunnerName("") === "")
  }

  // ---- destinations (helpers.py:142-173)
  test("batter destination mapping") {
    assert(Parsing.batterDest("Smith homered") === "H")
    assert(Parsing.batterDest("Smith tripled") === "3")
    assert(Parsing.batterDest("Smith doubled") === "2")
    assert(Parsing.batterDest("Smith singled") === "1")
    assert(Parsing.batterDest("Smith walked") === "1")
    assert(Parsing.batterDest("Smith reached on an error") === "1")
    assert(Parsing.batterDest("Smith grounded out") === "OUT")
    assert(Parsing.batterDest("gibberish") === "")
  }
  test("runner destination: OUT precedence, then H/3/2") {
    assert(Parsing.runnerDest("Jones out at home") === "OUT")
    assert(Parsing.runnerDest("Jones scored") === "H")
    assert(Parsing.runnerDest("Jones advanced to third") === "3")
    assert(Parsing.runnerDest("Jones stole second") === "2")
    assert(Parsing.runnerDest("Jones caught stealing") === "OUT")
  }

  // ---- domain normalizers (reconcile_players.py:66-131)
  test("normalizeBT handedness forms") {
    assert(Positions.normalizeBT("R/R") === "R/R")
    assert(Positions.normalizeBT("r\\l") === "R/L")
    assert(Positions.normalizeBT(" S | R ") === "S/R")
    assert(Positions.normalizeBT("L") === "L/L")
    // reference quirk preserved: the S in "BATS" is itself a
    // handedness letter, so the first two found are S then R
    assert(Positions.normalizeBT("Bats: R Throws: L") === "S/R")
    assert(Positions.normalizeBT("??") === "")
  }

  test("standardizePos maps words, dedups, caps at three") {
    assert(Positions.standardizePos("Catcher") === "C")
    assert(Positions.standardizePos("ss/2b") === "SS/2B")
    assert(Positions.standardizePos("RHP") === "P")
    assert(Positions.standardizePos("LEFT FIELD, CF; RF / DH") === "LF/CF/RF")
    assert(Positions.standardizePos("of/OF") === "OF")
    assert(Positions.standardizePos("") === "")
  }

  // ---- substitution parsing (columns.py:256-308)
  test("substitution parse cascade and position canonicalization") {
    assert(Parsing.parseSubstitution("Jones to p for Smith") === ((true, "Jones", "Smith", "p")))
    assert(Parsing.parseSubstitution("Jones to first base for Smith") ===
      ((true, "Jones", "Smith", "1b")))
    assert(Parsing.parseSubstitution("Jones in for ss Smith") === ((true, "Jones", "Smith", "ss")))
    assert(Parsing.parseSubstitution("Jones in for Smith") === ((true, "Jones", "Smith", "")))
    assert(Parsing.parseSubstitution("Jones pinch hit for Smith") === ((true, "Jones", "Smith", "ph")))
    assert(Parsing.parseSubstitution("Jones pinch ran for Smith") === ((true, "Jones", "Smith", "pr")))
    assert(Parsing.parseSubstitution("Lineup changed: Jones to c for Smith") ===
      ((true, "Jones", "Smith", "c")))
    assert(Parsing.parseSubstitution("Smith singled to left") === ((false, "", "", "")))
  }
}
