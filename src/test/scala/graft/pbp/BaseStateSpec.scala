package graft.pbp

import org.scalatest.funsuite.AnyFunSuite

/** X1 base-state machine fixtures (reference `columns.py:332-529`) —
  * the hard-part semantics SURVEY §7.4 #1 calls out: forced-advance
  * cascade, sub swap before snapshot, two-pass runner moves, resets. */
class BaseStateSpec extends AnyFunSuite {
  import BaseState._

  private def play(p1: String, p2: String = "", p3: String = "", p4: String = "",
      newGame: Boolean = false, newInn: Boolean = false,
      subFl: Boolean = false, subIn: String = "", subOut: String = ""): Play =
    Play(newGame, newInn, subFl, subIn, subOut, p1, p2, p3, p4)

  test("single puts batter on first; walk forces runner 1->2") {
    val outs = runGame(Seq(
      play("Adams singled to left", newGame = true, newInn = true),
      play("Brown walked")))
    assert(outs(0).basesBefore === "NNN")
    assert(outs(0).r1After === "Adams")
    assert(outs(0).basesAfter === "YNN")
    assert(outs(1).r1After === "Brown")
    assert(outs(1).r2After === "Adams")
    assert(outs(1).basesAfter === "YYN")
  }

  test("forced-advance cascade: 1st+2nd occupied, 3rd empty -> double force") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Brown singled"),  // explicit advance absent: force Adams to 2nd
      play("Cole walked")))   // forces Brown->2, Adams->3
    assert(outs(2).r1After === "Cole")
    assert(outs(2).r2After === "Brown")
    assert(outs(2).r3After === "Adams")
    assert(outs(2).basesAfter === "YYY")
  }

  test("bases loaded + single without explicit moves: reference applies NO advance") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Brown singled"),
      play("Cole singled"),
      play("Dunn singled"))) // bases loaded — columns.py:508-509 `pass`
    assert(outs(3).basesBefore === "YYY")
    // batter not placed; runners unchanged
    assert(outs(3).r1After === "Cole")
    assert(outs(3).r2After === "Brown")
    assert(outs(3).r3After === "Adams")
  }

  test("explicit p2-p4 moves override forcing; OUT/H removals apply before 2/3 placements") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Brown singled", p2 = "Adams advanced to third"),
      // Adams scores (removed first), Brown advances to 2nd in the same play
      play("Cole singled", p2 = "Adams scored", p3 = "Brown advanced to second")))
    assert(outs(1).r3After === "Adams")
    assert(outs(1).r1After === "Brown")
    assert(outs(2).r3After === "")
    assert(outs(2).r2After === "Brown")
    assert(outs(2).r1After === "Cole")
    assert(outs(2).basesAfter === "YYN")
  }

  test("home run clears the bases") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Brown homered, Adams scored")))
    assert(outs(1).basesBefore === "YNN")
    assert(outs(1).basesAfter === "NNN")
  }

  test("runner-only p1 event moves the runner, no batter") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Adams stole second")))
    assert(outs(1).batterName === "")
    assert(outs(1).playerOfInterest === "Adams")
    assert(outs(1).r1After === "")
    assert(outs(1).r2After === "Adams")
  }

  test("substitution swaps runner identity BEFORE the before-snapshot") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Pinch to pr for Adams", subFl = true, subIn = "Pinch", subOut = "Adams"),
      play("Brown singled")))
    // columns.py:399-411: swap precedes the snapshot on the sub row itself
    assert(outs(1).r1Before === "Pinch")
    assert(outs(1).r1After === "Pinch")
    assert(outs(2).r2After === "Pinch") // forced ahead of Brown
  }

  test("meta rows leave state untouched") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("(3-2 count)"),
      play("Brown walked")))
    assert(outs(1).batterName === "")
    assert(outs(1).basesBefore === "YNN")
    assert(outs(1).basesAfter === "YNN")
    assert(outs(2).r2After === "Adams")
  }

  test("new inning resets runners") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Brown grounded out", newInn = true)))
    assert(outs(1).basesBefore === "NNN")
  }

  test("caught stealing removes the runner") {
    val outs = runGame(Seq(
      play("Adams singled", newGame = true, newInn = true),
      play("Adams caught stealing at second")))
    assert(outs(1).r1After === "")
    assert(outs(1).basesAfter === "NNN")
  }
}
