package graft.pbp

import org.scalatest.funsuite.AnyFunSuite

/** X2 pitcher-queue fixtures (reference `names/names.py:40-97`). */
class PitcherQueueSpec extends AnyFunSuite {
  import PitcherQueue._

  private val queues = Map(
    "T1" -> Seq(("Starter One", "p1"), ("Reliever One", "p2")),
    "T2" -> Seq(("Starter Two", "p3")))

  private def p(team: String, sub: Boolean = false, subIn: String = "") =
    PlayRow(Option(team), sub, subIn)

  test("first appearance initializes queue index 0") {
    val out = runGame(Seq(p("T1"), p("T1"), p("T2")), queues)
    assert(out(0) === Assigned("Starter One", Some("p1")))
    assert(out(1) === Assigned("Starter One", Some("p1")))
    assert(out(2) === Assigned("Starter Two", Some("p3")))
  }

  test("pitcher sub advances the queue") {
    val out = runGame(Seq(p("T1"), p("T1", sub = true, subIn = "Reliever One"), p("T1")), queues)
    assert(out(1) === Assigned("Reliever One", Some("p2")))
    assert(out(2) === Assigned("Reliever One", Some("p2")))
  }

  test("queue exhaustion falls back to sub_in name, keeps previous id (names.py:84-89)") {
    val out = runGame(Seq(
      p("T2"),
      p("T2", sub = true, subIn = "Emergency Arm")), queues)
    assert(out(1) === Assigned("Emergency Arm", Some("p3")))
  }

  test("exhaustion without sub_in keeps the previous pitcher") {
    val out = runGame(Seq(
      p("T2"),
      p("T2", sub = true, subIn = "")), queues)
    assert(out(1) === Assigned("Starter Two", Some("p3")))
  }

  test("unknown team with no queue: first appearance yields empty (quirk preserved)") {
    val out = runGame(Seq(p("T9"), p("T9", sub = true, subIn = "Somebody")), queues)
    assert(out(0) === Assigned("", None))
    assert(out(1) === Assigned("Somebody", None))
  }

  test("null pitch team resolves to empty") {
    val out = runGame(Seq(PlayRow(None, isPitcherSub = false, "")), queues)
    assert(out(0) === Assigned("", None))
  }

  test("interleaved teams keep independent queues") {
    val out = runGame(Seq(p("T1"), p("T2"), p("T1", sub = true, subIn = "Reliever One"), p("T2")), queues)
    assert(out(2).pitcherName === "Reliever One")
    assert(out(3).pitcherName === "Starter Two")
  }
}
