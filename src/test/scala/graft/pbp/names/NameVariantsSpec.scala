package graft.pbp.names

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures for the roster-variation matcher (reference
  * `names/helpers.py:6-202`). */
class NameVariantsSpec extends AnyFunSuite {
  import NameVariants._

  test("formatName flips Last, First") {
    assert(formatName("Smith, John") === "John Smith")
    assert(formatName("  John Smith ") === "John Smith")
  }

  test("normalizeName strips punctuation, collapses spaces") {
    assert(normalizeName("O'Brien,  J.R.") === "obrien jr")
    assert(normalizeName("") === "")
  }

  test("parseNameParts: jersey prefix, comma form, single-word heuristics") {
    assert(parseNameParts("#12 John Smith") === (("John", "Smith", Some("12"))))
    assert(parseNameParts("12 John Smith") === (("John", "Smith", Some("12"))))
    assert(parseNameParts("Smith, John") === (("John", "Smith", None)))
    assert(parseNameParts("J.") === (("J", "", None)))
    assert(parseNameParts("Jo") === (("Jo", "", None)))
    assert(parseNameParts("Smith") === (("", "Smith", None)))
    assert(parseNameParts("John Van Der Berg") === (("John", "Van Der Berg", None)))
    assert(parseNameParts("") === (("", "", None)))
  }

  test("generateNameVariations: reference order, dedup, jersey forms") {
    val v = generateNameVariations("John", "Smith", Some("12"))
    assert(v.take(4) === Seq("John Smith", "john smith", "Smith, John", "smith, john"))
    assert(v.contains("J. Smith") && v.contains("j smith"))
    assert(v.contains("John S.") && v.contains("JS"))
    assert(v.contains("Smith") && v.contains("smith"))
    assert(v.contains("Joh Smi") && v.contains("joh smi"))
    assert(v.contains("#12 Smith") && v.contains("#12") && v.contains("12"))
    assert(v.distinct === v) // first-occurrence dedup
    assert(generateNameVariations("", "") === Seq.empty)
  }

  test("matchName cascade: exact, normalized, variation, fuzzy, last-name partial") {
    val roster = Seq(
      ("TeamA", "Smith, John", "p1", Some("12")),
      ("TeamA", "Garcia, Maria", "p2", None),
      ("TeamB", "Smith, John", "p9", None))
    val lookup = buildNameLookup(roster)
    val ordered = orderedKeys(roster)
    def m(name: String, team: String = "TeamA") =
      matchName(name, team, lookup, ordered).map(_._2)

    assert(m("Smith, John") === Some("p1")) // exact canonical
    assert(m("john smith") === Some("p1")) // lowercased variation
    assert(m("J. Smith") === Some("p1")) // generated variation
    assert(m("#12") === Some("p1")) // jersey variation
    assert(m("M. Garcia") === Some("p2"))
    assert(m("Jon Smith") === Some("p1")) // fuzzy token_sort
    assert(m("Mysterious Smithson") === Some("p1")) // partial on last name
    assert(m("Completely Unrelated Person Xyz") === None)
    assert(m("John Smith", team = "TeamB") === Some("p9")) // per-team isolation
    assert(m("John Smith", team = "NoTeam") === None)
  }
}
