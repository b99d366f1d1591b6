package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** UnigramLm (t63) — Viterbi arithmetic on hand-built scores, the
  * train→encode round-trip, coverage, and the prune invariants. */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def scoresOf(m: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    m.foreach { case (p, s) => h.put(p, s) }
    h
  }

  test("segmentWord picks the minimum-cost path; ties prefer the longest final piece") {
    // "abc": pieces a(10), b(10), c(10), ab(15), bc(15), abc(40)
    // a+bc = 25 beats ab+c = 25? equal — tie-break: smallest final
    // split j → the LAST piece as long as possible → a|bc (j=1 for
    // final piece 'bc' vs j=2 for final 'c')
    val sc = scoresOf(("a", 10L), ("b", 10L), ("c", 10L),
      ("ab", 15L), ("bc", 15L), ("abc", 40L))
    assert(UnigramLm.segmentWord("abc", sc, 4) === Seq("a", "bc"))
    // make the whole-word piece cheapest → single piece wins
    val sc2 = scoresOf(("a", 10L), ("b", 10L), ("c", 10L), ("abc", 19L))
    assert(UnigramLm.segmentWord("abc", sc2, 4) === Seq("abc"))
    // cost really is additive integer micro-nats: forcing one tier up
    val sc3 = scoresOf(("a", 10L), ("b", 10L), ("c", 10L), ("abc", 31L))
    assert(UnigramLm.segmentWord("abc", sc3, 4) === Seq("a", "b", "c"))
  }

  test("unknown single codepoints fall back to the unk score — any input segments") {
    val sc = scoresOf(("a", 10L))
    assert(UnigramLm.segmentWord("axa", sc, 4) === Seq("a", "x", "a"))
    assert(UnigramLm.segmentWord("", sc, 4) === Nil)
    // astral-plane codepoint stays one piece (never sheared into
    // surrogate halves)
    val emoji = new String(Character.toChars(0x1F600))
    assert(UnigramLm.segmentWord(s"a${emoji}a", sc, 4) === Seq("a", emoji, "a"))
  }

  test("train on the corpus: coverage, prune bounds, and lossless round-trip") {
    import spark.implicits._
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val pieces = UnigramLm.train(docs, "text",
      maxPieceLen = 4, seedSize = 200, vocabSize = 80, emIters = 2, maxWordLen = 8)
    assert(pieces.nonEmpty && pieces.size <= 80)
    // every corpus single char survives (coverage guarantee)
    val singles = pieces.map(_.piece).filter(_.length == 1).toSet
    val corpusChars = docs.select("text").as[String].collect()
      .flatMap(_.trim.split("\\s+")).filter(w => w.nonEmpty && w.length <= 8)
      .flatMap(_.toCharArray).map(_.toString).toSet
    assert(corpusChars.subsetOf(singles))
    // scores are consistent: count-ordered pieces score inversely
    val byCount = pieces.sortBy(-_.count)
    assert(byCount.head.scoreMicro === pieces.map(_.scoreMicro).min)
    // ROUND-TRIP: segmenting any corpus word under the trained scores
    // concatenates back exactly (unigram segmentation partitions the
    // word — nothing dropped, nothing invented)
    val sc = scoresOf(pieces.map(p => p.piece -> p.scoreMicro): _*)
    val words = docs.select("text").as[String].collect()
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty).distinct
    words.foreach { w =>
      val toks = UnigramLm.segmentWord(w, sc, 4)
      assert(toks.mkString === w, s"round-trip failed for '$w': $toks")
    }
    // frequent whole words (<= maxPieceLen) are learned as ONE piece
    assert(UnigramLm.segmentWord("join", sc, 4) === Seq("join"))
    assert(UnigramLm.segmentWord("hash", sc, 4) === Seq("hash"))
  }
}
