package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing.fingerprints/summary (t55) — the Schleimer/Wilkerson/
  * Aiken guarantees checked on hand-computable corpora, plus the
  * novelty scorer (t56). */
class WinnowingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 5
  private val W = 4

  private def fps(docs: Seq[(Long, String)]) =
    Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .as[(Long, Long, String)].collect().toSeq

  test("uniform text selects exactly the rightmost gram of each window") {
    // every 5-gram identical → every window's min key is its LARGEST
    // position; valid starts 0..m−W select positions W−1..m−1
    val m = 12 - K + 1 // 8 grams
    val r = fps(Seq((1L, Seq.fill(12)("x").mkString(" "))))
    assert(r.map(_._2).sorted === ((W - 1).toLong until m.toLong))
    assert(r.map(_._3).distinct.size === 1)
  }

  test("document shorter than one window emits exactly one fingerprint") {
    // 6 tokens → 2 grams < W: the degenerate whole-sequence window
    val r = fps(Seq((1L, "a b c d e f")))
    assert(r.size === 1)
  }

  test("shared substring of length >= W+K-1 guarantees a shared fingerprint") {
    // the paper's core guarantee: any match of W+K−1 = 8 tokens yields
    // at least one common (hash) selection in both documents
    val shared = "uno dos tres cuatro cinco seis siete ocho"
    val a = s"alpha beta gamma delta $shared epsilon zeta"
    val b = s"$shared omega psi chi phi upsilon tau sigma rho"
    val r = fps(Seq((1L, a), (2L, b)))
    val ha = r.filter(_._1 == 1L).map(_._3).toSet
    val hb = r.filter(_._1 == 2L).map(_._3).toSet
    assert((ha intersect hb).nonEmpty)
  }

  test("fingerprints are partition-invariant and summary density is bounded") {
    val docs = (1L to 40L)
      .map(i => (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val once = Winnowing.summary(df, "doc_id", "text", K, W)
      .orderBy("doc_id").collect().toSeq
    val twice = Winnowing.summary(df.repartition(7), "doc_id", "text", K, W)
      .orderBy("doc_id").collect().toSeq
    assert(once === twice)
    // selection density: every window selects ≥ 1 of its W grams and
    // distinct-collapse only removes repeats → 1/W ≤ density ≤ 1
    once.foreach { row =>
      val d = row.getAs[Double]("density")
      assert(d >= 1.0 / W - 1e-9 && d <= 1.0 + 1e-9)
    }
  }

  test("novelty: covered docs score 0, fresh docs score 1, mixed exact") {
    val ref = Seq((100L, "one two three four five six seven eight nine ten"))
    val covered = (1L, "one two three four five six seven eight nine ten")
    val fresh = (2L, "aa bb cc dd ee ff gg hh")
    // 9 tokens = two 8-grams: first covered (ref prefix), second not
    val mixed = (3L, "one two three four five six seven eight zz")
    val short = (4L, "too few tokens here")
    val r = Decontaminate.novelty(
        Seq(covered, fresh, mixed, short).toDF("doc_id", "text"),
        ref.toDF("doc_id", "text"), "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r.map(_._1) === Seq(1L, 2L, 3L))
    assert(r(0)._4 === 0.0)
    assert(r(1)._4 === 1.0)
    assert(r(2) === ((3L, 2L, 1L, 0.5)))
  }
}
