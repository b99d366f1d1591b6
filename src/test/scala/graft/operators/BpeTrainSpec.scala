package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training: the hand-derivable Sennrich corpus, the
  * driver ≡ distributed equivalence on a REAL corpus, and the
  * train → encode round trip into [[graft.functions.BpeVocab]]. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al. 2016 running example; the expected merge table is
  // derived BY HAND from the greedy rule (max freq, ties by (lhs, rhs)
  // ascending) — the same 12 rows the t38 oracle pins.
  private val sennrich = Seq("low" -> 3L, "lower" -> 2L, "newest" -> 4L, "widest" -> 2L)
  private val expected = Seq(
    ("e", "s", 6L), ("es", "t", 6L), ("l", "o", 5L), ("lo", "w", 5L),
    ("e", "w", 4L), ("ew", "est", 4L), ("n", "ewest", 4L),
    ("d", "est", 2L), ("e", "r", 2L), ("i", "dest", 2L),
    ("low", "er", 2L), ("w", "idest", 2L))

  test("trainFromCounts reproduces the hand-computed Sennrich merge table and stops early") {
    assert(BpeTrain.trainFromCounts(sennrich, numMerges = 50) === expected)
    // truncation at numMerges is a prefix
    assert(BpeTrain.trainFromCounts(sennrich, numMerges = 5) === expected.take(5))
    // minFreq raises the stop bar
    assert(BpeTrain.trainFromCounts(sennrich, numMerges = 50, minFreq = 3L) ===
      expected.takeWhile(_._3 >= 3L))
  }

  test("distributed trainer matches the driver trainer on the Sennrich corpus") {
    val corpus = sennrich.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .mkString(" ").split(" ").grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
    val wf = BpeTrain.wordFreq(corpus, "text")
    assert(BpeTrain.trainMergesDistributed(wf, numMerges = 50) === expected)
    // lineage checkpointing is output-invariant (every-2-rounds forces
    // several truncations inside this 12-merge run)
    assert(BpeTrain.trainMergesDistributed(wf, numMerges = 50, checkpointEvery = 2)
      === expected)
  }

  test("driver ≡ distributed on the real documents corpus") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val wf = BpeTrain.wordFreq(docs, "text").persist()
    val driver = BpeTrain.trainFromCounts(
      wf.as[(String, Long)].collect().toSeq, numMerges = 12)
    val dist = BpeTrain.trainMergesDistributed(wf, numMerges = 12)
    wf.unpersist()
    assert(driver.nonEmpty, "real corpus must yield merges")
    assert(dist === driver)
    // trainMerges (the probing front door) takes the driver path here
    assert(BpeTrain.trainMerges(docs, "text", numMerges = 12) === driver)
  }

  test("learned merges drive the encoder: 'lowest' → [low, est]") {
    val vocab = BpeTrain.toVocab(BpeTrain.trainFromCounts(sennrich, numMerges = 50))
    assert(vocab.encode("lowest").toSeq === Seq("low", "est"))
    assert(vocab.encode("newest widest").toSeq === Seq("newest", "widest"))
    // unseen symbols stay split at the character level
    assert(vocab.encode("xyz").toSeq === Seq("x", "y", "z"))
  }

  test("distributed trainer survives SQL-special symbols (quotes, backslashes)") {
    // merge symbols are spliced into a SQL fold as literals — a word
    // carrying ' or \ must not break or corrupt the rewrite
    val corpus = Seq.fill(4)("it's it's a\\b a\\b ''x ''x").mkString(" ")
      .split(" ").grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val wf = BpeTrain.wordFreq(corpus, "text").persist()
    val driver = BpeTrain.trainFromCounts(wf.as[(String, Long)].collect().toSeq, 10)
    val dist = BpeTrain.trainMergesDistributed(wf, 10)
    wf.unpersist()
    assert(driver.nonEmpty && driver.exists(m => (m._1 + m._2).contains("'")))
    assert(dist === driver)
  }

  test("driver ≡ distributed beyond the BMP (surrogate pairs, codepoint tie-break)") {
    // emoji (U+1F30A 🌊, U+1F600 😀) force surrogate pairs; U+E000
    // (private-use BMP) vs the emoji exercises the tie-break order
    // where UTF-16 and codepoint comparisons DISAGREE (U+E000 > any
    // astral codepoint in UTF-16 code-unit order, < in codepoint
    // order). Frequencies are tuned so early rounds tie.
    val e = "\uE000" // BMP, UTF-16 code unit 0xE000
    val corpus = (
      Seq.fill(4)("🌊a") ++ // 🌊a ×4
        Seq.fill(4)(s"${e}a") ++      // U+E000 a ×4 — ties with 🌊a
        Seq.fill(3)("b😀") ++ // b😀 ×3
        Seq.fill(2)("🌊😀x") // 🌊😀x ×2
      ).grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
    val wf = BpeTrain.wordFreq(corpus, "text").persist()
    val driver = BpeTrain.trainFromCounts(wf.as[(String, Long)].collect().toSeq,
      numMerges = 10, minFreq = 1L)
    val dist = BpeTrain.trainMergesDistributed(wf, numMerges = 10, minFreq = 1L)
    wf.unpersist()
    assert(driver.nonEmpty, "astral corpus must yield merges")
    // symbols must be whole codepoints — never a lone surrogate
    driver.foreach { case (a, b, _) =>
      (a + b).foreach(ch => assert(!Character.isSurrogate(ch) ||
        (a + b).codePoints().toArray.forall(Character.isValidCodePoint),
        s"lone surrogate in merge ($a, $b)"))
      assert(a.codePointCount(0, a.length) >= 1 && b.codePointCount(0, b.length) >= 1)
    }
    val allSyms = driver.flatMap { case (a, b, _) => Seq(a, b, a + b) }
    allSyms.foreach { s =>
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        assert(Character.charCount(cp) == 2 || !Character.isSurrogate(s.charAt(i)),
          s"symbol '$s' contains a sheared surrogate")
        i += Character.charCount(cp)
      }
    }
    assert(dist === driver,
      "distributed and driver trainers must agree beyond the BMP")
    // the tie (🌊a vs U+E000 a, both ×4) resolved in codepoint order:
    // (e, 'a') sorts BEFORE (🌊, 'a') — U+E000 < U+1F30A
    val firstTie = driver.find(m => m._3 == 4L && m._2 == "a")
    assert(firstTie.exists(_._1 == e),
      s"tie must resolve by codepoint order, got $firstTie")
  }

  test("wordFreq matches a naive count and training ignores corpus sharding") {
    val a = Seq("low lower", "low").toDF("text")
    val b = Seq("low", "lower low").toDF("text")
    val ma = BpeTrain.trainMergesDistributed(BpeTrain.wordFreq(a, "text"), 10)
    val mb = BpeTrain.trainMergesDistributed(BpeTrain.wordFreq(b.repartition(7), "text"), 10)
    assert(ma === mb, "training must depend only on word counts, not row layout")
  }
}
