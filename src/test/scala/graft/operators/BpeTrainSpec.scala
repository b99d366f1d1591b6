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

  test("wordFreq matches a naive count and training ignores corpus sharding") {
    val a = Seq("low lower", "low").toDF("text")
    val b = Seq("low", "lower low").toDF("text")
    val ma = BpeTrain.trainMergesDistributed(BpeTrain.wordFreq(a, "text"), 10)
    val mb = BpeTrain.trainMergesDistributed(BpeTrain.wordFreq(b.repartition(7), "text"), 10)
    assert(ma === mb, "training must depend only on word counts, not row layout")
  }
}
