package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained quality classifier: exact-integer training is layout-
  * independent, learns the planted signal, and scores map-only. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 16

  private lazy val docs = Tables.documents(spark, SparkTestSession.sfDir)
  private def feats(df: org.apache.spark.sql.DataFrame) =
    QualityModel.features(df, "doc_id", "text", col("lang") === "en", B)

  test("training is a pure function of the corpus: repartition/order cannot move the weights") {
    val w1 = QualityModel.trainLogistic(feats(docs), B, iters = 3, lrDivPerDoc = 200.0)
    val w2 = QualityModel.trainLogistic(
      feats(docs.repartition(13).orderBy(col("doc_id").desc)), B, 3, 200.0)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.length === B + 1)
    // zero iterations → zero weights (and scoring under them is 0)
    val w0 = QualityModel.trainLogistic(feats(docs), B, iters = 0, lrDivPerDoc = 200.0)
    assert(w0.forall(_ == 0L))
  }

  test("the model learns a planted signal: near-perfect AUC, marker bucket weighted up") {
    // planted corpus: positives carry a marker token amid shared
    // noise; the trainer must push the marker's bucket positive and
    // rank positives above negatives. (The harness documents corpus
    // deliberately shares vocabulary across lang labels — t42's
    // fixture note — so the label-quality assertion lives on a
    // plantable corpus, and the REAL corpus is covered by the t45
    // oracle + the determinism test above.)
    val rnd = new scala.util.Random(5)
    val noise = Vector("the", "of", "data", "spark", "merge", "window", "row")
    val planted = (0 until 240).map { i =>
      val pos = i % 2 == 0
      val base = Seq.fill(12)(noise(rnd.nextInt(noise.length)))
      val toks = if (pos) rnd.shuffle(base ++ Seq.fill(1 + i % 3)("qualmarker")) else base
      (i.toLong, toks.mkString(" "), if (pos) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val f = QualityModel.features(planted, "doc_id", "text", col("lang") === "en", B)
      .persist()
    val w = QualityModel.trainLogistic(f, B, iters = 5, lrDivPerDoc = 200.0)
    assert(w.exists(_ != 0L), "iterations must move some weight")
    val scored = QualityModel.score(f, w)
      .select(col("y"), col("score_micro"))
      .as[(Long, Long)].collect()
    f.unpersist()
    val pos = scored.filter(_._1 == 1L).map(_._2.toDouble)
    val neg = scored.filter(_._1 == 0L).map(_._2.toDouble)
    assert(pos.sum / pos.length > neg.sum / neg.length,
      "mean score of positive docs must exceed the negatives'")
    val auc = {
      var wins = 0.0
      for (p <- pos; n <- neg) wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      wins / (pos.length.toLong * neg.length)
    }
    assert(auc > 0.95, s"AUC $auc must be near-perfect on the planted signal")
    // the marker's bucket carries the largest positive weight
    val markerBucket = (graft.functions.PortableHash.md5Long("qualmarker") % B).toInt
    assert(w(markerBucket) === w.take(B).max,
      s"marker bucket $markerBucket must carry the max weight: ${w.toSeq}")
  }

  test("token-less docs get the bias-only feature row and still score") {
    val tiny = Seq((1L, "hello world", "en"), (2L, "", "de"), (3L, "!!!", "fr"))
      .toDF("doc_id", "text", "lang")
    val f = QualityModel.features(tiny, "doc_id", "text", col("lang") === "en", B)
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    assert(f.length === 3)
    // empty/punct-only docs: all count buckets zero, bias = 1
    assert(f(1)._3.take(B).forall(_ == 0L) && f(1)._3.last === 1L)
    assert(f(2)._3.take(B).forall(_ == 0L) && f(2)._3.last === 1L)
    assert(f(0)._3.take(B).sum === 2L) // two tokens hashed somewhere
  }
}
