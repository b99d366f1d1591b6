package graft.operators

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: weights must move TOWARD the target
  * domain, degenerate cases must be exact, and selection must be
  * layout-independent. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val docs = Tables.documents(spark, SparkTestSession.sfDir)
  import spark.implicits._

  test("target-domain docs carry higher importance weight on average") {
    val micro = Dsir.microLogRatios(
      Dsir.bucketCounts(docs.filter(col("lang") === "en"), "text", 256),
      Dsir.bucketCounts(docs, "text", 256))
    val scored = Dsir.importanceScores(docs, "doc_id", "text", micro, 256)
      .join(docs.select("doc_id", "lang"), "doc_id")
      // per-bigram mean weight, so long docs don't dominate
      .filter(col("n_bigrams") > 0)
      .select(col("lang"), (col("logw_micro").cast("double") / col("n_bigrams")).as("w"))
      .groupBy(col("lang") === "en").agg(avg("w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) > scored(false),
      s"en mean per-bigram weight ${scored(true)} must beat non-en ${scored(false)}")
  }

  test("target == raw degenerates to exact-zero weights (selection = pure Gumbel)") {
    val sel = Dsir.resampleTopK(docs, docs, "doc_id", "text", b = 256, k = 50)
    assert(sel.count() === 50)
    assert(sel.filter(col("logw_micro") =!= 0L).count() === 0,
      "identical distributions must give log-ratio exactly 0 in every bucket")
  }

  test("selection is deterministic and independent of corpus layout") {
    val en = docs.filter(col("lang") === "en")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.resampleTopK(d, en, "doc_id", "text", b = 256, k = 30)
        .select("doc_id", "logw_micro", "key_micro")
        .as[(Long, Long, Long)].collect().toSeq
    val a = run(docs)
    assert(a === run(docs.repartition(13)), "repartition must not change selection")
    assert(a === run(docs), "re-run must be identical")
    assert(a.map(_._3) === a.map(_._3).sorted.reverse, "output ordered by key desc")
  }

  test("resampleTopKWithin (one hash pass) equals resampleTopK (separate passes) exactly") {
    val a = Dsir.resampleTopK(docs, docs.filter(col("lang") === "en"),
      "doc_id", "text", b = 256, k = 40)
    val b = Dsir.resampleTopKWithin(docs, col("lang") === "en",
      "doc_id", "text", b = 256, k = 40)
    assert(a.exceptAll(b.select(a.columns.map(col): _*)).count() === 0)
    assert(b.select(a.columns.map(col): _*).exceptAll(a).count() === 0)
  }

  test("empty and one-token docs score zero bigrams / zero weight but stay eligible") {
    val tiny = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "solo"), (4L, "  "))
      .toDF("doc_id", "text")
    val scored = Dsir.importanceScores(
      tiny, "doc_id", "text",
      Dsir.microLogRatios(Array.fill(8)(1L), Array.fill(8)(2L)), 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(scored(1L)._1 === 2L) // two bigrams
    assert(scored(2L) === (0L, 0L))
    assert(scored(3L) === (0L, 0L))
    assert(scored(4L) === (0L, 0L))
    // all four still get Gumbel keys — top-4 returns everyone
    assert(Dsir.resampleTopK(tiny, tiny.limit(1), "doc_id", "text", 8, 4).count() === 4)
  }
}
