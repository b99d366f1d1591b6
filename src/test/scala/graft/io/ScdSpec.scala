package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scd.scd2Apply/scd2AsOf (s19) — all four routing classes on a
  * hand-built dimension, idempotence, and the as-of read. */
class ScdSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hist(rows: Seq[(Long, String, Long, Option[Long])]) =
    rows.toDF("k", "seg", "valid_from", "valid_to")
  private def snap(rows: Seq[(Long, String)]) = rows.toDF("k", "seg")

  private val t1Hist = hist(Seq(
    (1L, "A", 100L, None), // unchanged in the snapshot
    (2L, "B", 100L, None), // will change to B2
    (3L, "C", 100L, None), // will be deleted
    (4L, "old", 50L, Some(100L)), (4L, "D", 100L, None))) // closed row rides along
  private val t2Snap = snap(Seq((1L, "A"), (2L, "B2"), (4L, "D"), (5L, "E")))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "seg", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("one apply routes all four classes correctly") {
    val merged = Scd.scd2Apply(t1Hist, t2Snap, "k", Seq("seg"), asOf = 200L)
    assert(collect(merged) === Set(
      (1L, "A", 100L, None), // unchanged: interval untouched
      (2L, "B", 100L, Some(200L)), (2L, "B2", 200L, None), // changed: close + reopen
      (3L, "C", 100L, Some(200L)), // deleted: closed
      (4L, "old", 50L, Some(100L)), (4L, "D", 100L, None), // closed history untouched
      (5L, "E", 200L, None))) // new key: opened
  }

  test("re-applying the same snapshot is a no-op (idempotence)") {
    val once = Scd.scd2Apply(t1Hist, t2Snap, "k", Seq("seg"), asOf = 200L)
    val twice = Scd.scd2Apply(once, t2Snap, "k", Seq("seg"), asOf = 300L)
    assert(collect(twice) === collect(once))
  }

  test("as-of reads reconstruct every point in time, half-open intervals") {
    val merged = Scd.scd2Apply(t1Hist, t2Snap, "k", Seq("seg"), asOf = 200L)
    // at t=150: the T1 world (key 4 already on D since 100)
    assert(collect(Scd.scd2AsOf(merged, 150L)) === Set(
      (1L, "A", 100L, None), (2L, "B", 100L, Some(200L)),
      (3L, "C", 100L, Some(200L)), (4L, "D", 100L, None)))
    // at exactly t=200 (boundary): the new world is in force
    assert(collect(Scd.scd2AsOf(merged, 200L))
      .map(r => (r._1, r._2)) === Set(
      (1L, "A"), (2L, "B2"), (4L, "D"), (5L, "E")))
    // at t=75: only key 4's first version existed
    assert(collect(Scd.scd2AsOf(merged, 75L)) === Set((4L, "old", 50L, Some(100L))))
  }

  test("null attribute values compare null-safely (no spurious churn)") {
    val h = Seq((1L, Option.empty[String], 100L, Option.empty[Long]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val s = Seq((1L, Option.empty[String])).toDF("k", "seg")
    val merged = Scd.scd2Apply(h, s, "k", Seq("seg"), asOf = 200L)
    assert(merged.count() === 1L)
    assert(merged.filter(col("valid_to").isNull).count() === 1L)
  }
}
