package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift.psiBins (dq03) — identity, hand-computed shift, clamping and
  * smoothing of empty bins. */
class DriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(ref: Seq[Long], cur: Seq[Long]) =
    Drift.psiBins(ref.toDF("v"), cur.toDF("v"), col("v"), bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("identical snapshots decompose to exactly zero everywhere") {
    val vals = (0L until 50L).map(_ % 13)
    val r = run(vals, vals)
    assert(r.size === 10)
    assert(r.forall(_._4 === 0L))
  }

  test("total shift: hand-computed micro terms in the two moved bins") {
    // ref all in bin 0 (mn=mx=0, width 1), cur all clamps to bin 9;
    // term = (10/15)·ln(21) in both moved bins, zero elsewhere
    val expected = math.round(10.0 / 15.0 * math.log(21.0) * 1e6)
    val r = run(Seq.fill(10)(0L), Seq.fill(10)(5L))
    assert(r.head === ((0L, 10L, 0L, expected)))
    assert(r.last === ((9L, 0L, 10L, expected)))
    assert(r.slice(1, 9).forall(_._4 === 0L))
  }

  test("current-side outliers clamp into the edge bins") {
    val ref = (0L until 10L) // mn 0, mx 9 → bin(v) = v
    val r = run(ref, Seq(-5L, -1L, 100L))
    assert(r.head._3 === 2L) // both low outliers in bin 0
    assert(r.last._3 === 1L) // high outlier in bin 9
    assert(r.map(_._3).sum === 3L)
  }

  test("empty bins stay finite through smoothing") {
    // ref occupies only bin 0 and 9; every middle bin is empty on
    // both sides → smoothed p's equal → exactly zero, never NaN/±inf
    val r = run(Seq(0L, 9L), Seq(0L, 9L))
    assert(r.forall(_._4 === 0L))
  }

  test("an EMPTY reference snapshot fails fast, never reports 'no drift'") {
    // min/max of an empty ref are null → every row would bin to null
    // and the gate would report all-zero PSI exactly when the
    // reference is missing; the admission gate must abort instead
    val ex = intercept[IllegalArgumentException] {
      run(Seq.empty, Seq(1L, 2L, 3L))
    }
    assert(ex.getMessage.contains("empty reference"))
  }
}
