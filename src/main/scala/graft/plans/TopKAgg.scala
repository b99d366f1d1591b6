package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate in a top-k result, ordered best-first:
  * higher score wins, ties broken by lower id (deterministic). */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k buffer: parallel arrays sorted best-first, length ≤ k.
  * Kept as a Product so the aggregation buffer rides Spark's product
  * encoder (no kryo). */
final case class TopKBuf(scores: Array[Double], ids: Array[Long])

/**
 * Bounded per-group top-k by score — the scale-safe replacement for
 * `row_number() OVER (PARTITION BY group ORDER BY score DESC)`-then-
 * filter ranking.
 *
 * The window form shuffles EVERY scored row onto one reducer per
 * group (at 100 TB of candidates: |candidates| rows onto |queries|
 * partitions — skew by construction). This aggregator is a
 * `TypedImperativeAggregate` under the hood (`udaf` wraps it as
 * ScalaAggregator), so each map task keeps at most k candidates per
 * group and the shuffle carries ≤ k × #partitions rows per group —
 * bounded regardless of candidate volume.
 *
 * Determinism: ordering is (score DESC, id ASC); an id is only
 * displaced by a strictly better (score, id) pair.
 */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[ScoredId]] {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** true when (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** Insert one candidate into a sorted bounded buffer (O(k), k small). */
  private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
    val n = b.scores.length
    if (n == k && !better(s, id, b.scores(n - 1), b.ids(n - 1))) return b
    // position of the first existing element the candidate beats
    var pos = 0
    while (pos < n && !better(s, id, b.scores(pos), b.ids(pos))) pos += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(b.scores, 0, ns, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    ns(pos) = s; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.scores, pos, ns, pos + 1, tail)
      System.arraycopy(b.ids, pos, ni, pos + 1, tail)
    }
    TopKBuf(ns, ni)
  }

  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf =
    insert(b, in._1, in._2)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var acc = a
    var i = 0
    while (i < b.scores.length) { acc = insert(acc, b.scores(i), b.ids(i)); i += 1 }
    acc
  }

  override def finish(b: TopKBuf): Seq[ScoredId] =
    b.scores.indices.map(i => ScoredId(b.scores(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAgg {
  /** Column form: `topK(5)(col("score"), col("id"))` → array<struct<score,id>>
    * sorted best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[(Double, Long)])
    (score, id) => fn(score, id)
  }
}
