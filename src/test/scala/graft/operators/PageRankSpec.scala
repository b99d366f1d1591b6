package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** PageRank.run (g01) — conservation, symmetry, dangling
  * redistribution and authority ordering on hand-checkable graphs. */
class PageRankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pr(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 5) =
    PageRank.run(
        nodes.toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst",
        iterations = iters)
      .orderBy("id")
      .as[(Long, Double)].collect().toSeq

  test("ring graph: perfect symmetry keeps every rank exactly uniform") {
    val n = 8L
    val r = pr(0L until n, (0L until n).map(i => (i, (i + 1) % n)))
    assert(r.map(_._2).distinct.size === 1)
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9)
  }

  test("dangling vertex redistributes its mass (hand-computed, 1 iteration)") {
    // 1 → 2, vertex 2 dangling. r0 = (.5, .5); D = .5
    // pr(1) = .075 + .85·(0 + .25) = .2875; pr(2) = .075 + .85·(.5 + .25)
    val r = pr(Seq(1L, 2L), Seq((1L, 2L)), iters = 1)
    assert(math.abs(r(0)._2 - 0.2875) < 1e-12)
    assert(math.abs(r(1)._2 - 0.7125) < 1e-12)
  }

  test("star graph: the hub outranks every leaf; total mass conserved") {
    val leaves = 1L to 6L
    val r = pr(0L +: leaves, leaves.map(i => (i, 0L)) ++ leaves.map(i => (0L, i)))
    val hub = r.find(_._1 == 0L).get._2
    assert(leaves.forall(i => r.find(_._1 == i).get._2 < hub))
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9)
  }

  test("isolated vertices still hold rank and the result is partition-invariant") {
    val nodes = 0L until 20L
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 1) % 20), (i, (i * 3 + 2) % 20)))
      .filter { case (a, b) => a != b }.distinct :+ ((0L, 5L))
    val a = pr(nodes, edges.distinct)
    val b = PageRank.run(
        nodes.toDF("id").repartition(7), "id",
        edges.distinct.toDF("src", "dst").repartition(5), "src", "dst", 5)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    // float sums may associate differently across partitionings — the
    // invariance bound is ulp-scale, not bitwise
    assert(a.map(_._1) === b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-12) }
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-9)
  }
}
