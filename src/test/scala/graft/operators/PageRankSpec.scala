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

  test("edges to vertices outside `nodes` are dropped — Σ pr stays 1") {
    // without the semi-join, (1,99) counts in outdeg(1) but its
    // contribution vanishes at the join-back: Σ pr < 1 silently
    val r = pr(Seq(1L, 2L), Seq((1L, 2L), (1L, 99L)), iters = 3)
    assert(math.abs(r.map(_._2).sum - 1.0) < 1e-12)
    // and the surviving edge carries FULL (not half) contribution:
    // identical to the graph that never had the phantom edge
    val clean = pr(Seq(1L, 2L), Seq((1L, 2L)), iters = 3)
    r.zip(clean).foreach { case ((_, x), (_, y)) => assert(x === y) }
  }
}

/** Hits.run (g02) — the textbook pure-hub/pure-authority star, mass
  * conservation, and ordering on a shared-authority graph. */
class HitsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hits(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 4) =
    Hits.run(nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst", iters)
      .orderBy("id")
      .as[(Long, Double, Double)].collect().toSeq

  test("star: the center is the pure hub, leaves split authority evenly") {
    val leaves = 1L to 6L
    val r = hits(0L +: leaves, leaves.map(l => (0L, l)))
    val center = r.find(_._1 == 0L).get
    assert(center._2 === 0.0) // nothing points at the center
    assert(math.abs(center._3 - 1.0) < 1e-12) // all hub mass
    leaves.foreach { l =>
      val row = r.find(_._1 == l).get
      assert(math.abs(row._2 - 1.0 / 6) < 1e-12)
      assert(row._3 === 0.0) // leaves point at nothing
    }
  }

  test("both scores conserve mass and are partition-invariant") {
    val nodes = 0L until 15L
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 1) % 15), (i, (i * 4 + 2) % 15)))
      .filter { case (a, b) => a != b }.distinct
    val a = hits(nodes, edges)
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-9)
    assert(math.abs(a.map(_._3).sum - 1.0) < 1e-9)
    val b = Hits.run(nodes.toDF("id").repartition(7), "id",
        edges.toDF("src", "dst").repartition(5), "src", "dst", 4)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    a.zip(b).foreach { case ((i1, x1, y1), (i2, x2, y2)) =>
      assert(i1 === i2)
      assert(math.abs(x1 - x2) < 1e-12 && math.abs(y1 - y2) < 1e-12)
    }
  }

  test("an authority gaining a second hub outranks a single-hub authority") {
    // 1→3, 2→3, 1→4: node 3 (two hubs) must outrank node 4 (one hub)
    val r = hits(Seq(1L, 2L, 3L, 4L), Seq((1L, 3L), (2L, 3L), (1L, 4L)))
    val auth = r.map(x => x._1 -> x._2).toMap
    assert(auth(3L) > auth(4L))
    assert(auth(1L) === 0.0 && auth(2L) === 0.0)
  }

  test("edgeless graph: all-zero scores, never NaN/Infinity") {
    val r = hits(Seq(1L, 2L, 3L), Seq.empty)
    r.foreach { case (_, a, h) =>
      assert(a === 0.0 && h === 0.0)
    }
  }
}
