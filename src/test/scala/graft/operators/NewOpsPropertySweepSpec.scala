package graft.operators

import graft.SparkTestSession
import graft.io.Scd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded property sweeps over the late-r12 operators — randomized
  * inputs, algebraic invariants (the round-11 sweep pattern). Every
  * generator is seeded, so a failure replays deterministically. */
class NewOpsPropertySweepSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("winnowing guarantee sweep: planted shared runs always share a fingerprint") {
    val rnd = new Random(4242)
    val k = 5; val w = 4
    def words(n: Int) = (0 until n).map(_ => s"w${rnd.nextInt(400)}")
    // 15 random pairs, each sharing a planted run of exactly w+k-1 tokens
    val docs = (0 until 15).flatMap { i =>
      val shared = (0 until w + k - 1).map(j => s"sh${i}x$j")
      Seq((i * 2L, (words(20) ++ shared ++ words(7)).mkString(" ")),
        (i * 2L + 1, (words(5) ++ shared ++ words(22)).mkString(" ")))
    }
    val fps = Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .select("doc_id", "fp_hash").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 15).foreach { i =>
      assert((fps(i * 2L) intersect fps(i * 2L + 1)).nonEmpty,
        s"pair $i shares a ${w + k - 1}-token run but no fingerprint")
    }
    // density bound: every doc selects between 1/w and 1 of its grams
    val sums = Winnowing.summary(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .select("density").as[Double].collect()
    assert(sums.forall(d => d >= 1.0 / w - 1e-9 && d <= 1.0 + 1e-9))
  }

  test("pagerank sweep: mass 1, strictly positive, fully-linked dominates isolated") {
    val rnd = new Random(77)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 5
      val nodes = (0L until n.toLong)
      val edges = nodes.flatMap(i =>
        (0 until 2 + rnd.nextInt(2)).map(_ => (i, rnd.nextInt(n - 1).toLong)))
        .filter { case (a, b) => a != b }.distinct ++
        nodes.filter(_ != n - 1L).map(i => (i, n - 1L)) // everyone links the last node
      val r = PageRank.run(nodes.toDF("id"), "id",
          edges.distinct.toDF("src", "dst"), "src", "dst", iterations = 5)
        .as[(Long, Double)].collect().toMap
      assert(math.abs(r.values.sum - 1.0) < 1e-9, s"trial $trial mass")
      assert(r.values.forall(_ > 0.0), s"trial $trial teleport floor")
      assert(r(n - 1L) === r.values.max, s"trial $trial: the universally-linked node wins")
    }
  }

  test("hits sweep: both scores conserve mass on random graphs") {
    val rnd = new Random(99)
    for (trial <- 0 until 3) {
      val n = 10 + trial * 4
      val nodes = (0L until n.toLong)
      val edges = nodes.flatMap(i =>
        (0 until 2).map(_ => (i, rnd.nextInt(n).toLong)))
        .filter { case (a, b) => a != b }.distinct
      val r = Hits.run(nodes.toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst", iterations = 4)
        .as[(Long, Double, Double)].collect()
      assert(math.abs(r.map(_._2).sum - 1.0) < 1e-9)
      assert(math.abs(r.map(_._3).sum - 1.0) < 1e-9)
    }
  }

  test("ewma sweep: bounded by the horizon's min/max, constant is a fixed point") {
    val rnd = new Random(1234)
    val vals = (0 until 200).map(_ => rnd.nextInt(1000).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "i", "v")
    val r = Rolling.ewma(df, col("k"), Seq(col("i")), col("v"), half = 12)
      .orderBy("i").select("v", "ewma").as[(Long, Double)].collect()
    r.zipWithIndex.foreach { case ((_, e), i) =>
      val window = vals.slice(math.max(0, i - 11), i + 1)
      assert(e >= window.min - 1e-6 && e <= window.max + 1e-6,
        s"row $i: ewma $e outside [${window.min}, ${window.max}]")
    }
  }

  test("mad sweep: mad <= half the range, median inside it, outlier-stable") {
    val rnd = new Random(5150)
    for (trial <- 0 until 3) {
      val base = (0 until 50).map(_ => rnd.nextInt(100).toLong)
      val withOutlier = base :+ 1000000L
      val df = (base.map(("clean", _)) ++ withOutlier.map(("dirty", _)))
        .toDF("g", "v")
      val r = Quantiles.groupedMad(df, "g", "v")
        .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
      val (_, _, medC, madC) = r("clean")
      assert(medC >= base.min && medC <= base.max)
      assert(madC <= (base.max - base.min))
      // ONE outlier in 51 rows moves the integer MAD by at most 1
      // rank position worth of value — assert it stays in the clean range
      assert(r("dirty")._4 <= (base.max - base.min))
    }
  }

  test("psi sweep: every term non-negative, identity is exactly zero") {
    val rnd = new Random(31337)
    for (trial <- 0 until 3) {
      val a = (0 until 300).map(_ => rnd.nextInt(500).toLong)
      val b = (0 until 300).map(_ => (rnd.nextInt(400) + trial * 40).toLong)
      val terms = Drift.psiBins(a.toDF("v"), b.toDF("v"), col("v"), bins = 10)
        .select("psi_term_micro").as[Long].collect()
      // (pc − pr)·ln(pc/pr) ≥ 0 for every bin, by convexity
      assert(terms.forall(_ >= 0L), s"trial $trial: negative PSI term")
      val ident = Drift.psiBins(a.toDF("v"), a.toDF("v"), col("v"), bins = 10)
        .select("psi_term_micro").as[Long].collect()
      assert(ident.forall(_ === 0L))
    }
  }

  test("nearest as-of sweep: never farther than either direction alone") {
    val rnd = new Random(8080)
    val left = (0 until 120).map(i => (i % 5L, 1000L + rnd.nextInt(100000), i.toLong))
      .toDF("k", "t", "lid").withColumn("lts", timestamp_seconds(col("t"))).drop("t")
    val right = (0 until 60).map(i => (i % 5L, 1000L + rnd.nextInt(100000), 100L + i))
      .toDF("k", "t", "pay").withColumn("rts", timestamp_seconds(col("t"))).drop("t")
    def dists(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lid"),
          abs(unix_micros(col("lts")) - unix_micros(col("matched_ts"))).as("d"))
        .as[(Long, Option[Long])].collect().toMap
    val b = dists(AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("pay")))
    val f = dists(AsOfJoin.forward(left, right, "k", "lts", "rts", Seq("pay")))
    val nr = dists(AsOfJoin.nearest(left, right, "k", "lts", "rts", Seq("pay")))
    nr.foreach { case (lid, nd) =>
      val best = Seq(b(lid), f(lid)).flatten
      if (best.nonEmpty) assert(nd.contains(best.min), s"lid $lid")
      else assert(nd.isEmpty)
    }
  }

  test("scd2 sweep: apply-then-as-of round-trips every random snapshot") {
    val rnd = new Random(2024)
    var hist = Seq.empty[(Long, String, Long, Option[Long])]
      .toDF("k", "seg", "valid_from", "valid_to")
    var t = 100L
    for (_ <- 0 until 4) {
      val snap = (0 until 30).flatMap { _ =>
        val k = rnd.nextInt(20).toLong
        Some(k -> s"v${rnd.nextInt(5)}")
      }.toMap.toSeq
      hist = Scd.scd2Apply(hist, snap.toDF("k", "seg"), "k", Seq("seg"), t)
        .localCheckpoint(true)
      // the as-of read AT the apply time reproduces the snapshot exactly
      val asOf = Scd.scd2AsOf(hist, t)
        .select("k", "seg").as[(Long, String)].collect().toSet
      assert(asOf === snap.toSet, s"round-trip at t=$t")
      t += 100L
    }
    // intervals never overlap per key
    val rows = hist.as[(Long, String, Long, Option[Long])].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, bb) => assert(a._4.exists(_ <= bb._3), s"overlap at key ${a._1}")
        case _ => ()
      }
    }
  }
}
