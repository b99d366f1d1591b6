package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-count sketch: exact when under-full, accurate within
  * the published error bound when estimating, and — the property the
  * oracle depends on — a pure function of the value SET (layout,
  * order, and duplication invariant). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(n: Int, g: String = "a") =
    (1 to n).map(i => (g, s"v$i")).toDF("g", "v")

  test("under-full sketch counts exactly") {
    val out = Sketches.kmvDistinct(dist(20), Seq("g"), "v", k = 32)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 20L, 20L)))
  }

  test("duplicates never change the sketch or the estimate") {
    val base = dist(20)
    val dup = base.union(base).union(base)
    val a = Sketches.kmvDistinct(base, Seq("g"), "v", k = 32).collect().toSeq
    val b = Sketches.kmvDistinct(dup, Seq("g"), "v", k = 32).collect().toSeq
    assert(a === b)
  }

  test("estimate within 3/sqrt(k-2) relative error at 10k distinct") {
    val n = 10000
    val Seq((_, kept, est)) = Sketches.kmvDistinct(dist(n), Seq("g"), "v", k = 128)
      .as[(String, Long, Long)].collect().toSeq
    assert(kept === 128L)
    val relErr = math.abs(est.toDouble - n) / n
    assert(relErr < 3.0 / math.sqrt(126.0),
      s"estimate $est for true $n: rel err $relErr outside 3-sigma bound")
  }

  test("layout-independent: repartition and input order cannot move the estimate") {
    val df = dist(5000, "x").union(dist(300, "y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(d, Seq("g"), "v", k = 64)
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val a = run(df)
    assert(a === run(df.repartition(17)))
    assert(a === run(df.orderBy(col("v").desc)))
  }

  test("sketch merge across a union equals the sketch of the union (mergeable synopsis)") {
    // Persist per-batch sketches as plain arrays, re-aggregate by
    // exploding — the incremental-history pattern — and compare to the
    // one-shot sketch over the concatenated corpus.
    val b1 = dist(500).filter(col("v") < "v5")
    val b2 = dist(500).filter(col("v") >= "v5")
    val agg = Sketches.kMinDistinct(16)
    val perBatch = Seq(b1, b2).map(
      _.select(col("g"), graft.functions.ScalarFunctions.md5Long(col("v")).as("h"))
        .groupBy("g").agg(agg(col("h")).as("ks")))
    val merged = Sketches
      .mergeSketches(perBatch.reduce(_ union _), Seq("g"), "ks", k = 16)
      .as[(String, Seq[Long])].collect().toMap
    val oneShot = b1.union(b2)
      .select(col("g"), graft.functions.ScalarFunctions.md5Long(col("v")).as("h"))
      .groupBy("g").agg(agg(col("h")).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === oneShot)
  }

  test("kmvOverlapMatrix: exact when under-full, within bound when estimating") {
    // planted overlap: |A|=60, |B|=50, |A∩B|=20 (v41..v60)
    val a = (1 to 60).map(i => ("A", s"v$i")).toDF("g", "v")
    val b = (41 to 90).map(i => ("B", s"v$i")).toDF("g", "v")
    // k=128 > all set sizes → sketches hold the full hash sets → exact
    val ex = Sketches.kmvOverlapMatrix(a.union(b), "g", "v", k = 128)
      .as[(String, String, Long, Long, Long, Long, Long, Double)].collect()
    assert(ex.length === 1)
    val (g1, g2, estA, estB, estU, nInter, estI, jac) = ex.head
    assert((g1, g2) === ("A", "B"))
    assert((estA, estB, estU) === (60L, 50L, 90L))
    assert(nInter === 20L && estI === 20L)
    assert(math.abs(jac - 20.0 / 90.0) < 1e-6)

    // estimating regime: 3000 vs 2500 with 1000 shared, k=256
    val bigA = (1 to 3000).map(i => ("A", s"u$i")).toDF("g", "v")
    val bigB = (2001 to 4500).map(i => ("B", s"u$i")).toDF("g", "v")
    val es = Sketches.kmvOverlapMatrix(bigA.union(bigB), "g", "v", k = 256)
      .as[(String, String, Long, Long, Long, Long, Long, Double)].collect().head
    val (_, _, eA, eB, eU, _, eI, _) = es
    def relOk(est: Long, truth: Double, sig: Double = 4.0) =
      math.abs(est - truth) / truth < sig / math.sqrt(254.0)
    assert(relOk(eA, 3000), s"est_a $eA")
    assert(relOk(eB, 2500), s"est_b $eB")
    assert(relOk(eU, 4500), s"est_union $eU")
    // intersection estimator compounds two estimates — wider bound
    assert(math.abs(eI - 1000) / 1000.0 < 0.5, s"est_inter $eI for true 1000")

    // disjoint sets → zero intersection, zero jaccard
    val dj = Sketches.kmvOverlapMatrix(
        (1 to 100).map(i => ("A", s"a$i")).toDF("g", "v")
          .union((1 to 100).map(i => ("B", s"b$i")).toDF("g", "v")),
        "g", "v", k = 64)
      .as[(String, String, Long, Long, Long, Long, Long, Double)].collect().head
    assert(dj._6 === 0L && dj._7 === 0L && dj._8 === 0.0)

    // layout-invariance: the matrix is a pure function of the sets
    val shuffled = Sketches.kmvOverlapMatrix(
      bigA.union(bigB).union(bigA).repartition(13), "g", "v", k = 256)
      .as[(String, String, Long, Long, Long, Long, Long, Double)].collect().head
    assert(shuffled === es)

    // the G²/2 pair join is guarded: too many groups fails fast
    val many = (1 to 50).map(i => (s"g$i", "x")).toDF("g", "v")
    val e2 = intercept[IllegalArgumentException] {
      Sketches.kmvOverlapMatrix(many, "g", "v", k = 8, maxGroups = 10)
    }
    assert(e2.getMessage.contains("pairwise matrix"))
  }

  // ── Count-Min sketch ────────────────────────────────────────────

  /** Zipf-ish multiset: item i appears ceil(n/i) times. */
  private def zipf(items: Int, n: Int) =
    (1 to items).flatMap(i => Seq.fill(math.ceil(n.toDouble / i).toInt)(s"item$i"))
      .toDF("v")

  test("CMS: estimate >= true count always; unseen items within collision mass; bounded size") {
    val (d, w) = (4, 64)
    val df = zipf(200, 500)
    val n = df.count()
    val sk = Sketches.cmsBuild(df, "v", d, w)
    assert(sk.count() <= d.toLong * w, "sketch exceeded depth*width cells")
    // every cell row index in range, every counter positive
    val rng = sk.agg(min("r"), max("r"), min("b"), max("b"), min("c"))
      .as[(Int, Int, Long, Long, Long)].head()
    assert(rng._1 >= 0 && rng._2 < d && rng._3 >= 0 && rng._4 < w && rng._5 > 0)

    val truth = df.groupBy("v").count().as[(String, Long)].collect().toMap
    val items = (1 to 200).map(i => s"item$i").toDF("v")
      .union(Seq("never-seen-a", "never-seen-b").toDF("v"))
    val est = Sketches.cmsEstimate(sk, items, "v", d, w)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (v, t) =>
      assert(est(v) >= t, s"$v: CMS $est must never under-count (true $t)")
    }
    // empirical accuracy on the fixture: within the e/w * N additive
    // band (deterministic here — the hashes are fixed). Unseen items
    // have true count 0, so the same band caps their collision mass.
    val eps = math.E / w
    val truthAll = truth ++ Map("never-seen-a" -> 0L, "never-seen-b" -> 0L)
    truthAll.foreach { case (v, t) =>
      assert(est(v) <= t + math.ceil(eps * n).toLong,
        s"$v: est ${est(v)} above true $t + eps*N")
    }
  }

  test("CMS merge of disjoint-slice partials equals the one-shot sketch exactly") {
    val (d, w) = (4, 32)
    val df = zipf(100, 300)
    val slices = Seq(
      df.filter(length(col("v")) <= 6), // item1..item9
      df.filter(length(col("v")) === 7),
      df.filter(length(col("v")) >= 8))
    val merged = Sketches.cmsMerge(
      slices.map(s => Sketches.cmsBuild(s, "v", d, w)).reduce(_ union _))
      .as[(Int, Long, Long)].collect().toSet
    val oneShot = Sketches.cmsBuild(df, "v", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === oneShot)
  }

  test("CMS seeded sweep: est >= true on random multisets across (depth, width) shapes") {
    val rnd = new scala.util.Random(31337)
    for ((d, w) <- Seq((2, 16), (4, 64), (6, 128))) {
      val items = Seq.fill(800)(s"k${rnd.nextInt(120)}").toDF("v")
      val truth = items.groupBy("v").count().as[(String, Long)].collect().toMap
      val sk = Sketches.cmsBuild(items, "v", d, w)
      val est = Sketches.cmsEstimate(sk, truth.keys.toSeq.toDF("v"), "v", d, w)
        .as[(String, Long)].collect().toMap
      truth.foreach { case (v, t) =>
        assert(est(v) >= t, s"(d=$d,w=$w) $v: est ${est(v)} < true $t")
      }
    }
  }

  test("CMS is layout- and order-invariant (pure function of the multiset)") {
    val (d, w) = (3, 16)
    val df = zipf(50, 100)
    val a = Sketches.cmsBuild(df, "v", d, w).as[(Int, Long, Long)].collect().toSet
    val b = Sketches.cmsBuild(df.repartition(13).orderBy(desc("v")), "v", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
  }
}
