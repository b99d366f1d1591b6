package graft.io

import graft.SparkTestSession
import graft.operators.{Hits, PageRank}
import org.scalatest.funsuite.AnyFunSuite

/** EdgeStore lifecycle — the incremental-upsert contract (a crawl
  * appends edges daily): a snapshot written in two installments must
  * rank identically to one fresh write of the union, the recorded
  * vertex universe must guard the preIndexed fast paths, and a shrunk
  * universe must be rejected. */
class EdgeStoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_es_$tag")
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private val nodes = (0L until 30L).toDF("id")
  private val allEdges = (0L until 30L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 30), (i, (i * 3 + 2) % 30), (i, (i * 11 + 5) % 30)))
    .filter { case (a, b) => a != b }.distinct

  test("write + upsert equals one fresh write of the union (PageRank and HITS)") {
    val (day1, day2) = allEdges.partition { case (a, b) => (a + b) % 2 == 0 }
    val incr = tmpPath("incr")
    EdgeStore.write(incr, nodes, "id", day1.toDF("src", "dst"), "src", "dst")
    EdgeStore.upsert(incr, nodes, "id", day2.toDF("src", "dst"), "src", "dst")
    val fresh = tmpPath("fresh")
    EdgeStore.write(fresh, nodes, "id", allEdges.toDF("src", "dst"), "src", "dst")

    val prA = PageRank.runIndexed(nodes, "id", incr, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val prB = PageRank.runIndexed(nodes, "id", fresh, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(prA.map(_._1) === prB.map(_._1))
    prA.zip(prB).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-12) }
    assert(math.abs(prA.map(_._2).sum - 1.0) < 1e-9)

    val hA = Hits.runIndexed(nodes, "id", incr, iterations = 3)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    val hB = Hits.runIndexed(nodes, "id", fresh, iterations = 3)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    hA.zip(hB).foreach { case ((i1, a1, u1), (i2, a2, u2)) =>
      assert(i1 === i2)
      assert(math.abs(a1 - a2) < 1e-12 && math.abs(u1 - u2) < 1e-12)
    }
  }

  test("upsert closes new edges against the (possibly grown) vertex set") {
    val path = tmpPath("closure")
    EdgeStore.write(path, (0L until 10L).toDF("id"), "id",
      Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"), "src", "dst")
    // day 2 registers vertex 10 and brings one edge to a NEVER-known
    // vertex 99 — the closure must drop it, keep the (2,10) edge
    val grown = (0L until 11L).toDF("id")
    EdgeStore.upsert(path, grown, "id",
      Seq((2L, 10L), (3L, 99L)).toDF("src", "dst"), "src", "dst")
    assert(EdgeStore.vertexCount(spark, path) === Some(11L))
    val stored = EdgeStore.bySrc(spark, path)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(stored === Set((0L, 1L), (1L, 2L), (2L, 10L)))
    // ranking over the grown universe still conserves mass
    val pr = PageRank.runIndexed(grown, "id", path, iterations = 3)
      .agg(org.apache.spark.sql.functions.sum("pr")).as[Double].head()
    assert(math.abs(pr - 1.0) < 1e-9)
  }

  test("a shrunk vertex set is rejected at upsert; a foreign universe at runIndexed") {
    val path = tmpPath("guard")
    EdgeStore.write(path, nodes, "id",
      allEdges.toDF("src", "dst"), "src", "dst")
    val shrunk = (0L until 20L).toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      EdgeStore.upsert(path, shrunk, "id",
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
    }
    assert(e1.getMessage.contains("shrank"))
    // the preIndexed guard: a filtered nodes frame would re-open the
    // closure hole (out-of-set edges inflate outdegrees) — loud, not
    // silent (ADVICE r14)
    val e2 = intercept[IllegalArgumentException] {
      PageRank.runIndexed(shrunk, "id", path, iterations = 2)
    }
    assert(e2.getMessage.contains("write-time"))
    val e3 = intercept[IllegalArgumentException] {
      Hits.runIndexed(shrunk, "id", path, iterations = 2)
    }
    assert(e3.getMessage.contains("write-time"))
  }

  test("a SAME-COUNT different node set is rejected (checksum, not just count)") {
    val path = tmpPath("sig")
    EdgeStore.write(path, nodes, "id", allEdges.toDF("src", "dst"), "src", "dst")
    assert(EdgeStore.vertexSig(spark, path).isDefined)
    // 30 vertices either way — the r15 count-only guard's blind spot
    val swapped = ((0L until 29L) :+ 999L).toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      EdgeStore.upsert(path, swapped, "id",
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
    }
    assert(e1.getMessage.contains("swapped"))
    val e2 = intercept[IllegalArgumentException] {
      PageRank.runIndexed(swapped, "id", path, iterations = 2)
    }
    assert(e2.getMessage.contains("same-sized substitute"))
    val e3 = intercept[IllegalArgumentException] {
      Hits.runIndexed(swapped, "id", path, iterations = 2)
    }
    assert(e3.getMessage.contains("same-sized substitute"))
    // the genuine universe still passes both guards
    assert(PageRank.runIndexed(nodes, "id", path, iterations = 2).count() === 30L)
    // and a genuinely GROWN universe still upserts (checksum advances)
    val grown = (0L until 31L).toDF("id")
    EdgeStore.upsert(path, grown, "id",
      Seq((5L, 30L)).toDF("src", "dst"), "src", "dst")
    assert(EdgeStore.vertexCount(spark, path) === Some(31L))
    assert(PageRank.runIndexed(grown, "id", path, iterations = 2).count() === 31L)
    // the GROWN-BUT-SWAPPED case (count+checksum cannot catch it —
    // the persisted vertex set can): 33 > 31 vertices, but id 29 was
    // dropped along the way — a stored vertex outside the new
    // universe must fail loudly
    val grownSwapped = ((0L until 29L) ++ Seq(30L, 100L, 101L, 102L)).toDF("id")
    val e4 = intercept[IllegalArgumentException] {
      EdgeStore.upsert(path, grownSwapped, "id",
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
    }
    assert(e4.getMessage.contains("missing stored"))
    // the honest grown universe still passes after the rejected try
    EdgeStore.upsert(path, (0L until 33L).toDF("id"), "id",
      Seq((31L, 32L)).toDF("src", "dst"), "src", "dst")
    assert(EdgeStore.vertexCount(spark, path) === Some(33L))
  }

  test("foreachBatch ingestion: streamed daily edge upserts equal one fresh write") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the daily-crawl cadence as a live feed over the persisted store
    // (the MediaIndex/DedupIndex streaming discipline): each batch of
    // crawled edges upserts against the standing universe; ranks over
    // the streamed store must equal one fresh write of the union
    val path = tmpPath("stream")
    val (day1, rest) = allEdges.partition { case (a, b) => (a + b) % 3 == 0 }
    val (day2, day3) = rest.partition { case (a, b) => (a * b) % 2 == 0 }
    EdgeStore.write(path, nodes, "id", day1.toDF("src", "dst"), "src", "dst")
    val input = MemoryStream[(Long, Long)]
    val query = input.toDF().toDF("src", "dst").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        EdgeStore.upsert(path, nodes, "id", batch.toDF(), "src", "dst")
        ()
      }
      .start()
    try {
      Seq(day2, day3).foreach { d => input.addData(d); query.processAllAvailable() }
    } finally query.stop()

    val fresh = tmpPath("stream_fresh")
    EdgeStore.write(fresh, nodes, "id", allEdges.toDF("src", "dst"), "src", "dst")
    val prA = PageRank.runIndexed(nodes, "id", path, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val prB = PageRank.runIndexed(nodes, "id", fresh, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(prA.map(_._1) === prB.map(_._1))
    prA.zip(prB).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-12) }
  }

  test("compact: fewer files, identical ranks, one atomic publish, grace window") {
    val path = tmpPath("cmp")
    val (day1, rest) = allEdges.partition { case (a, b) => (a + b) % 3 == 0 }
    val (day2, day3) = rest.partition { case (a, b) => (a * b) % 2 == 0 }
    EdgeStore.write(path, nodes, "id", day1.toDF("src", "dst"), "src", "dst")
    EdgeStore.upsert(path, nodes, "id", day2.toDF("src", "dst"), "src", "dst")
    EdgeStore.upsert(path, nodes, "id", day3.toDF("src", "dst"), "src", "dst")
    val prBefore = PageRank.runIndexed(nodes, "id", path, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val hBefore = Hits.runIndexed(nodes, "id", path, iterations = 3)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq

    val report = EdgeStore.compact(spark, path)
    assert(report.filesAfter < report.filesBefore, s"$report")
    // each copy is back to exactly `buckets` (8) files
    assert(report.filesAfter === 16L, s"$report")

    val prAfter = PageRank.runIndexed(nodes, "id", path, iterations = 4)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    prBefore.zip(prAfter).foreach { case ((i1, x), (i2, y)) =>
      assert(i1 === i2); assert(math.abs(x - y) < 1e-12)
    }
    val hAfter = Hits.runIndexed(nodes, "id", path, iterations = 3)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    hBefore.zip(hAfter).foreach { case ((i1, a1, u1), (i2, a2, u2)) =>
      assert(i1 === i2)
      assert(math.abs(a1 - a2) < 1e-12 && math.abs(u1 - u2) < 1e-12)
    }
    // the recorded universe carried through the compaction commit
    assert(EdgeStore.vertexCount(spark, path) === Some(30L))
    assert(EdgeStore.vertexSig(spark, path).isDefined)
    // grace window: the superseded snapshot survives one cycle, the
    // next maintenance run reclaims it; upserts keep landing on the
    // compacted snapshot
    assert(new java.io.File(s"$path/by_src/v1").exists())
    assert(new java.io.File(s"$path/by_dst/v1").exists())
    EdgeStore.compact(spark, path)
    assert(!new java.io.File(s"$path/by_src/v1").exists())
    assert(!new java.io.File(s"$path/by_dst/v1").exists())
    EdgeStore.upsert(path, nodes, "id",
      Seq((0L, 29L)).toDF("src", "dst"), "src", "dst")
    assert(EdgeStore.bySrc(spark, path)
      .select("src", "dst").as[(Long, Long)].collect().toSet
      .contains((0L, 29L)))
  }
}
