package graft.io

import graft.SparkTestSession
import graft.functions.ZOrder
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-skipping layout writers: range-clustered and Z-ordered parquet.
  * The contract under test is the STATISTICS layout — per-file min/max
  * on the cluster dimensions — because that is exactly what parquet
  * predicate pushdown uses to skip files at scale. */
class ClusteredWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val events = Tables.events(spark, SparkTestSession.sfDir)
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def dataFiles(path: String): Seq[String] = {
    val d = new java.io.File(path)
    d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
  }

  /** Per-file [min, max] of a LONG column, read back per file. */
  private def fileRanges(files: Seq[String], c: String): Seq[(Long, Long)] =
    files.map { f =>
      spark.read.parquet(f).agg(min(col(c)), max(col(c)))
        .as[(Long, Long)].head()
    }

  test("writeClustered: content-identical, requested file count, disjoint per-file key ranges") {
    val out = tmp("graft_clustered_")
    val in = events.select("event_id", "user_id")
    Sinks.writeClustered(in, out, Seq("user_id"), numFiles = 8)

    val files = dataFiles(out)
    assert(files.size === 8)
    val back = spark.read.parquet(out)
    assert(back.count() === in.count())
    assert(back.exceptAll(in).count() === 0 && in.exceptAll(back).count() === 0)

    // range partitioning ⇒ per-file [min,max] intervals are pairwise
    // non-nested: sorted by min, each file's max must not exceed the
    // next file's max, and overlap is possible only at a shared
    // boundary VALUE (rows equal to a range boundary land on one side)
    val ranges = fileRanges(files, "user_id").sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((lo1, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: [$lo1,$hi1] then [$lo2,...]")
      case _ =>
    }
  }

  test("ZOrder.interleave matches a bit-twiddling reference; bucketIndex clamps and bins") {
    // reference Morton interleave in plain Scala
    def ref(bs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits; j <- bs.indices)
        z |= ((bs(j) >> b) & 1L) << (b * bs.length + j)
      z
    }
    val cases = Seq(Seq(0L, 0L), Seq(1L, 0L), Seq(0L, 1L), Seq(3L, 5L),
      Seq(255L, 255L), Seq(170L, 85L))
    val got = cases.map { bs =>
      spark.range(1).select(
        ZOrder.interleave(bs.map(lit(_)), bits = 8)).as[Long].head()
    }
    assert(got === cases.map(ref(_, 8)))

    // 3-dim case
    assert(spark.range(1).select(
      ZOrder.interleave(Seq(lit(1L), lit(1L), lit(1L)), 4)).as[Long].head() === 7L)

    // bucketIndex: lo→0, hi→clamped top bucket, below/above clamp
    val bi = spark.range(1).select(
      ZOrder.bucketIndex(lit(0.0), 0.0, 10.0, 3),
      ZOrder.bucketIndex(lit(10.0), 0.0, 10.0, 3),
      ZOrder.bucketIndex(lit(-5.0), 0.0, 10.0, 3),
      ZOrder.bucketIndex(lit(99.0), 0.0, 10.0, 3),
      ZOrder.bucketIndex(lit(4.9), 0.0, 10.0, 3)).as[(Long, Long, Long, Long, Long)].head()
    assert(bi === ((0L, 7L, 0L, 7L, 3L)))
    // degenerate range: everything in bucket 0
    assert(spark.range(1).select(
      ZOrder.bucketIndex(lit(42.0), 7.0, 7.0, 3)).as[Long].head() === 0L)
  }

  test("ZOrder property sweep: interleave matches reference on random inputs; per-axis monotone") {
    val rnd = new scala.util.Random(1234)
    def ref(bs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits; j <- bs.indices)
        z |= ((bs(j) >> b) & 1L) << (b * bs.length + j)
      z
    }
    // 60 random (2- and 3-dim) bucket tuples vs the reference
    for (_ <- 1 to 30) {
      val dims = 2 + rnd.nextInt(2)
      val bits = 4 + rnd.nextInt(9) // 4..12
      val bs = Seq.fill(dims)(rnd.nextLong(1L << bits))
      val got = spark.range(1)
        .select(ZOrder.interleave(bs.map(lit(_)), bits)).as[Long].head()
      assert(got === ref(bs, bits), s"dims=$dims bits=$bits bs=$bs")
    }
    // monotone along each axis with the other fixed: the property
    // range clustering relies on (greater bucket => greater z)
    val fixed = 37L
    val zs = spark.range(1).select(
      (0L until 16L).map(v => ZOrder.interleave(Seq(lit(v), lit(fixed)), 4)): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(zs === zs.sorted && zs.distinct.size === zs.size, s"axis-0 not monotone: $zs")
    val zs2 = spark.range(1).select(
      (0L until 16L).map(v => ZOrder.interleave(Seq(lit(fixed % 16), lit(v)), 4)): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(zs2 === zs2.sorted && zs2.distinct.size === zs2.size, s"axis-1 not monotone: $zs2")
  }

  test("writeZOrdered: content-identical and BOTH dimensions' per-file ranges stay tight") {
    val in = events.select(col("event_id"), col("user_id"),
      unix_timestamp(col("ts")).as("ts_s"))
    val nFiles = 8

    val zOut = tmp("graft_zorder_")
    Sinks.writeZOrdered(in, zOut, Seq("user_id", "ts_s"), numFiles = nFiles, bits = 10)
    val back = spark.read.parquet(zOut)
    assert(back.count() === in.count())
    assert(back.exceptAll(in).count() === 0 && in.exceptAll(back).count() === 0)

    // baseline: the same data round-robin'd (what compaction without
    // clustering produces) — each file spans ~the full range of BOTH
    // dims, so nothing is skippable
    val rrOut = tmp("graft_rr_")
    in.repartition(nFiles).write.mode("overwrite").parquet(rrOut)

    def meanSpan(path: String, c: String): Double = {
      val rs = fileRanges(dataFiles(path), c)
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    }
    for (dim <- Seq("user_id", "ts_s")) {
      val z = meanSpan(zOut, dim)
      val rr = meanSpan(rrOut, dim)
      // each dimension individually must be materially tighter than
      // the unclustered layout — that tightness IS file skipping
      assert(z < 0.75 * rr, s"$dim: z-order mean span $z not < 0.75 * round-robin $rr")
    }
  }

  test("compactParquetZOrdered: one pass gives BOTH sized files and a skippable layout") {
    val inDir = tmp("graft_optz_in_")
    val outDir = tmp("graft_optz_out_")
    val in = events.select(col("event_id"), col("user_id"),
      unix_timestamp(col("ts")).as("ts_s"))
    in.repartition(64).write.mode("overwrite").parquet(inDir) // fragmented
    val n = Sinks.compactParquetZOrdered(spark, inDir, outDir,
      Seq("user_id", "ts_s"), targetBytes = 12L * 1024)
    val files = dataFiles(outDir)
    assert(files.size === n && n < 64 && n > 4,
      s"expected consolidation into several files, got $n")
    // content survives exactly
    val back = spark.read.parquet(outDir)
    assert(back.exceptAll(in).count() === 0 && in.exceptAll(back).count() === 0)
    // and the layout is clustered: with log2(n) leading curve bits
    // split across the two dimensions, the AVERAGE per-file span over
    // BOTH dims must be materially tighter than the fragmented
    // (round-robin) input's (a curve split on few files may cut only
    // one dimension's MSB — the joint average is the honest gate)
    def meanSpan(paths: Seq[String], c: String): Double = {
      val rs = fileRanges(paths, c)
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    }
    val dims = Seq("user_id", "ts_s")
    val zAvg = dims.map(d =>
      meanSpan(files, d) / math.max(1.0, meanSpan(dataFiles(inDir), d))).sum / dims.size
    assert(zAvg < 0.75,
      s"compacted z-layout avg normalized span $zAvg not < 0.75 of fragmented")
    // in-place refusal applies to this form too
    intercept[IllegalArgumentException] {
      Sinks.compactParquetZOrdered(spark, outDir, outDir, Seq("user_id"), 1024)
    }
  }

  test("clustered layout actually prunes: point-range scan reads a strict subset of files") {
    val out = tmp("graft_prune_")
    val in = events.select("event_id", "user_id")
    Sinks.writeClustered(in, out, Seq("user_id"), numFiles = 8)
    val ranges = fileRanges(dataFiles(out), "user_id").sortBy(_._1)
    val (plo, phi) = ranges.head // predicate covering only the first file's range
    val filesTouched = ranges.count { case (lo, hi) => hi >= plo && lo <= phi }
    assert(filesTouched <= 2,
      s"a [$plo,$phi] predicate should touch at most 2 of 8 files, touched $filesTouched")
    // and the data answer on the clustered copy matches the source
    val want = in.filter(col("user_id").between(plo, phi)).count()
    val got = spark.read.parquet(out).filter(col("user_id").between(plo, phi)).count()
    assert(got === want)
  }
}
