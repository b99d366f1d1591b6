package graft.multimodal

import graft.SparkTestSession
import graft.queries.QMedia
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ImageHash (m12) — hand-computed codes, re-encode invariance, and
  * the band join's pigeonhole guarantee vs exhaustive pairs. */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frame(w: Int, h: Int, px: Array[Byte]) =
    DecodedFrame(0L, 0, w, h, px)

  test("dHash64 on an exact 9x8 grid: monotone rows saturate the code") {
    // already grid-sized → the resample is the identity; strictly
    // increasing pixels set every bit, decreasing set none
    val inc = frame(9, 8, Array.tabulate(72)(_.toByte))
    assert(ImageHash.dHash64(inc) === -1L) // all 64 bits
    val dec = frame(9, 8, Array.tabulate(72)(j => (200 - j).toByte))
    assert(ImageHash.dHash64(dec) === 0L)
  }

  test("dHash64 hand-computed single-bit case") {
    // flat gray except one bright pixel at grid (0,1): only the
    // (y=0,x=0) comparison 100 < 200 sets a bit; (0,1) has 200 > 100
    val px = Array.fill(72)(100.toByte)
    px(1) = 200.toByte
    assert(ImageHash.dHash64(frame(9, 8, px)) === 1L)
  }

  test("PNG re-encode is hash-invariant; the perturbed copy stays within Hamming 3") {
    import spark.implicits._
    val codes = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageDupMedia(spark), everyN = 1))
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    // every original decodes to SOME code and its perturbed copy is near
    (0L until 24L).foreach { i =>
      val d = java.lang.Long.bitCount(codes(i) ^ codes(100 + i))
      assert(d <= 3, s"img $i vs its +2-perturbed copy: hamming $d")
    }
  }

  test("banded pair join == exhaustive all-pairs at Hamming <= 3 (pigeonhole recall)") {
    import spark.implicits._
    val codesDf = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageDupMedia(spark), everyN = 1))
      .select("media_id", "dhash")
    val banded = ImageHash.nearDupPairs(codesDf, "media_id", "dhash", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val codes = codesDf.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ca) <- codes; (ib, cb) <- codes if ia < ib
      d = java.lang.Long.bitCount(ca ^ cb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must actually contain near-dups")
  }

  test("clipNearDupPairs: trimmed re-encodes score 1.0, unrelated clips never pair") {
    import spark.implicits._
    val codes = ImageHash.frameHashes(
      Multimodal.sampleFrames(QMedia.y4mDupMedia(spark), everyN = 1))
    val pairs = ImageHash.clipNearDupPairs(codes, maxHamming = 3, minFrac = 0.5)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    // exactly the 12 original↔copy pairs, each at sim 1.0 — including
    // the dropped-frame copies (the copy→original direction matches
    // every surviving frame)
    assert(pairs.length === 12)
    assert(pairs.forall { case (a, b, _, _, _, _, sim) => b - a === 100L && sim === 1.0 })
    val trimmed = pairs.filter(p => p._3 != p._4)
    assert(trimmed.nonEmpty, "fixture must exercise the dropped-frame case")
    trimmed.foreach { case (_, _, nA, nB, mA, mB, _) =>
      assert(mB === nB && mA < nA || mA === nA && mB < nB,
        "the shorter side must fully match while the longer has an unmatched frame")
    }
    // verification stays candidate-bounded: no cartesian in the plan
    val plan = ImageHash.clipNearDupPairs(codes, 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("incrementalNearDup: copies gated out, novels pass, day-2 resubmission drops them") {
    import spark.implicits._
    val hist = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageMedia(spark), everyN = 1))
      .select("media_id", "dhash")
    val batch = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageIngestMedia(spark), everyN = 1))
      .select("media_id", "dhash")
    val day1 = ImageHash.incrementalNearDup(batch, hist, maxHamming = 3)
    val survivors = day1.select("media_id").as[Long].collect().sorted
    // exactly the 12 novel ids pass; every perturbed copy is gated
    assert(survivors.toSeq === (200L until 212L))
    // day 2: append survivors to the history, resubmit the SAME batch
    // — everything is now a dup (self-match at Hamming 0), zero pass
    val hist2 = hist.unionByName(day1.select("media_id", "dhash"))
    assert(ImageHash.incrementalNearDup(batch, hist2, maxHamming = 3).count() === 0L)
    // the probe stays a banded equi-join
    val plan = ImageHash.incrementalNearDup(batch, hist, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("foreachBatch image ingestion: streamed gate equals sequential batch applies") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // history = the 24 originals' codes; STREAM the 36-image ingest
    // batch (24 copies + 12 novels) in two micro-batches through the
    // gate, appending each micro-batch's survivors — the live form of
    // the m15 daily pull (quantizer-free: the history is just codes)
    val hist0 = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageMedia(spark), everyN = 1))
      .select("media_id", "dhash")
    val batchRows = ImageHash.frameHashes(
        Multimodal.sampleFrames(QMedia.imageIngestMedia(spark), everyN = 1))
      .select("media_id", "dhash").as[(Long, Long)].collect().sortBy(_._1)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    var hist = hist0.persist()
    val passed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, Long)]
    val query = input.toDF().toDF("media_id", "dhash").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val surv = ImageHash.incrementalNearDup(mb.toDF(), hist, maxHamming = 3)
          .as[(Long, Long)].collect()
        passed ++= surv.map(_._1)
        if (surv.nonEmpty)
          hist = hist.unionByName(surv.toSeq.toDF("media_id", "dhash")).persist()
        ()
      }
      .start()
    try {
      Seq(b1, b2).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }
    } finally query.stop()
    // exactly the 12 novels pass, none twice; copies never pass
    assert(passed.sorted.toSeq === (200L until 212L).toSeq)
  }

  test("AudioHash: gain-robust codes, perturbed copies pair, banding == exhaustive") {
    import spark.implicits._
    // the derivative-sign code is invariant under positive gain: the
    // same samples doubled produce the SAME code
    val base = Array.tabulate(120)(k => ((k * 37) % 97) * 113 - 5000)
    val c1 = AudioHash.energyDiffCode(base(_), 120)
    val c2 = AudioHash.energyDiffCode(k => base(k) * 2, 120)
    assert(c1 === c2, "positive gain must not change the code")
    assert(c1 !== 0L)
    // the m14 fixture end-to-end: every original pairs with its copy,
    // never across sources; banded join equals exhaustive ≤3 pairs
    val codes = AudioHash.fingerprints(QMedia.wavDupMedia(spark))
    val pairs = AudioHash.nearDupPairs(codes, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length === 10)
    assert(pairs.forall { case (a, b, h) => b - a === 100L && h <= 3L })
    val raw = codes.as[(Long, Long)].collect()
    // brute force over ALL offset code rows, min-Hamming per pair —
    // exactly nearDupPairs' multi-alignment semantics
    val brute = (for {
      (ia, ca) <- raw; (ib, cb) <- raw if ia < ib
      d = java.lang.Long.bitCount(ca ^ cb)
    } yield ((ia, ib), d.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
      .collect { case ((a, b), h) if h <= 3 => (a, b, h) }.toSet
    assert(pairs.toSet === brute)
    // too-short audio is skipped, not mis-fingerprinted
    intercept[IllegalArgumentException] {
      AudioHash.energyDiffCode(base(_), AudioHash.MinSamples - 1)
    }
  }

  test("AudioHash: a half-block-shifted copy is caught via the offset grid") {
    import spark.implicits._
    // a copy with block/2 = 2 samples prepended: every block-aligned
    // window straddles two of the original's, so the old single-grid
    // code missed it — the offset-2 grid reproduces the original's
    // offset-0 windows EXACTLY (Hamming 0)
    val pcm0 = Array.tabulate(200)(j => (((j * 73) % 251) - 120).toByte)
    val shifted = Array[Byte](0, 0, 0, 0) ++ pcm0
    val media = Seq(
      VideoContainers.WavMux.write(pcm0, 8000, 1, 16),
      VideoContainers.WavMux.write(shifted, 8000, 1, 16))
      .zipWithIndex.map { case (bytes, i) =>
        MediaRow(i + 1L, "audio", bytes, 0, 0, 0, "audio/wav")
      }.toDS()
    val pairs = AudioHash
      .nearDupPairs(AudioHash.fingerprints(media), maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 0L)),
      s"shifted copy must pair at Hamming 0, got ${pairs.toSeq}")
  }

  test("disjoint copy tags (pairwise Hamming >= 4) never cross-pair") {
    import spark.implicits._
    // the MediaScaleSmoke replication scheme in miniature: top 16 bits
    // carry a 4x-repeated nibble, so distinct tags differ in >= 4 bits
    val base = Seq((1L, 0x0123456789abL), (2L, 0x0123456789a8L)) // hamming 2
    val tagged = (0 until 3).flatMap { k =>
      base.map { case (id, c) =>
        (id + k * 100L, (c & 0xffffffffffffL) | (k.toLong * 0x1111L) << 48)
      }
    }.toDF("media_id", "dhash")
    val pairs = ImageHash.nearDupPairs(tagged, "media_id", "dhash", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.length === 3) // one within-copy pair per copy, no cross
    assert(pairs.forall { case (a, b, d) => b - a === 1L && d === 2L })
  }
}
