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

  test("AudioHash: gain-robust codes, dense grid == per-offset codes, banding == exhaustive") {
    import spark.implicits._
    // the derivative-sign code is invariant under positive gain: the
    // same samples doubled produce the SAME code
    val base = Array.tabulate(120)(k => ((k * 37) % 97) * 113 - 5000)
    val c1 = AudioHash.energyDiffCode(base(_), 120)
    val c2 = AudioHash.energyDiffCode(k => base(k) * 2, 120)
    assert(c1 === c2, "positive gain must not change the code")
    assert(c1 !== 0L)
    // the prefix-summed dense grid agrees with the direct per-offset
    // code at EVERY window position
    val dense = AudioHash.denseCodes(base(_), 120, 1).toSeq
    assert(dense.size === 21)
    dense.foreach { case (off, code) =>
      assert(code === AudioHash.energyDiffCode(base(_), 120, off),
        s"dense code at off=$off disagrees with energyDiffCode")
    }
    // the m14 fixture end-to-end: the banded two-stage matcher equals
    // the EXHAUSTIVE all-alignments grouping (run filter + BER filter)
    val codes = AudioHash.fingerprints(QMedia.wavDupMedia(spark))
    val pairs = AudioHash.nearDupPairs(codes, maxHamming = 3, minRun = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val raw = codes.as[(Long, Long, Long)].collect()
    val brute = (for {
      (ia, oa, ca) <- raw; (ib, ob, cb) <- raw if ia < ib
    } yield ((ia, ib, oa - ob), java.lang.Long.bitCount(ca ^ cb).toLong))
      .groupBy(_._1).view
      .map { case ((a, b, delta), hs) =>
        val matched = hs.count(_._2 <= 3).toLong
        val totalHam = hs.map(_._2).sum
        (a, b, delta, matched, hs.length.toLong, totalHam)
      }
      .filter { case (_, _, _, matched, overlap, totalHam) =>
        matched >= 5 && totalHam <= 6 * overlap
      }.toSet
    assert(pairs === brute)
    // every original matches its three copy families at the TRUE
    // delta: perturbed at 0, 1-sample head-trim at +1, 3-sample at +3
    for (src <- 0L until 10L) {
      assert(pairs.exists { case (a, b, d, _, _, _) =>
        a == src && b == 100 + src && d == 0L }, s"perturbed copy of $src")
      assert(pairs.exists { case (a, b, d, _, _, th) =>
        a == src && b == 200 + src && d == 1L && th == 0L }, s"trim-1 copy of $src")
      assert(pairs.exists { case (a, b, d, _, _, th) =>
        a == src && b == 300 + src && d == 3L && th == 0L }, s"trim-3 copy of $src")
    }
    // the BER stage is what kills chance runs: no pair may cross
    // source families other than the three copy relations
    pairs.foreach { case (a, b, _, _, _, _) =>
      assert((b - a) % 100 == 0 && a % 100 == b % 100,
        s"chance alignment survived the BER stage: ($a, $b)")
    }
    // too-short audio is skipped, not mis-fingerprinted
    intercept[IllegalArgumentException] {
      AudioHash.energyDiffCode(base(_), AudioHash.MinSamples - 1)
    }
    assert(AudioHash.denseCodes(base(_), AudioHash.MinSamples - 1, 1).isEmpty)
  }

  test("AudioHash: 1-sample-shifted and head-trimmed copies match at the true delta") {
    import spark.implicits._
    // ARBITRARY offsets, not just block multiples: one prepended
    // sample (2 bytes) and a 5-sample head-trim — invisible to any
    // block-aligned or half-block grid, exact on the dense grid
    val pcm0 = Array.tabulate(300)(j => (((j * 73) % 251) - 120).toByte)
    val shifted = Array[Byte](7, -3) ++ pcm0
    val trimmed = pcm0.drop(10)
    val media = Seq((1L, pcm0), (2L, shifted), (3L, trimmed)).map {
      case (id, bytes) =>
        MediaRow(id, "audio",
          VideoContainers.WavMux.write(bytes, 8000, 1, 16), 0, 0, 0, "audio/wav")
    }.toDS()
    val pairs = AudioHash
      .nearDupPairs(AudioHash.fingerprints(media), maxHamming = 3, minRun = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // orig window p == shifted window p+1 → delta −1; == trimmed
    // window p−5 → delta +5; shifted vs trimmed → delta +6 — all
    // with total_ham 0 over the full overlap
    assert(pairs.exists { case (a, b, d, _, _, th) =>
      a == 1L && b == 2L && d == -1L && th == 0L }, s"1-sample shift missed: $pairs")
    assert(pairs.exists { case (a, b, d, _, _, th) =>
      a == 1L && b == 3L && d == 5L && th == 0L }, s"head-trim missed: $pairs")
    assert(pairs.exists { case (a, b, d, _, _, th) =>
      a == 2L && b == 3L && d == 6L && th == 0L }, s"shift-vs-trim missed: $pairs")
  }

  test("AudioHash: persisted index gate — lifecycle, snapshot stability, banding guard") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx").toString
    AudioHash.writeIndex(path, AudioHash.fingerprints(QMedia.wavHistMedia(spark)))
    val batch = AudioHash.fingerprints(QMedia.wavIngestMedia(spark))
    val survA = AudioHash.gate(spark, path, batch, maxHamming = 3, minRun = 5)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("media_id").distinct().as[Long].collect().toSet
    val before = ids(survA)
    // perturbed copies of history drop; the novels survive
    assert(before.forall(_ >= 200L), s"a history copy survived: $before")
    assert((200L until 206L).toSet.subsetOf(before), s"a novel was dropped: $before")
    AudioHash.upsertIndex(path, survA)
    spark.catalog.clearCache()
    assert(ids(survA) === before,
      "a gate verdict must mean 'as of the call', even after the upsert")
    // day-2: head-trimmed copies of day-1 survivors drop (delta-2
    // runs against the grown index), fresh novels pass
    val survB = ids(AudioHash.gate(spark, path,
      AudioHash.fingerprints(QMedia.wavIngestMediaB(spark)), maxHamming = 3, minRun = 5))
    assert(survB === (400L until 404L).toSet, s"day-2 verdicts wrong: $survB")
    // a wide (image) store refuses an audio-banded probe
    val widePath = java.nio.file.Files.createTempDirectory("graft_audioidx_wide").toString
    MediaIndex.write(widePath,
      Seq((1L, 0x0123456789abcdefL)).toDF("media_id", "dhash"))
    val ex = intercept[IllegalArgumentException] {
      AudioHash.gate(spark, widePath, batch, maxHamming = 3, minRun = 5)
    }
    assert(ex.getMessage.contains("not an audio sub-fingerprint index"))
  }

  test("AudioHash: exact-candidate mode (the 100 TB path) == its brute force; trims caught") {
    import spark.implicits._
    // the Haitsma-Kalker exact sub-fingerprint lookup: candidates are
    // bit-identical windows only — the full-code join keyspace that
    // survives billions of windows where 6-bit chunks collide at 6%
    val codes = AudioHash.fingerprints(QMedia.wavDupMedia(spark))
    val pairs = AudioHash
      .nearDupPairs(codes, maxHamming = 3, minRun = 5, exactCandidates = true)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val raw = codes.as[(Long, Long, Long)].collect()
    val brute = (for {
      (ia, oa, ca) <- raw; (ib, ob, cb) <- raw if ia < ib
    } yield ((ia, ib, oa - ob), java.lang.Long.bitCount(ca ^ cb).toLong))
      .groupBy(_._1).view
      .map { case ((a, b, delta), hs) =>
        (a, b, delta, hs.count(_._2 == 0).toLong, hs.length.toLong, hs.map(_._2).sum)
      }
      .filter { case (_, _, _, exact, overlap, totalHam) =>
        exact >= 5 && totalHam <= 6 * overlap
      }.toSet
    assert(pairs === brute)
    // the trim families are bit-identical runs — exact lookup keeps them
    for (src <- 0L until 10L) {
      assert(pairs.exists { case (a, b, d, _, _, th) =>
        a == src && b == 200 + src && d == 1L && th == 0L }, s"trim-1 copy of $src")
      assert(pairs.exists { case (a, b, d, _, _, th) =>
        a == src && b == 300 + src && d == 3L && th == 0L }, s"trim-3 copy of $src")
    }
    // gate parity: the persisted index probed in exact mode drops the
    // same clips as its own brute-force decision against the history —
    // the brute force models the SPARSE stored grid (writeIndex keeps
    // offsets divisible by BlockSamples; the probe stays dense)
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx_exact").toString
    AudioHash.writeIndex(path, AudioHash.fingerprints(QMedia.wavHistMedia(spark)))
    val batch = AudioHash.fingerprints(QMedia.wavIngestMedia(spark))
    val surv = AudioHash.gate(spark, path, batch,
        maxHamming = 3, minRun = 5, exactCandidates = true)
      .select("media_id").distinct().as[Long].collect().toSet
    val histRaw = AudioHash.fingerprints(QMedia.wavHistMedia(spark))
      .as[(Long, Long, Long)].collect()
      .filter(_._2 % AudioHash.BlockSamples == 0)
    val batchRaw = batch.as[(Long, Long, Long)].collect()
    val dropIds = (for {
      (bi, bo, bc) <- batchRaw; (hi, ho, hc) <- histRaw
    } yield ((bi, hi, bo - ho), java.lang.Long.bitCount(bc ^ hc).toLong))
      .groupBy(_._1).view
      .collect { case ((bi, _, _), hs)
        if hs.count(_._2 == 0) >= 5 && hs.map(_._2).sum <= 6 * hs.length => bi }
      .toSet
    val expected = batchRaw.map(_._1).toSet -- dropIds
    assert(surv === expected,
      s"exact-mode gate != brute force: ${surv.diff(expected)} / ${expected.diff(surv)}")
    // novels always survive the exact gate
    assert((200L until 206L).toSet.subsetOf(surv))
  }

  test("AudioHash: exact-mode stop codes — degenerate constant audio is pruned, real pairs kept") {
    import spark.implicits._
    // silence/constant audio emits ONE 24-bit code at every window —
    // the full-code equi-join's quadratic hot key. Above maxCodeFreq
    // the code leaves candidate generation (the Haitsma–Kalker
    // low-energy stop list); genuine copies still pair on their
    // non-degenerate windows.
    val real = Array.tabulate(300)(j => (((j * 73) % 251) - 120).toByte)
    val rows = Seq(
      (1L, real), (2L, real.drop(2)),                 // genuine trim pair
      (10L, Array.fill[Byte](300)(0)),                // silence
      (11L, Array.fill[Byte](300)(0)))                // silence copy
      .map { case (id, b) => MediaRow(id, "audio",
        VideoContainers.WavMux.write(b, 8000, 1, 16), 0, 0, 0, "audio/wav") }
      .toDS()
    val codes = AudioHash.fingerprints(rows)
    // every silent window emits the same code ~100 times per clip —
    // a cap of 50 prunes exactly those, keeping the real pair intact
    val pairs = AudioHash.nearDupPairs(codes, maxHamming = 3, minRun = 5,
        exactCandidates = true, maxCodeFreq = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"genuine trim pair lost: $pairs")
    assert(!pairs.exists(p => p._1 >= 10L || p._2 >= 10L),
      s"degenerate silent clips must be stop-pruned from exact candidates: $pairs")
    // the same guard on the persisted gate's batch side: a silent
    // batch clip proposes no exact candidates → it SURVIVES (honest:
    // silence is unmatchable under the stop list) instead of
    // exploding the probe join
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx_stop").toString
    AudioHash.writeIndex(path, codes.filter(col("media_id") === 1L))
    val surv = AudioHash.gate(spark, path,
        codes.filter(col("media_id").isin(2L, 10L)),
        maxHamming = 3, minRun = 5, exactCandidates = true, maxCodeFreq = 50)
      .select("media_id").distinct().as[Long].collect().toSet
    assert(surv === Set(10L), s"trim copy must drop, silent clip must pass: $surv")
  }

  test("AudioHash: exact-mode gate prunes HISTORY-side stop codes too") {
    import spark.implicits._
    // the r16 ADVICE hole: a SHORT silent batch clip (few windows of
    // one code — far below maxCodeFreq) is not batch-pruned, and
    // pre-fix it equi-joined against EVERY silent stored window: join
    // volume unbounded in history-side frequency, and the silent-vs-
    // silent alignment BER is 0, so the clip was silently dropped as a
    // "copy" of the history's silence. With both sides pruned the
    // degenerate key never joins — the short silent clip survives
    // (honest: silence is unmatchable under the stop list) while a
    // genuine copy still drops on its non-degenerate windows.
    val real = Array.tabulate(300)(j => (((j * 73) % 251) - 120).toByte)
    def wav(id: Long, pcm: Array[Byte]) = MediaRow(id, "audio",
      VideoContainers.WavMux.write(pcm, 8000, 1, 16), 0, 0, 0, "audio/wav")
    val hist = Seq(wav(1L, real), wav(9L, new Array[Byte](2000))).toDS()
    val batch = Seq(
      wav(2L, Array[Byte](5, -9) ++ real), // shifted genuine copy of 1
      wav(11L, new Array[Byte](300))).toDS() // short silent clip: 51 windows
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx_hsil").toString
    // stored grid stride 4: history silence (1000 samples) = ~226
    // windows of code 0 (> maxCodeFreq=100, pruned); batch silence
    // (150 samples, dense) = 51 (< 100, kept)
    AudioHash.writeIndex(path, AudioHash.fingerprints(hist))
    val surv = AudioHash.gate(spark, path, AudioHash.fingerprints(batch),
        maxHamming = 3, minRun = 5, exactCandidates = true, maxCodeFreq = 100)
      .select("media_id").distinct().as[Long].collect().toSet
    assert(surv === Set(11L),
      s"genuine copy must drop; short silent clip must survive the " +
        s"history-silence prune: $surv")
  }

  test("AudioHash: exact-mode gate dispatches oversized batches to the banded probe") {
    import spark.implicits._
    // the no-history-shuffle contract: exact mode BROADCASTS the
    // batch; above exactBroadcastMaxCodes the gate falls back to the
    // banded bucketed probe (candidate superset — conservative) and
    // must equal the banded gate exactly
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx_disp").toString
    AudioHash.writeIndex(path, AudioHash.fingerprints(QMedia.wavHistMedia(spark)))
    val batch = AudioHash.fingerprints(QMedia.wavIngestMedia(spark))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("media_id").distinct().as[Long].collect().toSet
    val banded = ids(AudioHash.gate(spark, path, batch, maxHamming = 3, minRun = 5))
    val dispatched = ids(AudioHash.gate(spark, path, batch, maxHamming = 3,
      minRun = 5, exactCandidates = true, exactBroadcastMaxCodes = 10L))
    assert(dispatched === banded,
      "an oversized exact-mode batch must take the banded path verbatim")
  }

  test("AudioHash: sparse store + dense probe still catches arbitrary shifts") {
    import spark.implicits._
    // the 100 TB economics: the INDEX stores one code per BlockSamples
    // (4x fewer rows), the probe stays dense — a copy shifted by any s
    // still aligns every stored window h_off with the probe's window
    // at h_off - s, so stage-1 counts ~overlap/stride matches at one
    // delta and stage-2 BER verifies over exactly those positions
    val pcm0 = Array.tabulate(300)(j => (((j * 73) % 251) - 120).toByte)
    val hist = Seq(MediaRow(1L, "audio",
      VideoContainers.WavMux.write(pcm0, 8000, 1, 16), 0, 0, 0, "audio/wav")).toDS()
    val batch = Seq(
      (2L, Array[Byte](7, -3) ++ pcm0),            // 1-sample-shifted copy
      (3L, Array.tabulate(300)(j => (((j * 97 + 31) % 241) - 120).toByte))) // novel
      .map { case (id, bytes) =>
        MediaRow(id, "audio",
          VideoContainers.WavMux.write(bytes, 8000, 1, 16), 0, 0, 0, "audio/wav")
      }.toDS()
    val path = java.nio.file.Files.createTempDirectory("graft_audioidx_sparse").toString
    AudioHash.writeIndex(path,
      AudioHash.fingerprints(hist, stride = AudioHash.BlockSamples))
    val surv = AudioHash.gate(spark, path,
        AudioHash.fingerprints(batch, stride = 1), maxHamming = 3, minRun = 5)
      .select("media_id").distinct().as[Long].collect().toSet
    assert(surv === Set(3L),
      s"sparse store must still drop the shifted copy and keep the novel: $surv")
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
