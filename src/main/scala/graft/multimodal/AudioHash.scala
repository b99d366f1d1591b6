package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Audio fingerprinting for near-dup detection — the energy-difference
 * signature (the Haitsma–Kalker 2002 "audio fingerprint" SHAPE,
 * public method, reduced to pure integer arithmetic): window the PCM
 * stream into fixed sample blocks, take per-block energy Σ|s|, and
 * emit one bit per adjacent-block comparison (energy rising = 1).
 * The derivative-sign form is what makes it a PERCEPTUAL hash: a
 * re-encode, dither, or gain change moves every energy a little but
 * rarely flips which of two adjacent blocks is louder — byte-distinct
 * payloads, near-identical codes; the audio twin of
 * [[ImageHash.dHash64]].
 *
 * Code layout: the first 25 blocks of 4 samples → 24 comparison bits
 * in one long (audio shorter than 100 samples is skipped — callers
 * chunk long audio and fingerprint per segment at scale).
 *
 * Scale shape: fingerprinting is map-only inside the same
 * `mapPartitions` pass that parses the container (8 bytes per clip
 * leave the executor, never samples); pairing is the banded
 * equi-join below — never all-pairs.
 */
object AudioHash {

  val BlockSamples = 4
  val Bits = 24 // 25 blocks → 24 adjacent comparisons

  /** minimum sample count for a full code. */
  val MinSamples: Int = BlockSamples * (Bits + 1)

  /** 24-bit energy-difference code over the first 100 samples. */
  def energyDiffCode(sample: Int => Int, nSamples: Int): Long = {
    require(nSamples >= MinSamples, s"need >= $MinSamples samples")
    val e = new Array[Long](Bits + 1)
    var b = 0
    while (b <= Bits) {
      var k = b * BlockSamples
      val end = k + BlockSamples
      var s = 0L
      while (k < end) { s += math.abs(sample(k).toLong); k += 1 }
      e(b) = s
      b += 1
    }
    var code = 0L
    var i = 0
    while (i < Bits) {
      if (e(i + 1) > e(i)) code |= 1L << i
      i += 1
    }
    code
  }

  /** Per-clip codes `(media_id, ahash)` for WAV/AIFF rows with enough
    * samples — other formats and too-short clips are skipped. */
  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap {
        case m if m.format == "audio/wav" =>
          val w = VideoContainers.WavDemux.read(m.content)
          if (w.nSamples >= MinSamples)
            Iterator.single((m.media_id, energyDiffCode(w.sample(_), w.nSamples)))
          else Iterator.empty
        case m if m.format == "audio/aiff" =>
          val a = VideoContainers.AiffDemux.read(m.content)
          if (a.nSamples >= MinSamples)
            Iterator.single((m.media_id, energyDiffCode(a.sample(_), a.nSamples)))
          else Iterator.empty
        case _ => Iterator.empty
      }
    }.toDF("media_id", "ahash")
  }

  /** Near-dup pairs with Hamming ≤ `maxHamming` over the 24-bit
    * codes, banded into four 6-bit chunks — pigeonhole: within
    * Hamming 3 at least one chunk matches exactly, so the equi-join
    * finds every such pair (engine ≡ the m14 oracle's exhaustive
    * pairing) and candidate generation never cross-joins. */
  def nearDupPairs(codes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band chunking guarantees recall only to Hamming 3")
    val chunked = codes.select(
      col("media_id"), col("ahash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("ahash"), i * 6).bitwiseAND(lit(0x3fL))): _*)))
      .toDF("media_id", "ahash", "chunk", "chunk_val")
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("code_a"), col("b.ahash").as("code_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("code_a").bitwiseXOR(col("code_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
