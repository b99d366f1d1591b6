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
 * Code layout: 25 blocks of 4 samples → 24 comparison bits in one
 * long (audio shorter than 100 samples is skipped — callers chunk
 * long audio and fingerprint per segment at scale).
 *
 * TIME-OFFSET ROBUSTNESS (the Haitsma–Kalker sub-fingerprint idea):
 * a block-aligned code misses a copy shifted by half a block — every
 * energy window straddles two of the original's. So [[fingerprints]]
 * emits one code per STRIDE OFFSET (0 and block/2) per clip: a copy
 * shifted by ±block/2 samples reproduces the original's offset-0
 * windows exactly at its own offset-block/2 grid (and vice versa), so
 * SOME offset pair matches at Hamming 0 and the pair join catches it.
 * Matching over the cross-product of offsets is what the original
 * paper does with its overlapping sub-fingerprint blocks; per-pair
 * similarity is the MINIMUM Hamming over the offset alignments.
 *
 * Scale shape: fingerprinting is map-only inside the same
 * `mapPartitions` pass that parses the container (8 bytes per clip
 * PER OFFSET leave the executor, never samples); pairing is the
 * banded equi-join below — never all-pairs.
 */
object AudioHash {

  val BlockSamples = 4
  val Bits = 24 // 25 blocks → 24 adjacent comparisons

  /** minimum sample count for a full code at offset 0. */
  val MinSamples: Int = BlockSamples * (Bits + 1)

  /** The analysis-grid offsets: block-aligned plus half-block — the
    * stride = block/2 overlap that catches half-block-shifted copies. */
  val Offsets: Seq[Int] = Seq(0, BlockSamples / 2)

  /** 24-bit energy-difference code over samples [off, off+100). */
  def energyDiffCode(sample: Int => Int, nSamples: Int, off: Int = 0): Long = {
    require(nSamples >= off + MinSamples, s"need >= ${off + MinSamples} samples")
    val e = new Array[Long](Bits + 1)
    var b = 0
    while (b <= Bits) {
      var k = off + b * BlockSamples
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

  /** Per-clip codes `(media_id, ahash)` — one row per [[Offsets]]
    * entry that fits the clip — for WAV/AIFF rows with enough samples;
    * other formats and too-short clips are skipped. */
  /** One code row per [[Offsets]] entry that fits the clip — an
    * object-level method so the mapPartitions closure below captures
    * nothing but the module reference. */
  private def offsetCodes(id: Long, sample: Int => Int, n: Int): Iterator[(Long, Long)] =
    Offsets.iterator.filter(off => n >= off + MinSamples)
      .map(off => (id, energyDiffCode(sample, n, off)))

  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap {
        case m if m.format == "audio/wav" =>
          val w = VideoContainers.WavDemux.read(m.content)
          offsetCodes(m.media_id, w.sample(_), w.nSamples)
        case m if m.format == "audio/aiff" =>
          val a = VideoContainers.AiffDemux.read(m.content)
          offsetCodes(m.media_id, a.sample(_), a.nSamples)
        case _ => Iterator.empty
      }
    }.toDF("media_id", "ahash")
  }

  /** Near-dup pairs with min-over-alignments Hamming ≤ `maxHamming`
    * over the 24-bit codes, banded into four 6-bit chunks —
    * pigeonhole: within Hamming 3 at least one chunk matches exactly,
    * so the equi-join finds every such pair (engine ≡ the m14 oracle's
    * exhaustive pairing) and candidate generation never cross-joins.
    * With multi-offset codes ([[Offsets]]) a pair has up to 4
    * alignments; `hamming` is the MINIMUM over the alignments the
    * bands propose — identical to the global minimum whenever that
    * minimum is ≤ 3 (the only rows returned), since the minimizing
    * alignment itself shares a chunk. */
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
      .withColumn("ham",
        bit_count(col("code_a").bitwiseXOR(col("code_b"))).cast("long"))
      .groupBy("id_a", "id_b").agg(min(col("ham")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
