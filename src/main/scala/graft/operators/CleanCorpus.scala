package graft.operators

import graft.functions.{Pii, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus cleaning composed from the engine's primitives in
 * the standard pre-training order (the C4/Dolma-style pipeline,
 * public method):
 *
 *  1. exact near-dup removal — canonical-text fingerprint, keep
 *     lowest id ([[Dedup.exactKeepFirst]]);
 *  2. quality gate — composite score ≥ `minQuality`
 *     ([[TextFunctions.qualityScore]], filtered on the ROUNDED score
 *     so engine replicas agree at the boundary);
 *  3. strict benchmark decontamination — any shared word n-gram drops
 *     the document ([[Decontaminate.removeContaminated]]);
 *  4. PII redaction of the surviving text ([[Pii.redact]]).
 *
 * Shuffle budget: one content-hash window (dedup), one broadcast
 * anti-join via the exploded gram set (decontamination); the quality
 * gate and redaction are map-only. Stage order puts the cheap
 * row-count reducers first so the explode-heavy decontamination sees
 * the smallest surviving set.
 */
object CleanCorpus {

  /** How stage 3 carries the benchmark gram set. [[Exact]] broadcasts
    * the distinct grams as rows — right while the accumulated eval
    * suite stays broadcast-sized. [[Bloom]] folds them into ONE
    * fixed-size synopsis ([[Decontaminate.benchGramsBloom]]) — the
    * form that survives hundreds of accumulated eval sets: the
    * broadcast is `numBits/8` bytes no matter how many benchmarks
    * pile up, and the one-sided error can only drop MORE (no false
    * negatives — conservative, spec-pinned). */
  sealed trait Decontam
  case object Exact extends Decontam
  final case class Bloom(
      estimatedGrams: Long = 1L << 20, numBits: Long = 1L << 23) extends Decontam

  /** Returns (idCol, quality, clean_text) for surviving documents. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      minQuality: Double, shingleN: Int = 3,
      decontam: Decontam = Exact): DataFrame = {
    val t = col(textCol)
    val deduped = Dedup.exactKeepFirst(
        docs.withColumn("__fp", md5(TextFunctions.canonicalText(t))),
        Seq("__fp"), idCol)
      .drop("__fp")
    val scored = deduped
      .withColumn("quality", round(TextFunctions.qualityScore(t), 6))
      .filter(col("quality") >= minQuality)
    val decontaminated = decontam match {
      case Exact =>
        Decontaminate.removeContaminated(
          scored, idCol, textCol, bench, benchTextCol, shingleN)
      case Bloom(estimatedGrams, numBits) =>
        Decontaminate.removeContaminatedBloomAgainst(
          scored, idCol, textCol,
          Decontaminate.benchGramsBloom(
            bench, benchTextCol, shingleN, estimatedGrams, numBits),
          shingleN)
    }
    decontaminated.select(col(idCol), col("quality"), Pii.redact(t).as("clean_text"))
  }
}
