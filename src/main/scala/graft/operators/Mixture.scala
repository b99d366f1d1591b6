package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Source-mixture sampling: downsample a multi-source corpus so the
 * surviving documents hit TARGET mixture proportions (the data-mixing
 * step of every pre-training pipeline — e.g. The Pile's per-subset
 * weights, Gao et al. 2020, public method). No source is upsampled;
 * the result is the LARGEST corpus achievable at the target
 * proportions given what each source has. Proportions are realized
 * in expectation (each row passes an independent per-source hash
 * gate), with O(1/√n) relative deviation — the right trade at scale,
 * where an exact per-source count would need a corpus-wide
 * rank-per-stratum window shuffle.
 *
 * Deterministic by construction: acceptance is the 32-bit md5 gate of
 * the document id ([[Sampling.deterministicByRate]]'s gate) with a
 * per-source rate — the same documents survive on every run, engine,
 * and cluster size.
 *
 * Scale shape: one tiny per-source count aggregate (|sources| rows),
 * a 1-row global min, and then ONE map-only broadcast-join + filter
 * over the corpus — the 100 TB side is read once and never shuffled.
 */
object Mixture {

  /** 2^32 as double, the md5-bucket range. */
  private val Buckets = 4294967296.0

  /**
   * Per-source keep rates for [[sampleToMix]]: joins the corpus's
   * per-source counts with `weights` (stratum, weight > 0), scales
   * every source by C = min(n_s / w_s) so the binding source keeps
   * everything and the rest downsample proportionally. Returns
   * (stratum, n, weight, rate, threshold) — `threshold` is the
   * integer gate `floor(rate · 2³²)`, exposed so oracles can inline
   * identical literals.
   */
  def mixRates(df: DataFrame, strataCol: String, weights: DataFrame): DataFrame = {
    val counts = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).cast("double").as("n"))
    val wd = weights.select(col("stratum"), col("weight").cast("double"))
    val joined = counts.join(wd, Seq("stratum"))
    val cmin = joined.agg(min(col("n") / col("weight")).as("cmin"))
    joined.crossJoin(broadcast(cmin))
      .withColumn("rate", col("cmin") * col("weight") / col("n"))
      .withColumn("threshold", floor(col("rate") * Buckets).cast("long"))
      .select("stratum", "n", "weight", "rate", "threshold")
  }

  /** md5-of-id 32-bit bucket — [[Sampling]]'s portable uniform gate. */
  private def bucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")

  /**
   * Keep a deterministic subset of `df` whose per-`strataCol` counts
   * realize the `weights` proportions (stratum, weight). Strata
   * absent from `weights` are dropped entirely (weight 0). Preserves
   * the input schema.
   */
  def sampleToMix(
      df: DataFrame, strataCol: String, idCol: String,
      weights: DataFrame): DataFrame = {
    val rates = mixRates(df, strataCol, weights)
      .select(col("stratum").as(strataCol), col("threshold"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(bucket(col(idCol)) < col("threshold"))
      .select(df.columns.map(col): _*)
  }
}
