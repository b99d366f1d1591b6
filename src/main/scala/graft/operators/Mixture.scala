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
   *
   * `weights` must be dimension-sized: it is COLLECTED once at
   * construction (paying a possibly-corpus-derived lineage exactly
   * once) and re-enters the plan as a broadcast local relation. The
   * collected set is validated driver-side: a duplicate stratum would
   * DUPLICATE every corpus row of that stratum through the join, and
   * a null/non-positive weight would silently empty the output via a
   * poisoned global minimum — config bugs worth failing loudly on.
   */
  def mixRates(df: DataFrame, strataCol: String, weights: DataFrame): DataFrame = {
    // collect the weights ONCE: they are dimension-sized by contract,
    // and their lineage may be corpus-derived (t21 builds them from a
    // corpus distinct) — validating lazily would re-execute that
    // lineage once for the check and once for the join
    val w = weights.select(col("stratum").cast("string"), col("weight").cast("double"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1)))
    require(w.forall(_._1 != null), "null stratum in weights")
    val dups = w.groupBy(_._1).collect { case (s, rows) if rows.length > 1 => s }
    require(dups.isEmpty,
      s"duplicate strata in weights (${dups.mkString(", ")}) — each corpus " +
        "row of a duplicated stratum would be emitted once per copy")
    require(w.forall(_._2 > 0.0), // NaN compares false: nulls rejected too
      s"weights must be positive, got ${w.filterNot(_._2 > 0.0).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val wd = w.toSeq.toDF("stratum", "weight")
    val counts = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).cast("double").as("n"))
    val joined = counts.join(broadcast(wd), Seq("stratum"))
    val cmin = joined.agg(min(col("n") / col("weight")).as("cmin"))
    joined.crossJoin(broadcast(cmin))
      .withColumn("rate", col("cmin") * col("weight") / col("n"))
      .withColumn("threshold", floor(col("rate") * Buckets).cast("long"))
      .select("stratum", "n", "weight", "rate", "threshold")
  }

  /**
   * Keep a deterministic subset of `df` whose per-`strataCol` counts
   * realize the `weights` proportions (stratum, weight). Strata
   * absent from `weights` are dropped entirely (weight 0). Preserves
   * the input schema (internal columns ride under the repo's `__`
   * prefix, so a corpus `threshold` column is untouched).
   */
  def sampleToMix(
      df: DataFrame, strataCol: String, idCol: String,
      weights: DataFrame): DataFrame = {
    val rates = mixRates(df, strataCol, weights)
      .select(col("stratum").as(strataCol), col("threshold").as("__thr"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(graft.functions.ScalarFunctions.md5Bucket32(col(idCol)) < col("__thr"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * TEMPERATURE-scaled mixture — the exponentiated-smoothing
   * reweighting of multilingual / multi-domain pre-training (public
   * recipe: the mBERT / XLM-R α-smoothing and the GPT-3 mixture
   * table): target proportions `q_s ∝ p_s^α` where `p_s` is the
   * natural share and `α ∈ (0, 1]` flattens the head so tail sources
   * keep a larger RELATIVE share (α = 1 is the natural mix — a
   * no-op, every row kept; smaller α tends toward uniform). Composes
   * onto [[sampleToMix]] with weights `w_s = n_s^α` — the
   * normalizations cancel inside mixRates' `C = min(n/w)`, no source
   * is ever upsampled, so the binding (smallest-survivor-ratio)
   * source keeps everything and the head downsamples toward the
   * flattened target. Cost over the corpus scan: one |sources|-row
   * aggregate more than sampleToMix itself.
   *
   * Determinism note: α = 0.5 (square-root smoothing, the common
   * choice) is computed with `sqrt`, which IEEE 754 requires to be
   * CORRECTLY ROUNDED — bit-identical across engines, so the t54
   * oracle replays the whole rate pipeline exactly. Other α go
   * through `pow`, which carries no such guarantee; cross-engine
   * comparisons at non-half α should gate on proportions, not hashes.
   */
  def temperatureMix(
      df: DataFrame, strataCol: String, idCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val wexpr =
      if (alpha == 0.5) sqrt(col("n"))
      else if (alpha == 1.0) col("n")
      else pow(col("n"), lit(alpha))
    val weights = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).cast("double").as("n"))
      .select(col("stratum"), wexpr.as("weight"))
    sampleToMix(df, strataCol, idCol, weights)
  }
}
