package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift detection between two dataset snapshots — the
 * Population Stability Index (PSI), the standard model-monitoring
 * drift score (public method; PSI > 0.25 conventionally = "population
 * shifted, retrain"). The training-data use: compare this crawl's
 * quality/length/score distribution against the last accepted
 * snapshot before admitting it to the mixture.
 *
 * Bins are `bins` equal-width buckets over the REFERENCE value range
 * (current-side outliers clamp into the edge bins), computed in EXACT
 * integer arithmetic: with integer-valued `value` (cents, token
 * counts, …), the bin index floor((v − mn)·bins / (mx − mn + 1)) has
 * its numerator and denominator both integers, so the double division
 * is ≥ 1/(mx−mn+1) away from any integer whenever it is not exactly
 * one — floor can never be flipped by float noise and every engine
 * agrees on every row's bin.
 *
 * Per-bin probabilities are Laplace-smoothed ((n + ½)/(N + bins/2), so
 * empty bins contribute a finite term) and each PSI term
 * (p_cur − p_ref)·ln(p_cur/p_ref) is reported in rounded MICRO units —
 * the t23 pattern that absorbs the one non-correctly-rounded
 * primitive (`ln`) into an integer.
 *
 * Scale shape: one eager 2-scalar min/max aggregate over the
 * reference (the fail-fast admission check — an EMPTY reference must
 * abort loudly, not bin every row to null and report all-zero PSI =
 * "no drift" exactly when the snapshot is missing), then two
 * single-pass count aggregates over the snapshots (map-side combined
 * into ≤ bins rows each) with the range embedded as literals, and a
 * 1-row total aggregate attached via crossJoin(broadcast(...)) —
 * nothing row-count-sized shuffles; only the two range scalars reach
 * the driver.
 */
object Drift {

  /**
   * Per-bin PSI decomposition: `(bin, n_ref, n_cur, psi_term_micro)`,
   * one row per bin (absent bins reported with zero counts). The
   * total PSI is the column sum — left to the caller so the
   * decomposition stays inspectable (WHICH bins drifted).
   *
   * @param value integer-valued Long column (the caller scales, e.g.
   *              cents or token counts).
   */
  def psiBins(ref: DataFrame, cur: DataFrame, value: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val spark = ref.sparkSession
    val mmRow = ref.agg(min(value).as("mn"), max(value).as("mx")).head()
    require(!mmRow.isNullAt(0) && !mmRow.isNullAt(1),
      "psiBins: reference frame is empty (min/max null) — the " +
        "snapshot-admission gate needs a non-empty reference snapshot")
    val mn = mmRow.getAs[Number](0).longValue()
    val mx = mmRow.getAs[Number](1).longValue()

    def counted(df: DataFrame, n: String): DataFrame =
      df.select(least(lit(bins - 1L), greatest(lit(0L),
          floor(((value - lit(mn)) * bins) / lit(mx - mn + 1))))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))

    val all = spark.range(bins).select(col("id").as("bin"))
      .join(counted(ref, "n_ref"), Seq("bin"), "left")
      .join(counted(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = all.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val pRef = (col("n_ref") + lit(0.5)) / (col("t_ref") + lit(bins * 0.5))
    val pCur = (col("n_cur") + lit(0.5)) / (col("t_cur") + lit(bins * 0.5))
    all.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((pCur - pRef) * log(pCur / pRef) * 1e6).cast("long").as("psi_term_micro"))
  }
}
