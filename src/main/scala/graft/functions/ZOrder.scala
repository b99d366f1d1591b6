package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve values for multi-dimension data clustering —
 * the public technique behind Delta's `OPTIMIZE ZORDER BY` and
 * Iceberg's `sort_order(zorder(...))`: map each row to a point on a
 * space-filling curve, then range-cluster files by curve position so
 * every dimension's min/max file statistics stay tight AT ONCE.
 * Lexicographic clustering makes only the leading column skippable; a
 * Z-value keeps locality in all participating dimensions, which is
 * what lets a 100 TB scan skip files on `user_id` AND `ts` predicates
 * simultaneously.
 *
 * Everything here is a pure `Column` expression over Spark built-ins
 * (`floor`/`shiftleft`/`bitwiseAND`/`|`) — whole-stage-codegen'd,
 * no UDF, and exactly replayable in ANSI SQL (the oracle replicates
 * the identical arithmetic in DuckDB).
 */
object ZOrder {

  /** Fixed-grid bucket index of `c` in `[lo, hi]` → `[0, 2^bits)`:
    * `clamp(floor((c − lo) / (hi − lo) · 2^bits))`, the binning rule
    * shared with `Quantiles.approxPercentilesBinned` (identical
    * left-to-right IEEE arithmetic, so DuckDB replays it exactly).
    * A degenerate range (`hi == lo`) maps everything to bucket 0. */
  def bucketIndex(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits=$bits out of [1,20]")
    val n = 1L << bits
    if (hi == lo) lit(0L)
    else least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble)).cast("long")))
  }

  /** Interleave the low `bits` bits of each bucket index (already in
    * `[0, 2^bits)`) into one Morton value: bit `b` of dimension `j`
    * lands at position `b·d + j`. 20 bits × 3 dims = 60 bits — fits a
    * long with room to spare. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "at least one dimension")
    require(buckets.length * bits <= 60, "interleaved width must fit a long")
    val d = buckets.length
    val terms = for {
      b <- 0 until bits
      (c, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value of the given columns over their declared `[lo, hi]`
    * ranges. Ranges are LITERALS by design: the caller computes them
    * once (a single min/max aggregate — one tiny job) so the curve
    * mapping itself stays a deterministic map-only projection that
    * never re-scans the data. */
  def zValue(cols: Seq[(Column, Double, Double)], bits: Int): Column =
    interleave(cols.map { case (c, lo, hi) => bucketIndex(c, lo, hi, bits) }, bits)
}
