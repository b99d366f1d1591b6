package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension TYPE 2 maintenance (Kimball's public
 * warehouse pattern): apply a full dimension snapshot onto a history
 * table that keeps one row per (key, validity interval), so every
 * historical attribute value stays queryable AS OF any time. The
 * reference's upsert-by-partition sink (S8) replaces current state;
 * SCD2 is its history-preserving sibling — the form a training-data
 * pipeline needs when provenance must survive re-crawls ("what did
 * this source's metadata say when we sampled it?").
 *
 * History schema: `key, attrs…, valid_from: long, valid_to: long?`
 * (`valid_to` NULL = the open/current row). One apply at time `asOf`:
 *
 *  - snapshot key absent from the open slice          → INSERT open row
 *  - open row whose attrs differ (null-safe) from the
 *    snapshot                                          → CLOSE at asOf + INSERT open row
 *  - open row whose key left the snapshot (deletion)  → CLOSE at asOf
 *  - unchanged / already-closed rows                  → untouched
 *
 * Scale shape: ONE full-outer equi-join of the OPEN slice against the
 * snapshot on the key (both sides hash-partition once; the closed
 * history never moves — it is unioned back untouched, and under a
 * parquet table layout partitioned on `valid_to IS NULL` it is never
 * even read). All comparisons are null-safe equality — no floats, no
 * ordering sensitivity, so the merged history is hash-exact across
 * engines.
 */
object Scd {

  def scd2Apply(
      history: DataFrame, snapshot: DataFrame,
      key: String, attrs: Seq[String], asOf: Long): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val outCols = (key +: attrs) ++ Seq("valid_from", "valid_to")
    val open = history.filter(col("valid_to").isNull)
    val closed = history.filter(col("valid_to").isNotNull)
      .select(outCols.map(col): _*)
    val snap = snapshot.select((key +: attrs).map(col): _*)

    val h = open.select(
      col(key).as("__hk") +: col("valid_from").as("__vf") +:
        attrs.map(a => col(a).as(s"__h_$a")): _*)
    val s = snap.select(
      col(key).as("__sk") +: attrs.map(a => col(a).as(s"__s_$a")): _*)
    val j = h.join(s, col("__hk") === col("__sk"), "full_outer")

    val changed = attrs.map(a => !(col(s"__h_$a") <=> col(s"__s_$a")))
      .reduce(_ || _)
    val inBoth = col("__hk").isNotNull && col("__sk").isNotNull

    // surviving open rows: unchanged keep their interval; new and
    // changed keys open at asOf with the snapshot's attributes
    val stillOpen = j.filter(inBoth && !changed)
      .select(col("__hk").as(key) +: attrs.map(a => col(s"__h_$a").as(a)) :+
        col("__vf").as("valid_from") :+ lit(null).cast("long").as("valid_to"): _*)
    val opened = j.filter(col("__hk").isNull || (inBoth && changed))
      .select(col("__sk").as(key) +: attrs.map(a => col(s"__s_$a").as(a)) :+
        lit(asOf).as("valid_from") :+ lit(null).cast("long").as("valid_to"): _*)
    // rows closing at asOf: attribute change or deletion
    val nowClosed = j.filter(col("__hk").isNotNull && (col("__sk").isNull || changed))
      .select(col("__hk").as(key) +: attrs.map(a => col(s"__h_$a").as(a)) :+
        col("__vf").as("valid_from") :+ lit(asOf).cast("long").as("valid_to"): _*)

    closed.unionByName(nowClosed).unionByName(stillOpen).unionByName(opened)
  }

  /** The AS-OF read over an SCD2 history: the attribute values in
    * force at time `t` (half-open intervals: `valid_from ≤ t <
    * valid_to`, open rows unbounded above) — a partition-prunable
    * filter, no join. */
  def scd2AsOf(history: DataFrame, t: Long): DataFrame =
    history.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))
}
