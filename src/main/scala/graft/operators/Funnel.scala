package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel analysis over an event stream: for a step sequence
 * like view → click → purchase, how many users complete each prefix
 * within a conversion window? The standard product-analytics query
 * (every events warehouse ships one) expressed as a JOIN CHAIN of
 * earliest-qualifying-timestamp tables:
 *
 *   t₁(u) = min ts of step₁ events for u
 *   tᵢ(u) = min ts of stepᵢ events with ts > tᵢ₋₁(u)
 *           and ts − t₁(u) ≤ window
 *
 * Each step is ONE conditional aggregation of the events table joined
 * to the previous step's (user, ts) table on the user key — the same
 * equi-join shuffle every other per-user operator here pays, never a
 * per-user sort or a cross join; funnels narrow monotonically, so
 * later steps join against ever-smaller (AQE-broadcastable) sides.
 * Strictly-increasing timestamps between steps mean one event can
 * never satisfy two steps (the standard "ordered funnel" semantics).
 */
object Funnel {

  /**
   * Per-step completion counts: `(step_idx 1-based, step, n_users)`,
   * one row per step in order. `withinSec` bounds EVERY later step
   * relative to the user's step-1 time (the conversion window);
   * `None` = unbounded.
   */
  def stepCounts(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], withinSec: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val e = events.select(
      col(userCol).as("__u"), col(tsCol).as("__ts"), col(typeCol).as("__ty"))

    def within(ts: Column, t1: Column): Column = withinSec match {
      case Some(w) => ts.cast("long") - t1.cast("long") <= w
      case None => lit(true)
    }

    // step 1: earliest step-1 event per user — also the window anchor
    val first = e.filter(col("__ty") === steps.head)
      .groupBy("__u").agg(min(col("__ts")).as("__t1"))

    // fold the remaining steps; `reached` carries (user, t1, t_prev)
    val reachedAll = steps.tail.scanLeft(
      first.withColumn("__tp", col("__t1"))) { (prev, step) =>
      e.filter(col("__ty") === step)
        .join(prev.select("__u", "__t1", "__tp"), Seq("__u"))
        .filter(col("__ts") > col("__tp") && within(col("__ts"), col("__t1")))
        .groupBy(col("__u"), col("__t1"))
        .agg(min(col("__ts")).as("__tp"))
    }

    reachedAll.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _).orderBy("step_idx")
  }

  /**
   * Weekly cohort retention — the other canonical product-analytics
   * query: users grouped by the week of their FIRST event, counted in
   * every later week they were active. Returns
   * `(cohort_week_us, week_offset, n_users)`.
   *
   * Two bounded aggregations (per-user first week; distinct
   * (user, week) activity) and one user-keyed equi-join — activity is
   * distinct per (user, week) and a week maps to exactly one offset,
   * so the final count needs no count-distinct rewrite. ISO
   * Monday-start weeks (`date_trunc("week")`) on both engines.
   */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekUs = 604800000000L
    val f = events.groupBy(col(userCol).as("__u"))
      .agg(date_trunc("week", min(col(tsCol))).as("__cw"))
    val a = events
      .select(col(userCol).as("__u"), date_trunc("week", col(tsCol)).as("__w"))
      .distinct()
    f.join(a, Seq("__u"))
      .groupBy(
        unix_micros(col("__cw")).as("cohort_week_us"),
        floor((unix_micros(col("__w")) - unix_micros(col("__cw"))) / weekUs)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week_us", "week_offset")
  }
}
