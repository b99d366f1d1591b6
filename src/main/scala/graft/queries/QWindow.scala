package graft.queries

import graft.operators.Rolling
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Window family W1–W12 (SURVEY §2.5) over the `events` stream —
 * partitioned by `user_id`, ordered by `(ts_ns, event_id)` (a total
 * order; `ts_ns` is the exact epoch-nanos long from the source).
 *
 * Money values travel as exact integer cents so running sums are
 * bit-identical to the DuckDB oracle regardless of aggregation
 * association (see [[QueryDef]] conventions).
 *
 * Scale note: all twelve queries share ONE shuffle shape — a single
 * exchange on `user_id` — and stay fully inside whole-stage codegen;
 * stacked windows with the same partitioning reuse the exchange.
 */
object QWindow {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("c", round(col("value") * 100).cast("long"))

  private val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
  private def cum(c: Column) =
    sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Shared DuckDB CTE: events with integer cents and epoch-nanos. */
  private val B =
    """WITH b AS (SELECT event_id, user_id, event_type, value,
      |  CAST(round(value*100) AS BIGINT) AS c, epoch_ns(ts) AS tn FROM events)
      |""".stripMargin
  private val W = "PARTITION BY user_id ORDER BY tn, event_id"

  val defs: Seq[QueryDef] = Seq(

    // W1: lag with default (reference pbp_parser/main.py:61-66,
    // `groupby(contest_id).shift(fill_value=0)`).
    QueryDef.of("w01_lag_default", B +
      s"""SELECT event_id, lag(c, 1, 0) OVER ($W) AS prev_cents,
         |  lag(event_type, 1, 'none') OVER ($W) AS prev_type
         |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("prev_cents", lag("c", 1, 0).over(w))
        .withColumn("prev_type", lag(col("event_type"), 1, "none").over(w))
        .select("event_id", "prev_cents", "prev_type").orderBy("event_id")
    },

    // W2: running sum EXCLUSIVE of the current row (reference
    // columns.py:131-137, `outs_before = shift().cumsum()`).
    QueryDef.of("w02_running_sum_exclusive", B +
      s"""SELECT event_id, coalesce(CAST(SUM(c) OVER ($W
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev_cents
         |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("cum_prev_cents",
          coalesce(sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("event_id", "cum_prev_cents").orderBy("event_id")
    },

    // W3: session id from a shifted boundary flag + running sum
    // (reference columns.py:144-159 — a new game starts AFTER the
    // previous end-flag row).
    QueryDef.of("w03_boundary_session", B +
      s"""SELECT event_id, 1 + CAST(SUM(prev_end) OVER ($W
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |FROM (SELECT *, lag(CASE WHEN event_type='error' THEN 1 ELSE 0 END, 1, 0)
         |        OVER ($W) AS prev_end FROM b)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("prev_end",
          lag(when(col("event_type") === "error", 1L).otherwise(0L), 1, 0).over(w))
        .withColumn("session_id", cum(col("prev_end")) + 1)
        .select("event_id", "session_id").orderBy("event_id")
    },

    // W4: segment total stamped on every row of the segment
    // (reference columns.py:206-216, runs_this_inn).
    QueryDef.of("w04_segment_total", B +
      s"""SELECT event_id, session_id,
         |  CAST(SUM(c) OVER (PARTITION BY user_id, session_id) AS BIGINT) AS seg_total_cents
         |FROM (SELECT *, 1 + CAST(SUM(prev_end) OVER ($W
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |      FROM (SELECT *, lag(CASE WHEN event_type='error' THEN 1 ELSE 0 END, 1, 0)
         |              OVER ($W) AS prev_end FROM b))
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val withSid = ev(s, dir)
        .withColumn("prev_end",
          lag(when(col("event_type") === "error", 1L).otherwise(0L), 1, 0).over(w))
        .withColumn("session_id", cum(col("prev_end")) + 1)
      withSid
        .withColumn("seg_total_cents",
          sum("c").over(Window.partitionBy("user_id", "session_id")))
        .select("event_id", "session_id", "seg_total_cents").orderBy("event_id")
    },

    // W5: remaining-in-segment sum, current row inclusive — the
    // reference's O(n²) Python hotspot collapsed to one O(n) frame
    // (reference columns.py:219-232, runs_roi; BASELINE.md headline).
    QueryDef.of("w05_remaining_sum", B +
      s"""SELECT event_id, CAST(SUM(c) OVER ($W
         |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS remaining_cents
         |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("remaining_cents",
          sum("c").over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .select("event_id", "remaining_cents").orderBy("event_id")
    },

    // W6: first/last row flags per group (reference columns.py:241-253,
    // new_game_fl/game_end_fl).
    QueryDef.of("w06_first_last_flags", B +
      s"""SELECT event_id,
         |  CASE WHEN row_number() OVER ($W) = 1 THEN 1 ELSE 0 END AS is_first,
         |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY tn DESC, event_id DESC) = 1
         |       THEN 1 ELSE 0 END AS is_last
         |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wDesc = Window.partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
      ev(s, dir)
        .withColumn("is_first", (row_number().over(w) === 1).cast("int"))
        .withColumn("is_last", (row_number().over(wDesc) === 1).cast("int"))
        .select("event_id", "is_first", "is_last").orderBy("event_id")
    },

    // W7: group sequence number + modular position (reference
    // helpers.py:119-128 — PA index and bat_order = ((pa-1) % 9) + 1).
    QueryDef.of("w07_seq_mod", B +
      s"""SELECT event_id, clicks_so_far,
         |  CASE WHEN clicks_so_far > 0 THEN ((clicks_so_far - 1) % 9) + 1 END AS batting_slot
         |FROM (SELECT event_id, CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
         |        OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS clicks_so_far
         |      FROM b)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("clicks_so_far",
          cum(when(col("event_type") === "click", 1L).otherwise(0L)))
        .withColumn("batting_slot",
          when(col("clicks_so_far") > 0, (col("clicks_so_far") - 1) % 9 + 1))
        .select("event_id", "clicks_so_far", "batting_slot").orderBy("event_id")
    },

    // W8: ffill + bfill within group (reference helpers.py:131-139,
    // bat-order propagation over non-PA rows).
    QueryDef.of("w08_ffill_bfill", B +
      s"""SELECT event_id,
         |  coalesce(
         |    last_value(pv IGNORE NULLS) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    first_value(pv IGNORE NULLS) OVER ($W ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |  ) AS filled_cents
         |FROM (SELECT *, CASE WHEN event_type='purchase' THEN c END AS pv FROM b)
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("pv", when(col("event_type") === "purchase", col("c")))
        .withColumn("ff", last(col("pv"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("bf", first(col("pv"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("filled_cents", coalesce(col("ff"), col("bf")))
        .select("event_id", "filled_cents").orderBy("event_id")
    },

    // W9: lead — next row's attributes and the gap to it (reference
    // batting.py:263-266, next play's runner ids).
    QueryDef.of("w09_lead", B +
      s"""SELECT event_id, lead(event_type) OVER ($W) AS next_type,
         |  (lead(tn) OVER ($W) - tn) // 1000000000 AS gap_s
         |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("gap_s", expr("(lead(ts_ns, 1) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) - ts_ns) DIV 1000000000"))
        .select("event_id", "next_type", "gap_s").orderBy("event_id")
    },

    // W10: occurrence counter per (entity, kind) — times-through-order
    // (reference add_pbp_metrics.py:203-209, cumcount()+1).
    QueryDef.of("w10_occurrence_counter", B +
      """SELECT event_id, CAST(row_number() OVER (
        |  PARTITION BY user_id, event_type ORDER BY tn, event_id) AS BIGINT) AS occurrence
        |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wt = Window.partitionBy("user_id", "event_type").orderBy("ts_ns", "event_id")
      ev(s, dir)
        .withColumn("occurrence", row_number().over(wt).cast("long"))
        .select("event_id", "occurrence").orderBy("event_id")
    },

    // W11: group max stamped as a column (reference
    // add_pbp_metrics.py:129, transform(max) clamp).
    QueryDef.of("w11_group_max", B +
      """SELECT event_id, CAST(max(c) OVER (PARTITION BY user_id) AS BIGINT) AS max_cents,
        |  CASE WHEN c = max(c) OVER (PARTITION BY user_id) THEN 1 ELSE 0 END AS is_max
        |FROM b ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wp = Window.partitionBy("user_id")
      ev(s, dir)
        .withColumn("max_cents", max("c").over(wp))
        .withColumn("is_max", (col("c") === col("max_cents")).cast("int"))
        .select("event_id", "max_cents", "is_max").orderBy("event_id")
    },

    // W12: row-count rolling mean now-vs-then, latest row per entity
    // with ≥2n events (reference leaderboards/rolling.py:4-59). Values
    // are integer cents so the two engines' means agree bit-for-bit.
    QueryDef.of("w12_rolling_now_then", B +
      s"""SELECT user_id, n_events, round(roll_now, 6) AS roll_now,
         |  round(roll_then, 6) AS roll_then,
         |  round(round(roll_now, 6) - round(roll_then, 6), 6) AS delta
         |FROM (SELECT user_id, roll_now,
         |        lag(roll_now, 25) OVER ($W) AS roll_then,
         |        count(*) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_events,
         |        row_number() OVER (PARTITION BY user_id ORDER BY tn DESC, event_id DESC) AS rn_desc
         |      FROM (SELECT *, avg(c) OVER ($W ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS roll_now
         |            FROM b))
         |WHERE rn_desc = 1 AND n_events >= 50
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Rolling.meanNowVsThen(ev(s, dir), col("user_id"),
          Seq(col("ts_ns"), col("event_id")), col("c"), 25)
        .select("user_id", "n_events", "roll_now", "roll_then", "delta")
        .orderBy("user_id")
    },

    // W13: rolling z-score outlier flags (Rolling.zscoreOutliers) —
    // each reading tested against the 24 PRECEDING rows EXCLUSIVE of
    // itself, flagged when |z| > 2σ. The whole test is ONE exact
    // Long comparison ((m·v−s)² > k²(m·q−s²)) — no division, sqrt or
    // doubles — so the oracle replays it bit-for-bit; windows with
    // <10 observations report unflagged with the count explaining why.
    QueryDef.of("w13_rolling_zscore_outliers", B +
      s"""SELECT event_id, m AS n_win,
         |  (m >= 10 AND (m*c - s)*(m*c - s) > 4*(m*q - s*s)) AS is_outlier
         |FROM (SELECT event_id, c,
         |        count(c) OVER v AS m, SUM(c) OVER v AS s,
         |        SUM(c*c) OVER v AS q
         |      FROM b
         |      WINDOW v AS ($W ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Rolling.zscoreOutliers(ev(s, dir), col("user_id"),
          Seq(col("ts_ns"), col("event_id")), col("c"), n = 24, k = 2, minN = 10)
        .select("event_id", "n_win", "is_outlier").orderBy("event_id")
    },

    // W14: trailing EWMA smoothing (Rolling.ewma) — α = 1/2 over the
    // last 12 rows, pandas adjust=True semantics truncated to a finite
    // horizon. The oracle replays the exact Long-weight formulation
    // (weights 2^(11−j), one final IEEE division), GENERATED from the
    // same horizon constant so the two term lists can never drift.
    QueryDef.of("w14_ewma_smooth", B +
      s"""SELECT event_id,
         |  round(CAST(${ewmaNumSql(12)} AS DOUBLE) / (${ewmaDenSql(12)}), 6) AS ewma
         |FROM b WINDOW v AS ($W) ORDER BY event_id""".stripMargin) { (s, dir) =>
      Rolling.ewma(ev(s, dir), col("user_id"),
          Seq(col("ts_ns"), col("event_id")), col("c"), half = 12)
        .select("event_id", "ewma").orderBy("event_id")
    })

  /** Σ coalesce(lag(c,j), 0) · 2^(half−1−j) — [[Rolling.ewma]]'s exact
    * Long numerator, unrolled for DuckDB. */
  private def ewmaNumSql(half: Int): String =
    (0 until half).map { j =>
      val v = if (j == 0) "c" else s"lag(c, $j) OVER v"
      s"coalesce($v, 0) * ${1L << (half - 1 - j)}"
    }.mkString(" + ")

  /** Σ present(lag(c,j)) · 2^(half−1−j) — the matching denominator. */
  private def ewmaDenSql(half: Int): String =
    (0 until half).map { j =>
      val v = if (j == 0) "c" else s"lag(c, $j) OVER v"
      s"CASE WHEN $v IS NULL THEN 0 ELSE ${1L << (half - 1 - j)} END"
    }.mkString(" + ")
}
