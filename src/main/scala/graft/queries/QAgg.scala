package graft.queries

import graft.functions.ScalarFunctions.safeDiv
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Aggregation family A1–A16 (SURVEY §2.4), re-expressed over the
 * harness star schema. Each query keeps the SHAPE of the reference
 * aggregate (pivot matrix, two-level agg, conditional-count kernel,
 * league-rate feedback, …) with reference file:line cited per query;
 * the domain columns are the harness tables' (the driver's DuckDB
 * oracle checks results at sf0.01).
 *
 * Scale notes: every aggregate here is a single hash-aggregation
 * (map-side partial agg → one shuffle on the group key). The
 * global-scalar feedback queries (A2/A3/A9) broadcast a 1-row
 * aggregate back into the big side — `crossJoin(broadcast(...))` —
 * instead of a window-over-() which would funnel all rows into one
 * partition.
 */
object QAgg {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // A1: RE24-style matrix — groupBy two keys, pivot one into columns
    // (reference processors/get_er_matrix.py:11-63).
    QueryDef.of("a01_pivot_matrix",
      """SELECT l_returnflag,
        |  round(avg(CASE WHEN l_linestatus='F' THEN l_quantity END), 4) AS F,
        |  round(avg(CASE WHEN l_linestatus='O' THEN l_quantity END), 4) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(avg("l_quantity"), 4))
        .orderBy("l_returnflag")
    },

    // A2: linear-weights shape — per-class mean minus a baseline
    // class's mean (reference processors/get_linear_weights.py:12-111).
    QueryDef.of("a02_linear_weights",
      """SELECT event_type, count(*) AS n,
        |  round(avg(value) - (SELECT avg(value) FROM events WHERE event_type='view'), 4) AS lw
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val perClass = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), avg("value").as("avg_val"))
      val base = perClass.filter(col("event_type") === "view")
        .select(col("avg_val").as("base_val"))
      perClass.crossJoin(broadcast(base))
        .select(col("event_type"), col("n"),
          round(col("avg_val") - col("base_val"), 4).as("lw"))
        .orderBy("event_type")
    },

    // A3: global-scale normalization — group sums divided by the
    // global sum (reference processors/get_linear_weights.py:114-151).
    QueryDef.of("a03_scale_normalize",
      """WITH g AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, sum_cents,
        |  round(sum_cents / (SELECT CAST(SUM(sum_cents) AS DOUBLE) FROM g), 6) AS share
        |FROM g ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val grp = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(sum(cents(col("l_extendedprice"))).as("sum_cents"))
      val tot = grp.agg(sum("sum_cents").cast("double").as("tot_cents"))
      grp.crossJoin(broadcast(tot))
        .select(col("l_returnflag"), col("sum_cents"),
          round(col("sum_cents") / col("tot_cents"), 6).as("share"))
        .orderBy("l_returnflag")
    },

    // A4: GUTS-style two-level aggregate — groupBy(entity).sum then a
    // global mean of the per-entity sums (reference
    // processors/get_guts.py:29-117, `groupby(contest_id).sum().mean()`).
    QueryDef.of("a04_two_level_agg",
      """SELECT count(*) AS n_cust,
        |  round(avg(cust_cents / 100.0), 4) AS avg_cust_total,
        |  max(cust_cents) AS max_cust_cents
        |FROM (SELECT o_custkey,
        |        CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cust_cents
        |      FROM orders GROUP BY o_custkey)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey").agg(sum(cents(col("o_totalprice"))).as("cust_cents"))
        .agg(count(lit(1)).as("n_cust"),
          round(avg(col("cust_cents") / lit(100.0)), 4).as("avg_cust_total"),
          max("cust_cents").as("max_cust_cents"))
    },

    // A5: the per-entity metric kernel — one groupBy with conditional
    // event-type counts and derived rates (reference
    // processors/leaderboards/common.py:23-63; replaces the per-group
    // Python loop with ONE vectorized agg).
    QueryDef.of("a05_event_kernel",
      """SELECT user_id, count(*) AS n_events,
        |  count(CASE WHEN event_type='click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type='view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type='signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type='error' THEN 1 END) AS n_error,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  round(CASE WHEN count(CASE WHEN event_type='click' THEN 1 END) <> 0
        |    THEN count(CASE WHEN event_type='purchase' THEN 1 END)
        |         / CAST(count(CASE WHEN event_type='click' THEN 1 END) AS DOUBLE)
        |    ELSE 0.0 END, 6) AS conv_rate,
        |  round((count(CASE WHEN event_type='click' THEN 1 END)
        |         + count(CASE WHEN event_type='view' THEN 1 END))
        |        / CAST(count(*) AS DOUBLE), 6) AS engagement
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      def n(t: String) = count(when(col("event_type") === t, 1))
      Tables.events(s, dir).groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          n("click").as("n_click"), n("view").as("n_view"),
          n("purchase").as("n_purchase"), n("signup").as("n_signup"),
          n("error").as("n_error"),
          sum(cents(col("value"))).as("value_cents"))
        .withColumn("conv_rate",
          round(safeDiv(col("n_purchase").cast("double"), col("n_click")), 6))
        .withColumn("engagement",
          round((col("n_click") + col("n_view")) / col("n_events").cast("double"), 6))
        .orderBy("user_id")
    },

    // A6: situational splits in ONE pass — conditional sums per band
    // instead of filter-and-reaggregate per split (reference
    // processors/leaderboards/situational.py:19-150; SURVEY picks
    // plan (b), `sum(when(cond, …))`).
    QueryDef.of("a06_situational_splits",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_discount < 0.03 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_low,
        |  CAST(SUM(CASE WHEN l_discount >= 0.03 AND l_discount < 0.07 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_mid,
        |  CAST(SUM(CASE WHEN l_discount >= 0.07 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_high,
        |  count(CASE WHEN l_discount < 0.03 THEN 1 END) AS n_low,
        |  count(CASE WHEN l_discount >= 0.03 AND l_discount < 0.07 THEN 1 END) AS n_mid,
        |  count(CASE WHEN l_discount >= 0.07 THEN 1 END) AS n_high
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val lo = col("l_discount") < 0.03
      val mid = col("l_discount") >= 0.03 && col("l_discount") < 0.07
      val hi = col("l_discount") >= 0.07
      val q = col("l_quantity").cast("long")
      Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
          sum(when(lo, q).otherwise(0L)).as("qty_low"),
          sum(when(mid, q).otherwise(0L)).as("qty_mid"),
          sum(when(hi, q).otherwise(0L)).as("qty_high"),
          count(when(lo, 1)).as("n_low"),
          count(when(mid, 1)).as("n_mid"),
          count(when(hi, 1)).as("n_high"))
        .orderBy("l_returnflag")
    },

    // A7: flag-profile aggregate — boolean-flag sums + ratios + a
    // cross-flag sub-count folded into the same agg (reference
    // processors/leaderboards/batted_ball.py:77-161).
    QueryDef.of("a07_profile_flags",
      """SELECT user_id, count(*) AS n,
        |  count(CASE WHEN event_type='click' THEN 1 END) AS n_click,
        |  count(CASE WHEN value > 10 THEN 1 END) AS n_hard,
        |  count(CASE WHEN event_type='click' AND value > 10 THEN 1 END) AS n_hard_click,
        |  round(count(CASE WHEN event_type='click' THEN 1 END) / CAST(count(*) AS DOUBLE), 6) AS click_rate,
        |  round(count(CASE WHEN value > 10 THEN 1 END) / CAST(count(*) AS DOUBLE), 6) AS hard_rate
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).groupBy("user_id").agg(
          count(lit(1)).as("n"),
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("value") > 10, 1)).as("n_hard"),
          count(when(col("event_type") === "click" && col("value") > 10, 1)).as("n_hard_click"))
        .withColumn("click_rate", round(col("n_click") / col("n").cast("double"), 6))
        .withColumn("hard_rate", round(col("n_hard") / col("n").cast("double"), 6))
        .orderBy("user_id")
    },

    // A8: explode-to-long then aggregate — union of two role
    // projections, countDistinct per entity (reference steal
    // opportunities, processors/leaderboards/baserunning.py:57-192).
    QueryDef.of("a08_union_explode_agg",
      """SELECT entity_id, role, count(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM (
        |  SELECT l_partkey AS entity_id, 'part' AS role, l_orderkey, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_suppkey AS entity_id, 'supp' AS role, l_orderkey, l_quantity FROM lineitem)
        |GROUP BY entity_id, role ORDER BY role, entity_id""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val parts = li.select(col("l_partkey").as("entity_id"), lit("part").as("role"),
        col("l_orderkey"), col("l_quantity"))
      val supps = li.select(col("l_suppkey").as("entity_id"), lit("supp").as("role"),
        col("l_orderkey"), col("l_quantity"))
      parts.unionByName(supps)
        .groupBy("entity_id", "role")
        .agg(countDistinct("l_orderkey").as("n_orders"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("role", "entity_id")
    },

    // A9: league-rate-scaled metric — conditional agg per entity, the
    // global rate broadcast back in (reference wGDP,
    // processors/leaderboards/baserunning.py:195-218).
    QueryDef.of("a09_rate_scaled",
      """WITH opp AS (SELECT * FROM lineitem WHERE l_quantity >= 30),
        |lg AS (SELECT count(CASE WHEN l_returnflag='R' THEN 1 END) / CAST(count(*) AS DOUBLE) AS r FROM opp)
        |SELECT l_suppkey, count(*) AS opps,
        |  count(CASE WHEN l_returnflag='R' THEN 1 END) AS dps,
        |  round(((SELECT r FROM lg) * count(*)
        |         - count(CASE WHEN l_returnflag='R' THEN 1 END)) * 0.5, 6) AS wgdp
        |FROM opp GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      val opp = Tables.lineitem(s, dir).filter(col("l_quantity") >= 30)
      val perSupp = opp.groupBy("l_suppkey").agg(
        count(lit(1)).as("opps"),
        count(when(col("l_returnflag") === "R", 1)).as("dps"))
      val lg = opp.agg(
        (count(when(col("l_returnflag") === "R", 1)).cast("double") / count(lit(1))).as("lg_rate"))
      perSupp.crossJoin(broadcast(lg))
        .select(col("l_suppkey"), col("opps"), col("dps"),
          round((col("lg_rate") * col("opps") - col("dps")) * 0.5, 6).as("wgdp"))
        .orderBy("l_suppkey")
    },

    // A10: wEBT shape — union of masked scenario projections, grouped,
    // weighted by per-scenario league success rates (reference
    // processors/leaderboards/batting.py:291-356, baserunning.py:221-352).
    QueryDef.of("a10_scenario_weighted",
      """WITH p AS (
        |  SELECT l_suppkey, 's1' AS scenario, count(*) AS opps,
        |    count(CASE WHEN l_quantity > 25 THEN 1 END) AS succs,
        |    count(CASE WHEN l_tax > 0.06 THEN 1 END) AS outs
        |  FROM lineitem WHERE l_linestatus='F' GROUP BY l_suppkey
        |  UNION ALL
        |  SELECT l_suppkey, 's2', count(*),
        |    count(CASE WHEN l_quantity > 40 THEN 1 END),
        |    count(CASE WHEN l_tax > 0.07 THEN 1 END)
        |  FROM lineitem WHERE l_linestatus='O' AND l_discount >= 0.05 GROUP BY l_suppkey),
        |w AS (SELECT *,
        |    CAST(SUM(succs) OVER (PARTITION BY scenario) AS DOUBLE)
        |      / CAST(SUM(opps) OVER (PARTITION BY scenario) AS DOUBLE) AS lg_rate
        |  FROM p)
        |SELECT l_suppkey, CAST(SUM(opps) AS BIGINT) AS opps,
        |  round(SUM(round((succs - lg_rate * opps) * 0.3 - outs * 0.6, 4)), 4) AS webt_total
        |FROM w GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      def scen(name: String, filt: org.apache.spark.sql.Column,
               succ: org.apache.spark.sql.Column, out: org.apache.spark.sql.Column) =
        li.filter(filt).groupBy("l_suppkey").agg(
            count(lit(1)).as("opps"), count(when(succ, 1)).as("succs"),
            count(when(out, 1)).as("outs"))
          .withColumn("scenario", lit(name))
      val packed = scen("s1", col("l_linestatus") === "F",
          col("l_quantity") > 25, col("l_tax") > 0.06)
        .unionByName(scen("s2", col("l_linestatus") === "O" && col("l_discount") >= 0.05,
          col("l_quantity") > 40, col("l_tax") > 0.07))
      val wr = Window.partitionBy("scenario")
      packed
        .withColumn("lg_rate",
          sum("succs").over(wr).cast("double") / sum("opps").over(wr).cast("double"))
        .withColumn("webt",
          round((col("succs") - col("lg_rate") * col("opps")) * 0.3 - col("outs") * 0.6, 4))
        .groupBy("l_suppkey")
        .agg(sum("opps").as("opps"), round(sum("webt"), 4).as("webt_total"))
        .orderBy("l_suppkey")
    },

    // A11: clutch/WPA-style signed splits — positive/negative part
    // sums and a ratio-of-aggregates metric (reference
    // processors/leaderboards/batting.py:174-211, value.py:13-229).
    QueryDef.of("a11_clutch_splits",
      """SELECT user_id,
        |  round(SUM(value), 2) AS wpa_sum,
        |  round(SUM(CASE WHEN value > 8.0 THEN value END), 2) AS wpa_plus,
        |  round(SUM(CASE WHEN value <= 8.0 THEN value END), 2) AS wpa_minus,
        |  round(avg(value), 6) AS li_avg,
        |  round(SUM(value / (abs(value) + 1.0)), 6) AS wpa_li
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).groupBy("user_id").agg(
          round(sum("value"), 2).as("wpa_sum"),
          round(sum(when(col("value") > 8.0, col("value"))), 2).as("wpa_plus"),
          round(sum(when(col("value") <= 8.0, col("value"))), 2).as("wpa_minus"),
          round(avg("value"), 6).as("li_avg"),
          round(sum(col("value") / (abs(col("value")) + 1.0)), 6).as("wpa_li"))
        .orderBy("user_id")
    },

    // A12: GMLI shape — lead() at first appearance per (entity, group),
    // then a per-entity mean (reference processors/leaderboards/
    // pitching.py:157-168).
    QueryDef.of("a12_entry_lead_mean",
      """SELECT user_id, round(avg(next_val), 4) AS gmli, count(*) AS n_entries
        |FROM (SELECT user_id,
        |        lead(value) OVER (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts), event_id) AS next_val,
        |        row_number() OVER (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts), event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 AND next_val IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_ns", "event_id")
      Tables.events(s, dir)
        .withColumn("next_val", lead("value", 1).over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("next_val").isNotNull)
        .groupBy("user_id")
        .agg(round(avg("next_val"), 4).as("gmli"), count(lit(1)).as("n_entries"))
        .orderBy("user_id")
    },

    // A13: roll-up with sum + representative-value aggs (reference
    // processors/war_calculation/common.py:39-48 — `first` made
    // deterministic as min).
    QueryDef.of("a13_rollup",
      """SELECT n_name,
        |  CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents,
        |  min(c_name) AS first_cust, count(*) AS n_cust,
        |  round(CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 4) AS bal_per_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("c_acctbal"))).as("bal_cents"),
          min("c_name").as("first_cust"), count(lit(1)).as("n_cust"))
        .withColumn("bal_per_cust", round(col("bal_cents") / lit(100.0) / col("n_cust"), 4))
        .orderBy("n_name")
    },

    // A14: groupby().transform(sum) — a window aggregate stamped onto
    // every row (reference processors/war_calculation/calculator.py:
    // 171-175; avoids the per-conference Python loop).
    QueryDef.of("a14_window_transform",
      """SELECT c_custkey, bal_cents,
        |  CAST(SUM(bal_cents) OVER (PARTITION BY n_name) AS BIGINT) AS conf_total_cents,
        |  round(bal_cents / CAST(SUM(bal_cents) OVER (PARTITION BY n_name) AS DOUBLE), 6) AS conf_share
        |FROM (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents, n_name
        |      FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("n_name")
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"), col("n_name"))
        .withColumn("conf_total_cents", sum("bal_cents").over(w))
        .withColumn("conf_share",
          round(col("bal_cents") / col("conf_total_cents").cast("double"), 6))
        .drop("n_name")
        .orderBy("c_custkey")
    },

    // A15: prob_score — share of positive outcomes per group
    // (reference processors/get_er_matrix.py:21, `(x > 0).mean()`).
    QueryDef.of("a15_prob_score",
      """SELECT l_returnflag,
        |  round(avg(CASE WHEN l_discount > 0 THEN 1.0 ELSE 0.0 END), 6) AS prob_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(avg(when(col("l_discount") > 0, 1.0).otherwise(0.0)), 6).as("prob_disc"))
        .orderBy("l_returnflag")
    },

    // A16: exact distinct counting (reference `nunique`,
    // processors/leaderboards/baserunning.py:123).
    QueryDef.of("a16_distinct_counts",
      """SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
        |  count(DISTINCT c_custkey) AS n_cust, count(*) AS n_rows
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).groupBy("c_nationkey")
        .agg(countDistinct("c_mktsegment").as("n_segments"),
          countDistinct("c_custkey").as("n_cust"),
          count(lit(1)).as("n_rows"))
        .orderBy("c_nationkey")
    },

    // A17 (beyond-reference corpus stats): EXACT discrete percentiles
    // via the value histogram — one hash aggregation bounds the
    // shuffle by |distinct values|, the prefix sum runs over that
    // dimension-sized table, each p picks min value with
    // cum ≥ ceil(p·n). No corpus-wide sort at any scale.
    QueryDef.of("a17_exact_percentiles",
      """WITH h AS (SELECT l_quantity AS v, count(*) AS c FROM lineitem GROUP BY 1),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM lineitem),
        |ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS p)
        |SELECT p, min(v) AS value
        |FROM ps CROSS JOIN n JOIN cum ON cum.cum >= ceil(p * n.n)
        |GROUP BY p ORDER BY p""".stripMargin) { (s, dir) =>
      graft.operators.Quantiles.exactPercentiles(
        Tables.lineitem(s, dir), "l_quantity",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    },

    // A18: per-group exact percentiles (per-language document-length
    // distribution — the corpus-stats table a pipeline monitors).
    // Histogram per (group, value), one window pass for cum + total,
    // broadcast percentile list; shuffle never exceeds the histogram.
    QueryDef.of("a18_grouped_percentiles",
      """WITH h AS (SELECT lang AS g, n_chars AS v, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n FROM h),
        |ps AS (SELECT unnest([0.25, 0.5, 0.9]) AS p)
        |SELECT g AS lang, p, min(v) AS value
        |FROM cum CROSS JOIN ps WHERE cum.cum >= ceil(p * n)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.Quantiles.exactPercentilesByGroup(
        Tables.documents(s, dir), "lang", "n_chars", Seq(0.25, 0.5, 0.9))
    },

    // A19 (beyond-reference corpus stats): KMV distinct-count sketch
    // (Sketches.kmvDistinct) — distinct users per event type with
    // bounded aggregation state. The sketch (k smallest distinct
    // 60-bit md5 hashes) is a pure function of the hash SET, so the
    // estimate is hash-exact reproducible; the oracle replicates it
    // with row_number over distinct hashes. k=32 so the estimator
    // branch fires at sf0.01+ (150+ distinct users); under-full
    // groups fall back to the exact count.
    QueryDef.of("a19_kmv_distinct",
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |s AS (SELECT event_type,
        |    count(*) FILTER (WHERE rn <= 32) AS n_kept,
        |    max(h) FILTER (WHERE rn = 32) AS kth FROM r GROUP BY event_type)
        |SELECT event_type, n_kept,
        |  CASE WHEN n_kept < 32 THEN n_kept
        |       ELSE CAST(round(31 * 1152921504606846976.0 / kth) AS BIGINT)
        |  END AS est_distinct
        |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.kmvDistinct(
          Tables.events(s, dir), Seq("event_type"), "user_id", k = 32)
        .orderBy("event_type")
    },

    // A20 (beyond-reference corpus stats): APPROXIMATE percentiles for
    // continuous columns — the bounded-state path a17's limit-probe
    // points at (Quantiles.approxPercentilesBinned). Two passes: value
    // range, then a fixed 512-bin histogram (state bounded at 512
    // regardless of cardinality); the pick replays a17's
    // integer-rational threshold over the bin grid and returns the max
    // OBSERVED value of the bin containing the true quantile —
    // deterministic error ≤ (hi−lo)/512 (specced against the exact
    // path). Every per-row step is two IEEE double ops, so the oracle
    // replays it bit-exactly (the a19 estimator-replay idiom).
    QueryDef.of("a20_approx_percentiles",
      """WITH mm AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
        |    max(CAST(l_extendedprice AS DOUBLE)) AS hi FROM lineitem),
        |b AS (SELECT CASE WHEN hi = lo THEN 0
        |      ELSE least(511, CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo) * 512.0
        |                                 / (hi - lo)) AS INT)) END AS bin,
        |    CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem CROSS JOIN mm),
        |h AS (SELECT bin, count(*) AS c, max(v) AS rep FROM b GROUP BY 1),
        |cum AS (SELECT bin, rep, SUM(c) OVER (ORDER BY bin) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM lineitem),
        |ps AS (SELECT * FROM (VALUES (0.5, 5, 10), (0.9, 9, 10), (0.99, 99, 100))
        |       AS t(p, num, den))
        |SELECT p, min(rep) AS value
        |FROM ps CROSS JOIN n JOIN cum ON cum.cum * den >= num * n.n
        |GROUP BY p ORDER BY p""".stripMargin) { (s, dir) =>
      graft.operators.Quantiles.approxPercentilesBinned(
        Tables.lineitem(s, dir), "l_extendedprice",
        Seq(0.5, 0.9, 0.99), bins = 512)
    },

    // A21 (beyond-reference corpus stats): KMV SET OPERATIONS —
    // pairwise distinct-user overlap between event types from the a19
    // sketches alone (Sketches.kmvOverlapMatrix; Beyer et al. SIGMOD
    // 2007): union sketch by re-insertion, K∩ within the synopsis,
    // Jaccard = K∩/|L|, intersection = Jaccard · est(union). One
    // bounded-state corpus pass + a KB-sized broadcast self-join; the
    // oracle replays the whole estimator over distinct hashes (the
    // a19 idiom).
    QueryDef.of("a21_kmv_overlap",
      """WITH d AS (SELECT DISTINCT event_type AS g,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d),
        |sk AS (SELECT g, h FROM r WHERE rn <= 32),
        |eg AS (SELECT g, count(*) AS kk, max(h) AS kth FROM sk GROUP BY g),
        |es AS (SELECT g, CASE WHEN kk < 32 THEN kk
        |    ELSE CAST(round(31 * 1152921504606846976.0 / kth) AS BIGINT) END AS est
        |  FROM eg),
        |pr AS (SELECT a.g AS g1, b.g AS g2 FROM es a JOIN es b ON a.g < b.g),
        |uh AS (SELECT p.g1, p.g2, s.h FROM pr p JOIN sk s ON s.g = p.g1 OR s.g = p.g2
        |  GROUP BY 1, 2, 3),
        |ur AS (SELECT g1, g2, h,
        |    row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn FROM uh),
        |u AS (SELECT g1, g2, h FROM ur WHERE rn <= 32),
        |us AS (SELECT g1, g2, count(*) AS ku, max(h) AS kth FROM u GROUP BY 1, 2),
        |ui AS (SELECT u.g1, u.g2, count(*) AS n_inter
        |  FROM u JOIN sk s1 ON s1.g = u.g1 AND s1.h = u.h
        |         JOIN sk s2 ON s2.g = u.g2 AND s2.h = u.h
        |  GROUP BY 1, 2)
        |SELECT us.g1, us.g2, ea.est AS est_a, eb.est AS est_b,
        |  CASE WHEN us.ku < 32 THEN us.ku
        |       ELSE CAST(round(31 * 1152921504606846976.0 / us.kth) AS BIGINT)
        |  END AS est_union,
        |  COALESCE(ui.n_inter, 0) AS n_inter,
        |  CAST(round(CAST(COALESCE(ui.n_inter, 0) AS DOUBLE) *
        |    (CASE WHEN us.ku < 32 THEN us.ku
        |          ELSE CAST(round(31 * 1152921504606846976.0 / us.kth) AS BIGINT) END)
        |    / us.ku) AS BIGINT) AS est_inter,
        |  round(CAST(COALESCE(ui.n_inter, 0) AS DOUBLE) / us.ku, 6) AS jaccard
        |FROM us
        |JOIN es ea ON ea.g = us.g1 JOIN es eb ON eb.g = us.g2
        |LEFT JOIN ui ON ui.g1 = us.g1 AND ui.g2 = us.g2
        |ORDER BY us.g1, us.g2""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.kmvOverlapMatrix(
        Tables.events(s, dir), "event_type", "user_id", k = 32)
    },

    // A22 (beyond-reference corpus stats): MERGEABLE fixed-grid
    // histogram synopsis — per-SOURCE partial histograms on a pinned
    // [0, 1024)×256 grid (the "one synopsis per ingest partition"
    // shape), merged (counts add, reps max — associative), then the
    // a20 percentile pick over the merged table. Merged ≡ one-shot is
    // the spec-pinned invariant, so the oracle replays the one-shot
    // histogram; grid arithmetic is binary-exact (width 4).
    QueryDef.of("a22_histogram_synopsis",
      """WITH b AS (SELECT least(255, greatest(0,
        |      CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) * 256.0 / 1024.0) AS INT)))
        |      AS bin,
        |    CAST(n_chars AS DOUBLE) AS v
        |  FROM documents),
        |h AS (SELECT bin, count(*) AS c, max(v) AS rep FROM b GROUP BY 1),
        |cum AS (SELECT bin, rep, SUM(c) OVER (ORDER BY bin) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM documents),
        |ps AS (SELECT * FROM (VALUES (0.25, 25, 100), (0.5, 5, 10),
        |       (0.75, 75, 100), (0.99, 99, 100)) AS t(p, num, den))
        |SELECT p, min(rep) AS value
        |FROM ps CROSS JOIN n JOIN cum ON cum.cum * den >= num * n.n
        |GROUP BY p ORDER BY p""".stripMargin) { (s, dir) =>
      val q = graft.operators.Quantiles
      val partials = q.binnedHistogram(
        Tables.documents(s, dir), "n_chars", lo = 0.0, hi = 1024.0,
        bins = 256, parts = Seq("source"))
      q.percentilesFromHistogram(
        q.mergeBinnedHistograms(partials),
        Seq(0.25, 0.5, 0.75, 0.99))
    },

    // A23 (beyond-reference corpus stats): WEIGHTED percentiles —
    // character-mass quantiles of document length ("the median
    // character lives in a doc of ≥ X chars", the number that sizes
    // packing/chunking budgets; the doc-count median understates it
    // whenever long docs carry most of the mass). Same bounded value
    // histogram with c = Σweight, same integer-rational threshold.
    QueryDef.of("a23_weighted_percentiles",
      """WITH h AS (SELECT n_chars AS v, CAST(SUM(n_chars) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS n FROM documents),
        |ps AS (SELECT * FROM (VALUES (0.25, 25, 100), (0.5, 5, 10),
        |       (0.9, 9, 10))
        |       AS t(p, num, den))
        |SELECT p, min(v) AS value
        |FROM ps CROSS JOIN n JOIN cum ON cum.cum * den >= num * n.n
        |GROUP BY p ORDER BY p""".stripMargin) { (s, dir) =>
      graft.operators.Quantiles.exactPercentilesWeighted(
        Tables.documents(s, dir), "n_chars", "n_chars",
        Seq(0.25, 0.5, 0.9))
    },

    // A26: ROLLUP — multi-level totals in one pass (the subtotal/
    // grand-total report every BI surface asks of an engine): per
    // (returnflag, linestatus), per returnflag, and overall, from a
    // single Expand + aggregate. NULL group columns mark subtotal
    // levels on both engines; grouping_id disambiguates a genuine
    // NULL value from a rollup level.
    QueryDef.of("a26_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("lvl"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("lvl"),
          col("n"), col("qty"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // A27: general GROUPING SETS — the full multi-level aggregation
    // surface a26's ROLLUP is the prefix-chain special case of (and
    // cube() the complete-powerset case). The set list here —
    // (rf, ls), (rf), (ls) — is expressible as NEITHER rollup nor
    // cube (no grand total), so it exercises the arbitrary-set
    // machinery: Catalyst plans ONE Expand (one row copy per set) into
    // ONE hash aggregate keyed by (keys, grouping_id) — one exchange
    // total, levels never re-scan the input (plan-audited). At 100 TB
    // the Expand multiplies rows by |sets| map-side BEFORE partial
    // aggregation absorbs them — the same one-pass shape the
    // reference would need |sets| separate groupbys for (SURVEY §2.4).
    QueryDef.of("a27_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY lvl, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("lvl"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("lvl"),
          col("n"), col("qty"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // A25 (beyond-reference corpus stats): WINDOWED distinct-count
    // synopsis — the a19 KMV sketch composed with an event-time hour
    // bucket ("distinct users per hour" at bounded state per window,
    // the shape a streaming job persists per window and merges at
    // read). Pure composition: the window column is just another
    // group key to the bounded aggregation.
    QueryDef.of("a25_windowed_distinct",
      """WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS w,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT w, h, row_number() OVER (PARTITION BY w ORDER BY h) AS rn FROM h),
        |s AS (SELECT w, count(*) FILTER (WHERE rn <= 32) AS n_kept,
        |    max(h) FILTER (WHERE rn = 32) AS kth FROM r GROUP BY w)
        |SELECT epoch_us(w) AS hour_us, n_kept,
        |  CASE WHEN n_kept < 32 THEN n_kept
        |       ELSE CAST(round(31 * 1152921504606846976.0 / kth) AS BIGINT)
        |  END AS est_distinct
        |FROM s ORDER BY hour_us""".stripMargin) { (s, dir) =>
      graft.operators.Sketches.kmvDistinct(
          Tables.events(s, dir).withColumn("w", date_trunc("hour", col("ts"))),
          Seq("w"), "user_id", k = 32)
        .select(unix_micros(col("w")).as("hour_us"),
          col("n_kept"), col("est_distinct"))
        .orderBy("hour_us")
    },

    // A24 (beyond-reference corpus stats): COUNT-MIN sketch — the
    // approximate-frequency member of the synopsis family (Cormode &
    // Muthukrishnan 2005; KMV = distinct, t44 = exact heavy hitters,
    // CMS = any-item counts in depth·width state). The query builds
    // the sketch as THREE disjoint-slice partials merged by counter
    // addition (merged ≡ one-shot is spec-pinned, so the oracle
    // replays the one-shot build), then point-queries 20 users.
    // Counters are pure functions of the value multiset via the
    // portable salted md5 hash — DuckDB replays every cell.
    QueryDef.of("a24_cms_counts",
      """WITH rr AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
        |p AS (SELECT rr.r,
        |    ('0x' || substr(md5('cms' || rr.r || ':' || CAST(user_id AS VARCHAR)),
        |      1, 15))::BIGINT % 64 AS b
        |  FROM events CROSS JOIN rr),
        |sk AS (SELECT r, b, count(*) AS c FROM p GROUP BY r, b),
        |it AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
        |ip AS (SELECT it.user_id, rr.r,
        |    ('0x' || substr(md5('cms' || rr.r || ':' || CAST(it.user_id AS VARCHAR)),
        |      1, 15))::BIGINT % 64 AS b
        |  FROM it CROSS JOIN rr)
        |SELECT user_id, CAST(min(coalesce(sk.c, 0)) AS BIGINT) AS est_count
        |FROM ip LEFT JOIN sk USING (r, b)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val (d, w) = (4, 64)
      val sk = graft.operators.Sketches.cmsMerge(
        (0 until 3).map(k => graft.operators.Sketches.cmsBuild(
          ev.filter(pmod(col("user_id"), lit(3)) === k), "user_id", d, w))
          .reduce(_ union _))
      graft.operators.Sketches.cmsEstimate(
          sk, ev.select("user_id").distinct().filter(col("user_id") < 20),
          "user_id", d, w)
        .orderBy("user_id")
    },

    // A28: grouped median absolute deviation (Quantiles.groupedMad) —
    // the robust dispersion for outlier-resistant data cleaning.
    // Nearest-rank medians (cum·2 ≥ n, pure integers) keep median and
    // MAD actual cent values; the oracle replays both histogram
    // passes and the deviation join.
    QueryDef.of("a28_grouped_mad",
      """WITH b AS (SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS v
        |  FROM events),
        |h AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
        |cu AS (SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n FROM h),
        |med AS (SELECT g, min(CASE WHEN cum*2 >= n THEN v END) AS median,
        |    CAST(max(n) AS BIGINT) AS n FROM cu GROUP BY g),
        |d AS (SELECT b.g, abs(b.v - med.median) AS v FROM b JOIN med USING (g)),
        |h2 AS (SELECT g, v, count(*) AS c FROM d GROUP BY 1, 2),
        |cu2 AS (SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n FROM h2),
        |mad AS (SELECT g, min(CASE WHEN cum*2 >= n THEN v END) AS mad FROM cu2 GROUP BY g)
        |SELECT med.g AS event_type, med.n, med.median AS median_cents,
        |  mad.mad AS mad_cents
        |FROM med JOIN mad USING (g) ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Quantiles.groupedMad(
          Tables.events(s, dir)
            .select(col("event_type"), round(col("value") * 100).cast("long").as("cents")),
          "event_type", "cents")
        .select(col("event_type"), col("n"),
          col("median").as("median_cents"), col("mad").as("mad_cents"))
        .orderBy("event_type")
    })
}
