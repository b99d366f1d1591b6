package graft.queries

import graft.io.{Publish, Sinks}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sorts/limits (O1–O5), set operations (E1–E4) and source/sink
 * operators (S1, S6–S8) — SURVEY §2.1/2.6/2.7.
 *
 * The sink queries (s07/s08) exercise REAL writes: they round-trip
 * through `/tmp` files and the oracle checks the re-read result, so a
 * broken writer (schema drift, partition-overwrite clobbering
 * untouched partitions) fails the hash compare.
 */
object QRelational {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** Scratch path for sink round-trips: a process-unique temp dir per
    * (tag, input dir) — two concurrent harness processes can never
    * clobber each other's files mid-read — deleted on JVM exit so
    * repeated runs don't accumulate corpus-sized directories in /tmp
    * (within one process the same path is reused and self-overwrites). */
  private val scratchDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def scratch(dir: String, tag: String): String =
    scratchDirs.getOrElseUpdate(s"$tag|$dir", {
      val p = java.nio.file.Files.createTempDirectory(s"graft_$tag").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
        }
        del(p)
      }))
      p.getAbsolutePath
    })

  val defs: Seq[QueryDef] = Seq(

    // O1+O5: deterministic global sort + limit (reference
    // pbp_parser/main.py:42 output ordering).
    QueryDef.of("o01_global_sort_limit",
      """SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
    },

    // O2: sort within group — per-entity ordered event sequence
    // (reference pitching.py:160, sort before stateful processing).
    QueryDef.of("o02_sort_within_group",
      """SELECT user_id, string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY epoch_ns(ts), event_id) AS event_seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts_ns"), col("event_id")))),
            x => x.getField("event_id").cast("string")),
          ",").as("event_seq"))
        .orderBy("user_id")
    },

    // O3: ordered dedup keep-latest (reference reconcile_players.py:
    // 476-478, drop_duplicates keep="first" after sort).
    QueryDef.of("o03_dedup_keep_latest",
      """SELECT event_id, user_id, event_type, CAST(round(value*100) AS BIGINT) AS cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Sinks.dedupKeepLatest(Tables.events(s, dir), Seq("user_id"),
          struct(col("ts_ns"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          cents(col("value")).as("cents"))
        .orderBy("user_id")
    },

    // O4: top-1 per group (reference names/helpers.py:188-193,
    // extractOne-style best row).
    QueryDef.of("o04_top1_per_group",
      """SELECT c_nationkey, c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
        |FROM customer
        |QUALIFY row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) = 1
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
        .orderBy("c_nationkey")
    },

    // O5: grouped top-k via the BOUNDED TopKAgg aggregate — the
    // relational form of the ANN ranking path: no row_number window,
    // no per-group sort; state is k (score, id) pairs per group with
    // map-side combine, the shape that survives a skewed 100 TB group.
    // Same (score DESC, id) total order as the oracle's window replay.
    QueryDef.of("o05_grouped_topk_agg",
      """SELECT c_nationkey,
        |  CAST(row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY round(c_acctbal*100) DESC, c_custkey) AS BIGINT) AS rank,
        |  c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
        |FROM customer
        |QUALIFY row_number() OVER (PARTITION BY c_nationkey
        |  ORDER BY round(c_acctbal*100) DESC, c_custkey) <= 3
        |ORDER BY c_nationkey, rank""".stripMargin) { (s, dir) =>
      val topk = graft.plans.TopKAgg.topK(3)
      Tables.customer(s, dir)
        .select(col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"),
          col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(topk(col("bal_cents").cast("double"), col("c_custkey")).as("tops"))
        .select(col("c_nationkey"), posexplode(col("tops")).as(Seq("pos", "top")))
        .select(col("c_nationkey"), (col("pos") + 1).cast("long").as("rank"),
          col("top.id").as("c_custkey"),
          col("top.score").cast("long").as("bal_cents"))
        .orderBy("c_nationkey", "rank")
    },

    // A29: grouped MODE (most frequent value, ties to the smallest) —
    // the categorical companion of a28's MAD: one value-histogram
    // hash aggregate, then a histogram-sized argmax window (bounded
    // by |distinct values per group|, never rows).
    QueryDef.of("a29_grouped_mode",
      """WITH h AS (SELECT c_nationkey, c_mktsegment, count(*) AS c
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment AS mode_segment, c AS n_mode
        |FROM h
        |QUALIFY row_number() OVER (PARTITION BY c_nationkey
        |  ORDER BY c DESC, c_mktsegment) = 1
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c").desc, col("c_mktsegment"))
      Tables.customer(s, dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"),
          col("c").as("n_mode"))
        .orderBy("c_nationkey")
    },

    // E1: union-all of homogeneous projections then aggregate
    // (reference pd.concat, leaderboards/main.py:186).
    QueryDef.of("e01_union_all",
      """SELECT bucket, count(*) AS n, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM (SELECT 'open' AS bucket, o_totalprice FROM orders WHERE o_orderstatus='O'
        |      UNION ALL
        |      SELECT 'done' AS bucket, o_totalprice FROM orders WHERE o_orderstatus='F')
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderstatus") === "O")
        .select(lit("open").as("bucket"), col("o_totalprice"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(lit("done").as("bucket"), col("o_totalprice"))
      a.unionByName(b).groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("cents"))
        .orderBy("bucket")
    },

    // E2: intersect (reference set-membership pre-checks,
    // leaderboards/common.py:199).
    QueryDef.of("e02_intersect",
      """SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |INTERSECT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_acctbal") < 0).select("c_custkey")
        .intersect(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    // E3: except/anti (reference done-set anti-joins,
    // collect_game.py:199).
    QueryDef.of("e03_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select("c_custkey")
        .except(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    // E4: distinct (reference drop_duplicates, pbp_parser/main.py:113).
    QueryDef.of("e04_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // E5: UNPIVOT / melt — wide-to-long reshaping (the inverse of
    // a01's pivot): three charge columns per order row melt into
    // (measure, cents) pairs via Spark's native unpivot (an Expand
    // node — map-only, no shuffle beyond the final aggregate).
    QueryDef.of("e05_unpivot",
      """WITH w AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
        |    CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |    CAST(o_custkey AS BIGINT) AS cust_key
        |  FROM orders),
        |u AS (UNPIVOT w ON total_cents, order_year, cust_key
        |      INTO NAME measure VALUE v)
        |SELECT measure, count(*) AS n, CAST(SUM(v) AS BIGINT) AS total,
        |  CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("total_cents"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_custkey").cast("long").as("cust_key"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("total_cents"), col("order_year"), col("cust_key")),
          "measure", "v")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), sum("v").as("total"),
          min("v").as("mn"), max("v").as("mx"))
        .orderBy("measure")
    },

    // DQ1: declarative data-quality expectations (Expectations.report,
    // the deequ/Great-Expectations validation pass): three row-wise
    // rules share ONE corpus aggregate (conditional sums, then the
    // 1-row result unpivots into report rows) and each uniqueness
    // rule adds one grouped pass. Planted reality: value has genuine
    // out-of-[0,100] rows; (user_id, event_type) is deliberately
    // non-unique — pass must be false for both.
    QueryDef.of("dq01_expectations",
      """WITH rw AS (SELECT count(*) AS total,
        |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
        |    CAST(SUM(CASE WHEN value IS NOT NULL AND
        |        (CAST(value AS DOUBLE) < 0.0 OR CAST(value AS DOUBLE) > 100.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
        |    CAST(SUM(CASE WHEN event_type IS NOT NULL AND
        |        NOT regexp_matches(event_type, '^[a-z]+$')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_re
        |  FROM events),
        |u1 AS (SELECT CAST(coalesce(SUM(n - 1), 0) AS BIGINT) AS violations,
        |    CAST(coalesce(SUM(n), 0) AS BIGINT) AS total
        |  FROM (SELECT count(*) AS n FROM events GROUP BY event_id)),
        |u2 AS (SELECT CAST(coalesce(SUM(n - 1), 0) AS BIGINT) AS violations,
        |    CAST(coalesce(SUM(n), 0) AS BIGINT) AS total
        |  FROM (SELECT count(*) AS n FROM events GROUP BY user_id, event_type))
        |SELECT rule, violations, total, violations = 0 AS pass FROM (
        |  SELECT 'not_null(user_id)' AS rule, v_nn AS violations, total FROM rw
        |  UNION ALL SELECT 'in_range(value,0.0,100.0)', v_rng, total FROM rw
        |  UNION ALL SELECT 'matches(event_type)', v_re, total FROM rw
        |  UNION ALL SELECT 'unique(event_id)', violations, total FROM u1
        |  UNION ALL SELECT 'unique(user_id,event_type)', violations, total FROM u2)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      import graft.operators.Expectations._
      report(Tables.events(s, dir), Seq(
        NotNull("user_id"),
        InRange("value", 0.0, 100.0),
        Matches("event_type", "^[a-z]+$"),
        Unique(Seq("event_id")),
        Unique(Seq("user_id", "event_type"))))
    },

    // DQ2: expectations ENFORCED (Expectations.enforce) — rules
    // routed into (clean, quarantined) frames: row-wise rules are one
    // inline projection, each Unique rule one window pass quarantining
    // EVERY member of a duplicated key (routing has no principled
    // survivor; the report's excess-count asymmetry is documented on
    // the operator). The two OVERLAPPING range rules make the reason
    // sets non-trivial: in-band rows are clean, 50<v<=100 fails the
    // tight rule only, v<0 or v>100 fails both — so the output (one
    // row per failed-rules signature + the '' clean group) hash-gates
    // every row's destination AND its full reason set. Oracle replays
    // each rule per-row and the duplicate window in DuckDB.
    QueryDef.of("dq02_enforce",
      """WITH f AS (SELECT
        |    CASE WHEN user_id IS NULL THEN 1 ELSE 0 END AS f_nn,
        |    CASE WHEN value IS NOT NULL AND
        |        (CAST(value AS DOUBLE) < 0.0 OR CAST(value AS DOUBLE) > 100.0)
        |      THEN 1 ELSE 0 END AS f_rng,
        |    CASE WHEN value IS NOT NULL AND
        |        (CAST(value AS DOUBLE) < 0.0 OR CAST(value AS DOUBLE) > 50.0)
        |      THEN 1 ELSE 0 END AS f_rng2,
        |    CASE WHEN count(*) OVER (PARTITION BY event_id) > 1
        |      THEN 1 ELSE 0 END AS f_u1
        |  FROM events),
        |t AS (SELECT coalesce(array_to_string(list_sort(list_filter([
        |    CASE WHEN f_nn = 1 THEN 'not_null(user_id)' END,
        |    CASE WHEN f_rng = 1 THEN 'in_range(value,0.0,100.0)' END,
        |    CASE WHEN f_rng2 = 1 THEN 'in_range(value,0.0,50.0)' END,
        |    CASE WHEN f_u1 = 1 THEN 'unique(event_id)' END],
        |    x -> x IS NOT NULL)), '|'), '') AS sig
        |  FROM f)
        |SELECT sig, count(*) AS n FROM t GROUP BY sig ORDER BY sig""".stripMargin) { (s, dir) =>
      import graft.operators.Expectations._
      val (clean, quar) = enforce(Tables.events(s, dir), Seq(
        NotNull("user_id"),
        InRange("value", 0.0, 100.0),
        InRange("value", 0.0, 50.0),
        Unique(Seq("event_id"))))
      clean.select(lit("").as("sig"))
        .unionByName(quar.select(array_join(col("failed_rules"), "|").as("sig")))
        .groupBy("sig").agg(count(lit(1)).as("n"))
        .orderBy("sig")
    },

    // DQ3: PSI drift decomposition (Drift.psiBins) between the first
    // half of January and the rest — the snapshot-admission gate of a
    // continuous pipeline. Bin edges come from the REFERENCE window's
    // integer-cent min/max (exact-integer bin assignment, see the
    // operator), probabilities are Laplace-smoothed, and each term is
    // reported in rounded micro units (the t23 ln-absorption pattern).
    // The oracle replays the full decomposition bin for bin.
    QueryDef.of("dq03_psi_drift",
      """WITH b AS (SELECT CAST(round(value*100) AS BIGINT) AS c, epoch_ns(ts) AS tn
        |  FROM events),
        |mm AS (SELECT min(c) AS mn, max(c) AS mx FROM b
        |  WHERE tn < 1705363200000000000),
        |rb AS (SELECT least(9, greatest(0,
        |    CAST(floor(((c - mn) * 10) / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT))) AS bin
        |  FROM b CROSS JOIN mm WHERE tn < 1705363200000000000),
        |cb AS (SELECT least(9, greatest(0,
        |    CAST(floor(((c - mn) * 10) / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT))) AS bin
        |  FROM b CROSS JOIN mm WHERE tn >= 1705363200000000000),
        |rc AS (SELECT bin, count(*) AS n_ref FROM rb GROUP BY bin),
        |cc AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY bin),
        |g AS (SELECT unnest(range(0, 10)) AS bin),
        |j AS (SELECT g.bin, coalesce(rc.n_ref, 0) AS n_ref,
        |    coalesce(cc.n_cur, 0) AS n_cur
        |  FROM g LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)),
        |t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS t_ref,
        |    CAST(sum(n_cur) AS DOUBLE) AS t_cur FROM j)
        |SELECT bin, n_ref, n_cur,
        |  CAST(round(((n_cur + 0.5)/(t_cur + 5.0) - (n_ref + 0.5)/(t_ref + 5.0))
        |    * ln(((n_cur + 0.5)/(t_cur + 5.0)) / ((n_ref + 0.5)/(t_ref + 5.0)))
        |    * 1000000) AS BIGINT) AS psi_term_micro
        |FROM j CROSS JOIN t ORDER BY bin""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("c", round(col("value") * 100).cast("long"))
      val cut = 1705363200000000000L // 2024-01-16T00:00Z in epoch nanos
      graft.operators.Drift.psiBins(
          ev.filter(col("ts_ns") < cut), ev.filter(col("ts_ns") >= cut),
          col("c"), bins = 10)
        .orderBy("bin")
    },

    // S1: schema-enforced scan with filter+projection — Catalyst
    // pushes both into the parquet scan (verified via explain in the
    // plan spec; reference usecols/dtype hardening,
    // pbp_parser/main.py:276-304).
    QueryDef.of("s01_scan_pushdown",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_quantity > 10 AND l_returnflag <> 'N'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 10 && col("l_returnflag") =!= "N")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("l_returnflag")
    },

    // S6: incremental-source checkpoint as an anti-join (reference
    // collect_game.py:67-84 done-ids set).
    QueryDef.of("s06_incremental_antijoin",
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      Sinks.appendNewOnly(o, o.filter(col("o_orderkey") % 3 === 0), Seq("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // S7 + S1-full: CSV sink + schema-enforced CSV scan round-trip
    // (reference to_csv/read_csv stage boundaries,
    // pbp_parser/main.py:353-355).
    // JSONL sink + schema-enforced scan round-trip — the standard
    // training-data interchange format. The aggregate (including a
    // distinct md5 of the text body) runs on the re-read files, the
    // oracle on the ORIGINAL parquet: any loss/mangling in the JSON
    // escape/parse cycle breaks the hash compare.
    QueryDef.of("s11_jsonl_roundtrip",
      """SELECT source, count(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS text_chars,
        |  count(DISTINCT md5(text)) AS n_uniq
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val out = scratch(dir, "s11_jsonl")
      Tables.documents(s, dir).write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).json(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"),
          sum(length(col("text"))).as("text_chars"),
          countDistinct(md5(col("text"))).as("n_uniq"))
        .orderBy("source")
    },

    // Schema evolution across parquet parts (mergeSchema) — years of
    // accumulated data drift columns, and the 100 TB reader must
    // union them by NAME with NULL backfill, not by position. Two
    // parts derived from orders (the odd-key part carries an extra
    // o_totalprice column) are written separately and read back with
    // mergeSchema; the oracle replays the backfill with a CASE on the
    // part predicate over the original table.
    QueryDef.of("s16_schema_evolution",
      """SELECT o_orderkey % 7 AS bucket, count(*) AS n,
        |  count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_price,
        |  CAST(coalesce(sum(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS price_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val out = scratch(dir, "s16_evolve")
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$out/part_v1")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .write.mode("overwrite").parquet(s"$out/part_v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$out/part_v1", s"$out/part_v2")
        .groupBy((col("o_orderkey") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"),
          count(col("price_cents")).as("n_price"),
          coalesce(sum(col("price_cents")), lit(0L)).as("price_cents"))
        .orderBy("bucket")
    },

    // Columnar ORC sink + scan round-trip (the third interchange
    // format next to CSV/JSONL; Spark's ORC writer is built in). Same
    // contract as s11: the aggregate runs on the RE-READ files, the
    // oracle on the original parquet — format loss (value widths, id
    // fidelity, row drops) breaks the hash compare.
    QueryDef.of("s12_orc_roundtrip",
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val out = scratch(dir, "s12_orc")
      Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    },

    QueryDef.of("s07_csv_roundtrip",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val out = scratch(dir, "s07_csv")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_returnflag", StringType), StructField("l_quantity", DoubleType)))
      s.read.schema(schema).option("header", "true").csv(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy("l_returnflag")
    },

    // S8: upsert-by-partition sink — dynamic partition overwrite
    // refreshes ONLY the 'click' partition, then the re-read totals
    // must show exactly that partition changed (reference
    // leaderboards/main.py:165-214 read-modify-write collapse).
    QueryDef.of("s08_upsert_by_partition",
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(round((CASE WHEN event_type='click' THEN value*2 ELSE value END)*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val base = scratch(dir, "s08_parquet")
      val evts = Tables.events(s, dir).select("event_id", "event_type", "value")
      evts.write.mode("overwrite").partitionBy("event_type").parquet(base)
      val patch = evts.filter(col("event_type") === "click")
        .withColumn("value", col("value") * 2)
      Sinks.upsertByPartition(patch, base, Seq("event_type"))
      s.read.parquet(base)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
        .orderBy("event_type")
    },

    // S13 (beyond-reference, core 100 TB technique): bucketed
    // CO-LOCATED join. Both fact sides are written `bucketBy` on the
    // join key (+ sortBy, so even the sort is pre-paid); the merge
    // join then needs NO exchange on either side — at 100 TB this is
    // the difference between a daily fact-fact join shuffling the
    // whole table and reading pre-bucketed files in place. The
    // PlanAuditSpec asserts the zero-join-exchange plan; the oracle
    // checks the join result itself. Bucket count is sized for the
    // harness (a cluster would use hundreds).
    QueryDef.of("s13_bucketed_join",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS order_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val wh = scratch(dir, "s13_buckets")
      Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag", "l_extendedprice")
        .write.mode("overwrite").option("path", s"$wh/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable("s13_li")
      Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").option("path", s"$wh/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable("s13_ord")
      // merge hint: without it the (small-at-test-scale) orders side
      // broadcasts and the co-location property goes unexercised
      s.table("s13_li").hint("merge")
        .join(s.table("s13_ord"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          sum(cents(col("o_totalprice"))).as("order_cents"))
        .orderBy("l_returnflag")
    },

    // S14: the explicit salting tool behind an oracle. l_returnflag
    // has 3 values over 60k rows — the textbook hot-key shape — and
    // the salted join must produce EXACTLY the plain join's result
    // (the salt spreads reducers, never changes semantics; the
    // reducer-spreading itself is pinned in PlanAuditSpec where the
    // broadcast path is disabled). The dim side replicates 8×, the
    // documented cost of the construction.
    QueryDef.of("s14_salted_join",
      """WITH dim AS (SELECT l_returnflag, COUNT(*) AS rf_n FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT) * rf_n) AS BIGINT) AS weighted
        |FROM lineitem l JOIN dim USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val dim = li.groupBy("l_returnflag").agg(count(lit(1)).as("rf_n"))
      graft.operators.SkewJoin.saltedJoin(li, dim, "l_returnflag",
          saltFactor = 8, saltCols = Seq("l_orderkey", "l_linenumber"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long") * col("rf_n")).as("weighted"))
        .orderBy("l_returnflag")
    },

    // S9: the config-driven JDBC publish driver end-to-end (reference
    // upload_to_db.py + db_table_config.json): a CSV data root with
    // year-suffixed war files, a keyless leaderboard file, an excluded
    // _tmp dir, an unmatched file, and a later-sorted duplicate file
    // goes through TWO publish passes against embedded Derby — a full
    // load, then a year=2001 refresh whose revised slice must replace
    // only that year. The oracle knows nothing of the machinery: it
    // states the surviving table content straight from parquet, so a
    // bug in glob matching, file-year skipping, keep-first dedup, or
    // the delete-slice refresh all surface as a hash mismatch.
    QueryDef.of("s09_publish_roundtrip",
      """WITH b AS (
        |  SELECT o_custkey % 100 AS player_id, CAST(year(o_orderdate) AS INT) AS year,
        |    SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS value_cents, COUNT(*) AS plays
        |  FROM orders WHERE year(o_orderdate) IN (2000, 2001) GROUP BY 1, 2),
        |c AS (
        |  SELECT c_custkey % 50 AS player_id,
        |    SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS value_cents, COUNT(*) AS plays
        |  FROM customer GROUP BY 1)
        |SELECT 'batting' AS tbl, year, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN year = 2001 THEN value_cents * 2 ELSE value_cents END) AS BIGINT) AS cents,
        |  CAST(SUM(plays) AS BIGINT) AS plays
        |FROM b GROUP BY year
        |UNION ALL
        |SELECT 'value_batter', -1, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(value_cents) AS BIGINT), CAST(SUM(plays) AS BIGINT) FROM c
        |ORDER BY tbl, year""".stripMargin) { (s, dir) =>
      val root = scratch(dir, "s09_root")
      val root2 = scratch(dir, "s09_root2")
      val url = s"jdbc:derby:${scratch(dir, "s09_derby")}/db;create=true"

      def writeCsv(rel: String, root: String, header: String, rows: Seq[String]): Unit = {
        val p = java.nio.file.Paths.get(root, rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, (header +: rows).mkString("\n").getBytes("UTF-8"))
      }

      // dimension-scale fixture (100 rows/year): collect is bounded by
      // the player-id modulus, not by the orders table
      val byYear = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(2000, 2001))
        .groupBy((col("o_custkey") % 100).as("player_id"),
          year(col("o_orderdate")).as("year"))
        .agg(sum(cents(col("o_totalprice"))).as("value_cents"),
          count(lit(1)).as("plays"))
        .orderBy("year", "player_id")
        .collect()
      val hdr = "player_id,year,division,value_cents,plays"
      def warRows(yr: Int, scale: Long, keep: Long => Boolean = _ => true) = byYear
        .filter(r => r.getInt(1) == yr && keep(r.getLong(0)))
        .map(r => s"${r.getLong(0)},$yr,d1,${r.getLong(2) * scale},${r.getLong(3)}")
        .toSeq
      writeCsv("war/d1_batting_war_2000.csv", root, hdr, warRows(2000, 1))
      writeCsv("war/d1_batting_war_2001.csv", root, hdr, warRows(2001, 1))
      // sorts AFTER d1_* → keep-first must drop every row of it
      writeCsv("war/x9_batting_war_2000.csv", root, hdr,
        warRows(2000, 1, _ < 20).map(_.replaceAll(",(\\d+),(\\d+)$", ",999,$2")))
      val custRows = Tables.customer(s, dir)
        .groupBy((col("c_custkey") % 50).as("player_id"))
        .agg(sum(cents(col("c_acctbal"))).as("value_cents"), count(lit(1)).as("plays"))
        .orderBy("player_id").collect()
        .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}").toSeq
      writeCsv("leaderboards/value_batter.csv", root, "player_id,value_cents,plays", custRows)
      writeCsv("_tmp/skip_me.csv", root, "a,b", Seq("1,2"))
      writeCsv("notes.csv", root, "a,b", Seq("3,4"))

      val config = Seq(
        Publish.Mapping("leaderboards/value_batter.csv", "value_batter"),
        Publish.Mapping("war/*_batting_war_*.csv", "batting"))
      Publish.publish(s, root, config, url)

      // year refresh: revised 2001 slice (doubled value); the 2000-named
      // file LIES about its content year — the filename filter must
      // skip it or its poison rows would join the 2001 slice
      writeCsv("war/d1_batting_war_2001.csv", root2, hdr, warRows(2001, 2))
      writeCsv("war/d1_batting_war_2000.csv", root2, hdr,
        warRows(2000, 1).map(_.replace(",2000,d1,", ",2001,d1,")).map(_.replaceAll(",(\\d+),(\\d+)$", ",123,$2")))
      Publish.publish(s, root2, config, url, year = Some(2001))

      def jdbcTable(t: String) = s.read.format("jdbc")
        .option("url", url).option("dbtable", t).load()
      jdbcTable("batting")
        .groupBy(col("year").cast("int").as("year"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value_cents").cast("long")).as("cents"),
          sum(col("plays").cast("long")).as("plays"))
        .select(lit("batting").as("tbl"), col("year"), col("n_rows"), col("cents"), col("plays"))
        .union(jdbcTable("value_batter")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value_cents").cast("long")).as("cents"),
            sum(col("plays").cast("long")).as("plays"))
          .select(lit("value_batter").as("tbl"), lit(-1).as("year"),
            col("n_rows"), col("cents"), col("plays")))
        .orderBy("tbl", "year")
    },

    // Small-files compaction round trip (Sinks.compactParquet): the
    // documents table is deliberately fragmented into 64 tiny files,
    // then compacted to a target file size computed from ACTUAL
    // on-disk bytes; content must survive byte-for-byte (the oracle
    // is the same aggregate over the original table) and the file
    // count must collapse — the spec asserts the physical layout,
    // the oracle gates the content.
    QueryDef.of("s17_compact_roundtrip",
      """SELECT source, count(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  count(DISTINCT md5(text)) AS n_uniq
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val frag = scratch(dir, "s17_frag")
      val out = scratch(dir, "s17_compact")
      Tables.documents(s, dir).repartition(64)
        .write.mode("overwrite").parquet(frag)
      graft.io.Sinks.compactParquet(s, frag, out, targetBytes = 512L * 1024)
      s.read.parquet(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"),
          countDistinct(md5(col("text"))).as("n_uniq"))
        .orderBy("source")
    },

    // Z-ordered clustered write round trip (Sinks.writeZOrdered): the
    // events stream is rewritten clustered along a Morton curve over
    // (user_id, epoch seconds) — the Delta/Iceberg OPTIMIZE ZORDER
    // recipe as a range shuffle over a codegen'd bit-interleave. The
    // oracle gates CONTENT (multiset-equivalent aggregate vs the
    // original table: any row lost/duplicated/mutated by the rewrite
    // breaks a bucket); ClusteredWriteSpec gates the LAYOUT (per-file
    // min/max tight on BOTH dimensions, point scans touch ≤2 files).
    QueryDef.of("s18_zorder_roundtrip",
      """SELECT user_id % 64 AS bucket, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(sum(epoch_us(ts) // 1000000) AS BIGINT) AS ts_sum,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val out = scratch(dir, "s18_zorder")
      graft.io.Sinks.writeZOrdered(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          round(col("value") * 100).cast("long").as("cents")),
        out, Seq("user_id", "ts_s"), numFiles = 8, bits = 10)
      s.read.parquet(out)
        .groupBy((col("user_id") % 64).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          sum("ts_s").as("ts_sum"),
          sum("cents").as("cents"))
        .orderBy("bucket")
    },

    // S19: SCD Type-2 merge (io.Scd.scd2Apply) — the history-keeping
    // sibling of the S8 upsert: a second dimension snapshot (every
    // 7th key's segment changed, every 11th key deleted) applied onto
    // the T1 full load. The merged history gates all four routing
    // classes row-for-row: unchanged keep their interval, changed
    // close at T2 + reopen, deletions close, and (here) no
    // pre-existing closed rows. The oracle replays the full-outer
    // join and the null-safe change predicate.
    QueryDef.of("s19_scd2_merge",
      """WITH h AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_nationkey AS nat,
        |    CAST(1000 AS BIGINT) AS vf FROM customer),
        |s AS (SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg,
        |    c_nationkey AS nat
        |  FROM customer WHERE c_custkey % 11 <> 0),
        |j AS (SELECT h.k AS hk, s.k AS sk, h.seg AS hseg, h.nat AS hnat, h.vf,
        |    s.seg AS sseg, s.nat AS snat
        |  FROM h FULL JOIN s ON h.k = s.k),
        |c AS (SELECT *, NOT (hseg IS NOT DISTINCT FROM sseg
        |    AND hnat IS NOT DISTINCT FROM snat) AS changed FROM j)
        |SELECT * FROM (
        |  SELECT hk AS c_custkey, hseg AS c_mktsegment, hnat AS c_nationkey,
        |    vf AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        |  FROM c WHERE hk IS NOT NULL AND sk IS NOT NULL AND NOT changed
        |  UNION ALL
        |  SELECT sk, sseg, snat, CAST(2000 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM c WHERE hk IS NULL OR (hk IS NOT NULL AND sk IS NOT NULL AND changed)
        |  UNION ALL
        |  SELECT hk, hseg, hnat, vf, CAST(2000 AS BIGINT)
        |  FROM c WHERE hk IS NOT NULL AND (sk IS NULL OR changed))
        |ORDER BY c_custkey, valid_from""".stripMargin) { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val history = cust.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        lit(1000L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val snapshot = cust.filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      graft.io.Scd.scd2Apply(history, snapshot,
          "c_custkey", Seq("c_mktsegment", "c_nationkey"), asOf = 2000L)
        .orderBy("c_custkey", "valid_from")
    })
}
