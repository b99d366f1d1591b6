package graft.queries

import graft.functions.ScalarFunctions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Scalar-function families (SURVEY §2.8): string basics, regex,
 * numeric guards, dates, hashing, JSON, conditional chains, and the
 * domain functions (innings-pitched notation, name normalizer,
 * Last-First flip). All pure `functions._` compositions — codegen'd,
 * no UDFs — checked cell-by-cell against DuckDB.
 *
 * Regexes stay inside the Java∩RE2 common subset (no lookaround / no
 * backrefs) so both engines evaluate them identically.
 */
object QScalar {

  val defs: Seq[QueryDef] = Seq(

    // §2.8 string basic (reference names/helpers.py:6-19,
    // reconcile_players.py:26-56).
    QueryDef.of("f01_string_basic",
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 8) AS pre,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  split_part(c_name, '#', 1) || '-' || split_part(c_name, '#', 2) AS joined,
        |  split_part(c_name, '#', 2) AS num_part
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("pre"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("-", element_at(split(col("c_name"), "#"), 1),
            element_at(split(col("c_name"), "#"), 2)).as("joined"),
          element_at(split(col("c_name"), "#"), 2).as("num_part"))
        .orderBy("c_custkey")
    },

    // §2.8 string regex (reference pbp_parser/regexes.py usage —
    // extract/count/replace/match).
    QueryDef.of("f02_string_regex",
      """SELECT doc_id, regexp_extract(text, '^(\S+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(text, '\bthe\b')) AS BIGINT) AS n_the,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len,
        |  CAST(regexp_matches(text, 'data') AS INTEGER) AS has_data
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          regexp_extract(col("text"), "^(\\S+)", 1).as("first_word"),
          regexp_count(col("text"), lit("\\bthe\\b")).cast("long").as("n_the"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("novowel_len"),
          col("text").rlike("data").cast("int").as("has_data"))
        .orderBy("doc_id")
    },

    // §2.8 numeric: safeDiv / clip / abs / sign (reference
    // war_calculation/common.py:5-7, sos_utils.py:86-91).
    QueryDef.of("f03_numeric_guards",
      """SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN l_discount <> 0 THEN l_quantity / l_discount ELSE 0.0 END, 4) AS qty_per_disc,
        |  least(greatest(l_quantity, CAST(5.0 AS DOUBLE)), CAST(40.0 AS DOUBLE)) AS qty_clip,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          round(safeDiv(col("l_quantity"), col("l_discount")), 4).as("qty_per_disc"),
          clip(col("l_quantity"), lit(5.0), lit(40.0)).as("qty_clip"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          signum(col("l_discount") - 0.05).cast("long").as("disc_sign"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.8 date (reference rolling.py:12, upload_to_db.py:43-45).
    QueryDef.of("f04_date_parts",
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  isodow(o_orderdate) AS iso_dow,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(col("o_orderdate").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey")
    },

    // §2.8 hash: md5, salted sha-256 id, portable 60-bit hash
    // (reference scripts/hash_player_ids.py:8-41).
    QueryDef.of("f05_hash_ids",
      """SELECT c_custkey, md5(c_name) AS md5_hex,
        |  substr(sha256('pepper:' || c_name), 1, 16) AS salted16,
        |  ('0x' || substr(md5(c_name), 1, 15))::BIGINT AS h60
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(
          col("c_custkey"),
          md5(col("c_name")).as("md5_hex"),
          saltedId(col("c_name"), "pepper").as("salted16"),
          md5Long(col("c_name")).as("h60"))
        .orderBy("c_custkey")
    },

    // §2.8 json (reference collect_game.py:92-133 flattening).
    QueryDef.of("f06_json_extract",
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k,
        |  CAST(props->>'k' AS BIGINT) % 7 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .withColumn("k_mod", col("k") % 7)
        .orderBy("event_id")
    },

    // §2.8 conditional chains (reference columns.py:282-307,
    // np.select-style priority cascade).
    QueryDef.of("f07_conditional_chain",
      """SELECT CASE WHEN l_discount < 0.02 THEN 'low' WHEN l_discount < 0.05 THEN 'mid'
        |  WHEN l_quantity > 30 THEN 'highqty' ELSE 'rest' END AS band,
        |  count(*) AS n,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("band",
          when(col("l_discount") < 0.02, "low")
            .when(col("l_discount") < 0.05, "mid")
            .when(col("l_quantity") > 30, "highqty")
            .otherwise("rest"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy("band")
    },

    // §2.8 domain: innings-pitched notation round trip (reference
    // war_calculation/common.py:10-36 — "6.2" = 6⅔ innings).
    QueryDef.of("f08_ip_notation",
      """WITH b AS (SELECT l_orderkey, l_linenumber,
        |    floor(l_quantity) + (l_linenumber % 3) / CAST(10.0 AS DOUBLE) AS ip
        |  FROM lineitem),
        |f AS (SELECT *, floor(ip) + round((ip - floor(ip)) * 10) / CAST(3.0 AS DOUBLE) AS ipf FROM b)
        |SELECT l_orderkey, l_linenumber, ip, round(ipf, 4) AS ip_float,
        |  CAST(abs((floor(ipf) + round((ipf - floor(ipf)) * 3) / CAST(10.0 AS DOUBLE)) - ip) < 1e-9 AS INTEGER) AS rt_ok
        |FROM f ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("ip",
          floor(col("l_quantity")) + (col("l_linenumber") % 3) / lit(10.0))
        .withColumn("ipf", ipToFloat(col("ip")))
        .select(col("l_orderkey"), col("l_linenumber"), col("ip"),
          round(col("ipf"), 4).as("ip_float"),
          (abs(floatToIp(col("ipf")) - col("ip")) < 1e-9).cast("int").as("rt_ok"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.8 domain: name normalizer + Last-First flip (reference
    // sos_utils.py:5-20, reconcile_players.py:26-56).
    QueryDef.of("f09_name_normalize",
      """SELECT c_custkey,
        |  trim(regexp_replace(regexp_replace(regexp_replace(
        |    lower(upper(c_name) || ' & Sons!'), '&', ' and ', 'g'), '[^a-z0-9 ]', '', 'g'),
        |    '\s+', ' ', 'g')) AS normed,
        |  CASE WHEN contains(lf, ',')
        |       THEN trim(split_part(lf, ',', 2)) || ' ' || trim(split_part(lf, ',', 1))
        |       ELSE lf END AS flipped
        |FROM (SELECT c_custkey, c_name,
        |        split_part(c_name, '#', 1) || ', ' || split_part(c_name, '#', 2) AS lf
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .withColumn("lf", concat_ws(", ",
          element_at(split(col("c_name"), "#"), 1),
          element_at(split(col("c_name"), "#"), 2)))
        .select(col("c_custkey"),
          normName(concat(upper(col("c_name")), lit(" & Sons!"))).as("normed"),
          flipLastFirst(col("lf")).as("flipped"))
        .orderBy("c_custkey")
    },

    // §2.8 domain: cube-position cleaner + division-format normalizer
    // (reference scripts/clean_cube_positions.py:23-35,
    // scripts/update_division_format.py:10-33). The corpus has no
    // roster strings, so both engines derive the same raw inputs from
    // c_custkey (the t13 injection pattern): count suffixes, mixed
    // separators, invalid tokens, comma-glued tokens, "nan", floats.
    QueryDef.of("f10_position_division_clean",
      """WITH d AS (SELECT c_custkey,
        |    CASE c_custkey % 6
        |      WHEN 0 THEN 'SS-2B(12) ss'
        |      WHEN 1 THEN 'of . lf rf(3)'
        |      WHEN 2 THEN '1B, C'
        |      WHEN 3 THEN 'nan'
        |      WHEN 4 THEN 'util dh-P'
        |      ELSE '' END AS raw_pos,
        |    CASE c_custkey % 5
        |      WHEN 0 THEN '1' WHEN 1 THEN '3.0' WHEN 2 THEN 'ncaa_2'
        |      WHEN 3 THEN 'x7' ELSE '2' END AS raw_div
        |  FROM customer),
        |cleaned AS (SELECT c_custkey, raw_div,
        |    list_filter(
        |      list_transform(
        |        string_split_regex(regexp_replace(trim(raw_pos), '\(\d+\)', '', 'g'),
        |          '[-.\s]+'),
        |        t -> upper(trim(t))),
        |      t -> list_contains(['P','C','1B','2B','3B','SS','OF','IF','UT','DH','LF','CF','RF'], t)) AS toks
        |  FROM d),
        |deduped AS (SELECT c_custkey, raw_div,
        |    list_filter(toks, (t, i) -> list_position(toks, t) = i) AS u
        |  FROM cleaned)
        |SELECT c_custkey,
        |  CASE WHEN len(u) = 0 THEN NULL ELSE array_to_string(u, ', ') END AS positions,
        |  CASE WHEN raw_div IS NULL THEN NULL
        |       WHEN starts_with(raw_div, 'ncaa_') THEN raw_div
        |       WHEN regexp_matches(raw_div, '^[0-9]+(\.[0-9]+)?$')
        |            AND floor(CAST(raw_div AS DOUBLE)) IN (1.0, 2.0, 3.0)
        |       THEN 'ncaa_' || CAST(CAST(floor(CAST(raw_div AS DOUBLE)) AS INT) AS VARCHAR)
        |       ELSE raw_div END AS division
        |FROM deduped ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val raw = Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_custkey") % 6 === 0, "SS-2B(12) ss")
          .when(col("c_custkey") % 6 === 1, "of . lf rf(3)")
          .when(col("c_custkey") % 6 === 2, "1B, C")
          .when(col("c_custkey") % 6 === 3, "nan")
          .when(col("c_custkey") % 6 === 4, "util dh-P")
          .otherwise("").as("raw_pos"),
        when(col("c_custkey") % 5 === 0, "1")
          .when(col("c_custkey") % 5 === 1, "3.0")
          .when(col("c_custkey") % 5 === 2, "ncaa_2")
          .when(col("c_custkey") % 5 === 3, "x7")
          .otherwise("2").as("raw_div"))
      raw.select(col("c_custkey"),
          cleanPositions(col("raw_pos")).as("positions"),
          normalizeDivision(col("raw_div")).as("division"))
        .orderBy("c_custkey")
    },

    // §2.8 name-similarity scorers (reference names/helpers.py:56-111
    // rapidfuzz semantics, thresholds at names/names.py:132) behind a
    // PINNED oracle over a deterministic name-pair corpus — the last
    // ScalaTest-only scalar family made driver-visible. Regenerate
    // resources/graft/f11_oracle.sql (tools/GenF11Oracle) on
    // INTENTIONAL semantics changes; correctness vs hand-executed
    // rapidfuzz values stays pinned in FuzzySpec.
    QueryDef.of("f11_fuzzy_scores",
      QueryDef.resourceSql("/graft/f11_oracle.sql"))(fuzzyScoreSummary),

    // §2.8 domain: position canonicalizer (reference
    // constants.py:41-79), full-word position standardizer
    // (reconcile_players.py:83-131) and bats/throws normalizer
    // (reconcile_players.py:66-80) over an injected corpus — the
    // f10 pattern. Unlike the pinned fixtures, this oracle is
    // hand-written SEMANTICS (expected canonical output per injected
    // input), not generated from the implementation. canonPos is a
    // pure literal-map lookup → typedlit element_at, fully codegen;
    // the NFKC-bearing standardizer/normalizer stay Scala UDFs
    // (DuckDB v1.0.0 has no NFKC) over the ASCII corpus.
    QueryDef.of("f12_position_handedness",
      """SELECT c_custkey,
        |  CASE c_custkey % 6
        |    WHEN 0 THEN 'p' WHEN 1 THEN 'ss' WHEN 2 THEN 'cf'
        |    WHEN 3 THEN '3b' WHEN 4 THEN 'zz' ELSE 'dh' END AS canon,
        |  CASE c_custkey % 5
        |    WHEN 0 THEN 'P' WHEN 1 THEN 'SS/2B' WHEN 2 THEN 'UT'
        |    WHEN 3 THEN 'C/1B' ELSE 'C/1B/2B' END AS std,
        |  CASE c_custkey % 4
        |    WHEN 0 THEN 'L/L' WHEN 1 THEN 'R/L' WHEN 2 THEN 'S/R'
        |    ELSE '' END AS bt
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import graft.pbp.Positions
      val stdU = udf((x: String) => Positions.standardizePos(x))
      val btU = udf((x: String) => Positions.normalizeBT(x))
      val raw = Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_custkey") % 6 === 0, "Pitcher")
          .when(col("c_custkey") % 6 === 1, "  SS  ")
          .when(col("c_custkey") % 6 === 2, "Center Field")
          .when(col("c_custkey") % 6 === 3, "third baseman")
          .when(col("c_custkey") % 6 === 4, "zz")
          .otherwise("Designated Hitter").as("raw_pos"),
        when(col("c_custkey") % 5 === 0, "rhp")
          .when(col("c_custkey") % 5 === 1, "SS / 2b")
          .when(col("c_custkey") % 5 === 2, "Util")
          .when(col("c_custkey") % 5 === 3, "catcher, first base")
          .otherwise("C/1B/2B/3B").as("raw_std"),
        when(col("c_custkey") % 4 === 0, "l")
          .when(col("c_custkey") % 4 === 1, "R/L")
          .when(col("c_custkey") % 4 === 2, "s|r")
          .otherwise("xx").as("raw_bt"))
      raw.select(col("c_custkey"),
          coalesce(element_at(typedlit(Positions.posMap), lower(trim(col("raw_pos")))),
            lower(trim(col("raw_pos")))).as("canon"),
          stdU(col("raw_std")).as("std"),
          btU(col("raw_bt")).as("bt"))
        .orderBy("c_custkey")
    },

    // URL parsing for web-corpus pipelines: host / path / query-param
    // extraction via Spark's codegen'd parse_url plus registered-
    // domain reduction (substring_index) — the fields per-domain caps
    // and provenance joins key on. URLs derived deterministically from
    // the documents row (the corpus carries none — same precedent as
    // t19's derived newlines); the oracle re-derives them and parses
    // with regex.
    QueryDef.of("f13_url_parse",
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc/'
        |      || doc_id || '?ref=r' || (doc_id % 5) AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref,
        |  regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
        |    '([^.]+\.[^.]+)$', 1) AS domain
        |FROM u ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc/"), col("doc_id"),
            lit("?ref=r"), col("doc_id") % 5).as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'ref')").as("ref"),
          substring_index(expr("parse_url(url, 'HOST')"), ".", -2).as("domain"))
        .orderBy("doc_id")
    },

    // Schema-enforced JSON parsing (from_json with a declared nested
    // StructType — the typed counterpart of f06's get_json_object):
    // a nested document (struct field + string array) is ENCODED to a
    // JSON string and parsed back through from_json, then consumed by
    // dot-access and explode. The oracle derives the expected rows
    // from the same field arithmetic directly, so the engine's
    // encode→parse round-trip must be lossless and the declared
    // schema must bind every nested field correctly.
    QueryDef.of("f14_json_nested",
      """WITH t AS (SELECT lang, n_chars,
        |    unnest(['t' || (doc_id % 3), 'u' || (doc_id % 5)]) AS tag
        |  FROM documents)
        |SELECT lang, tag, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_n
        |FROM t GROUP BY lang, tag ORDER BY lang, tag""".stripMargin) { (s, dir) =>
      val json = concat(
        lit("""{"id":"""), col("doc_id"),
        lit(""","meta":{"lang":""""), col("lang"),
        lit("""","n":"""), col("n_chars"),
        lit("""},"tags":["t"""), col("doc_id") % 3,
        lit("""","u"""), col("doc_id") % 5, lit(""""]}"""))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("meta",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("lang",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType)))),
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))))
      Tables.documents(s, dir)
        .select(from_json(json, schema).as("j"))
        .select(col("j.meta.lang").as("lang"), col("j.meta.n").as("n"),
          explode(col("j.tags")).as("tag"))
        .groupBy("lang", "tag")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_n"))
        .orderBy("lang", "tag")
    },

    // F15: edit distance (Spark's codegen levenshtein vs DuckDB's) —
    // the scalar behind near-name blocking: each customer's name
    // against the NEXT name in key order (one lag window), distance
    // is a pure integer so the oracle is exact by the metric's
    // definition, not by float luck.
    QueryDef.of("f15_edit_distance",
      """WITH p AS (SELECT c_custkey, c_name,
        |    lag(c_name) OVER (ORDER BY c_custkey) AS prev_name
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(levenshtein(c_name, coalesce(prev_name, '')) AS BIGINT) AS lev,
        |  CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev_rev
        |FROM p ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.orderBy("c_custkey")
      Tables.customer(s, dir)
        .withColumn("prev_name", lag(col("c_name"), 1).over(w))
        .select(col("c_custkey"),
          levenshtein(col("c_name"), coalesce(col("prev_name"), lit(""))).cast("long").as("lev"),
          levenshtein(col("c_name"), reverse(col("c_name"))).cast("long").as("lev_rev"))
        .orderBy("c_custkey")
    })

  /** The f11 corpus + summary: per customer a synthetic "First Last"
    * name and one of five deterministic perturbations (identity /
    * token flip / embedding / trailing typo / noise), scored by the
    * three scorers the reference's reconcile cascade uses. Scores
    * leave as integer centi-units (round(score*100)) per ROW before
    * the sum — addition-order-free, hash-exact (the v05/t20 trick).
    * Scala UDFs are justified here: the scorers are inherently
    * procedural (the production path runs them inside FuzzyJoin's
    * cogroup, never as a join predicate), and the corpus is one row
    * per customer — dimension-sized. */
  def fuzzyScoreSummary(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.Fuzzy
    val ts = udf((x: String, y: String) => math.round(Fuzzy.tokenSortRatio(x, y) * 100))
    val pr = udf((x: String, y: String) => math.round(Fuzzy.partialRatio(x, y) * 100))
    val wr = udf((x: String, y: String) => math.round(Fuzzy.wRatio(x, y) * 100))
    val a = concat(lit("P"), (col("c_custkey") % 50).cast("string"),
      lit(" Smith"), (col("c_custkey") % 20).cast("string"))
    val pairs = Tables.customer(s, dir)
      .select(col("c_custkey"), a.as("a"),
        when(col("c_custkey") % 5 === 0, "same")
          .when(col("c_custkey") % 5 === 1, "flip")
          .when(col("c_custkey") % 5 === 2, "embed")
          .when(col("c_custkey") % 5 === 3, "typo")
          .otherwise("noise").as("kind"))
      .withColumn("b",
        when(col("kind") === "same", col("a"))
          .when(col("kind") === "flip", concat(
            element_at(split(col("a"), " "), 2), lit(" "),
            element_at(split(col("a"), " "), 1)))
          .when(col("kind") === "embed", concat(lit("Mr "), col("a"), lit(" Jr")))
          .when(col("kind") === "typo", expr("substring(a, 1, length(a)-1)"))
          .otherwise(concat(lit("Zz"), reverse(col("a")))))
    pairs
      .select(col("kind"),
        ts(col("a"), col("b")).as("ts_c"),
        pr(col("a"), col("b")).as("pr_c"),
        wr(col("a"), col("b")).as("wr_c"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum("ts_c").as("ts_sum"), min("ts_c").as("ts_min"), max("ts_c").as("ts_max"),
        sum("pr_c").as("pr_sum"), min("pr_c").as("pr_min"), max("pr_c").as("pr_max"),
        sum("wr_c").as("wr_sum"), min("wr_c").as("wr_min"), max("wr_c").as("wr_max"),
        // the reference cascade's accept gates (names.py:132): how
        // many pairs of each kind cross 70 / 85 / 90 on wRatio
        sum(when(col("wr_c") >= 7000, 1L).otherwise(0L)).as("n_ge70"),
        sum(when(col("wr_c") >= 8500, 1L).otherwise(0L)).as("n_ge85"),
        sum(when(col("wr_c") >= 9000, 1L).otherwise(0L)).as("n_ge90"))
      .orderBy("kind")
  }
}
