package graft.queries

import graft.sources.Tables

/**
 * The SQL-extension surface, driver-gated: this query reaches the
 * engine EXCLUSIVELY through `spark.sql(...)` text — no DataFrame
 * combinators — so the [[graft.GraftExtensions]] function-registration
 * path (the route a thrift/notebook/pure-SQL user takes) has its own
 * CORRECTNESS row rather than only a spec. All three injected
 * functions are exercised in one projection:
 *
 *  - `graft_simhash60` over the canonical whitespace tokens — the
 *    same native kernel t08's near-dup join uses
 *    ([[graft.plans.SimHash60Expr]]);
 *  - `graft_char_ngrams(canon, 3)` — the O(len) codepoint walk behind
 *    language ID, counted (canonical text is ASCII, so the oracle's
 *    `length(canon) − 2` is the same number);
 *  - `graft_dot(embedding, embedding)` — the fused double-accumulating
 *    dot kernel, as a squared L2 norm.
 *
 * Scale shape: one broadcast-free equi-join documents⋈embeddings on
 * the shared id (both sides shuffle once on the key at 100 TB — this
 * is a per-row enrichment, not a pairwise op), all three kernels
 * map-only inside WholeStageCodegen.
 */
object QSql {

  private val CanonSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), '\\\\s+', ' '))"

  val defs: Seq[QueryDef] = Seq(
    QueryDef.of("sql01_extension_surface",
      """WITH d AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                        '\s+', ' ', 'g')) AS canon
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(regexp_extract_all(canon, '\S+')) AS tok FROM d),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, j.j,
        |    SUM(CASE WHEN ((h >> j.j) & 1) = 1 THEN 1 ELSE -1 END) AS net
        |  FROM h, (SELECT unnest(range(0, 60)) AS j) j GROUP BY doc_id, j.j),
        |sig0 AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN net > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sim
        |  FROM bits GROUP BY doc_id),
        |ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT d.doc_id, coalesce(s.sim, 0) AS sim,
        |  CAST(greatest(length(d.canon) - 2, 0) AS BIGINT) AS n_3grams,
        |  round(list_dot_product(ed.v, ed.v), 6) AS sq_norm
        |FROM d LEFT JOIN sig0 s ON s.doc_id = d.doc_id
        |JOIN ed ON ed.vec_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).createOrReplaceTempView("g_documents")
      Tables.embeddings(s, dir).createOrReplaceTempView("g_embeddings")
      s.sql(
        s"""WITH d AS (SELECT doc_id, $CanonSql AS canon FROM g_documents)
           |SELECT d.doc_id,
           |  graft_simhash60(filter(split(canon, '\\\\s+'), t -> length(t) > 0)) AS sim,
           |  CAST(size(graft_char_ngrams(canon, 3)) AS BIGINT) AS n_3grams,
           |  round(graft_dot(e.embedding, e.embedding), 6) AS sq_norm
           |FROM d JOIN g_embeddings e ON e.vec_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin)
    },

    // SQL02: the URL family through the SAME pure-SQL text path —
    // graft_normalize_url (full t47 rules incl. percent
    // normalization) and graft_registrable_domain (the t52 eTLD+1
    // longest-suffix match, suffix set as a foldable SQL array
    // literal). The builders re-enter the DataFrame composition via
    // the bridge, so this gate proves the two surfaces share ONE
    // expression tree; the oracle is the t47 pn replay + t52 suffix
    // machinery over the identical synthetic URLs.
    QueryDef.of("sql02_url_surface",
      """WITH raw AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.COM:80/p/' ||
        |      CAST(doc_id AS VARCHAR) || '?utm_source=x&b=%32&a=1#frag'
        |    WHEN 1 THEN 'https://Node-' || source || '.ORG:8443/a%2fb%70?z=9&y=%4a'
        |    WHEN 2 THEN 'https://' || source || '.net:443'
        |    ELSE 'ftp://Files.' || source || '.io/da%zzta%7e#sec' END AS url
        |  FROM documents),
        |t AS (SELECT doc_id, trim(url) AS u FROM raw),
        |p1 AS (SELECT doc_id, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest0
        |  FROM t),
        |p2 AS (SELECT *, regexp_extract(rest0, '^([^/?#]*)', 1) AS hp FROM p1),
        |p3 AS (SELECT *,
        |    lower(regexp_replace(hp, ':[0-9]+$', '')) AS host,
        |    regexp_extract(hp, ':([0-9]+)$', 1) AS port,
        |    string_split(substr(rest0, length(hp) + 1), '%') AS rps
        |  FROM p2),
        |pn AS (SELECT *, rps[1] || coalesce(array_to_string(
        |    list_transform(rps[2:], q -> CASE
        |      WHEN NOT regexp_matches(q, '^[0-9A-Fa-f]{2}') THEN '%' || q
        |      WHEN regexp_matches(chr(CAST(
        |          (strpos('0123456789ABCDEF', substr(upper(q),1,1))-1)*16
        |          + strpos('0123456789ABCDEF', substr(upper(q),2,1))-1 AS INT)),
        |          '^[A-Za-z0-9._~-]$')
        |        THEN chr(CAST(
        |          (strpos('0123456789ABCDEF', substr(upper(q),1,1))-1)*16
        |          + strpos('0123456789ABCDEF', substr(upper(q),2,1))-1 AS INT))
        |          || substr(q, 3)
        |      ELSE '%' || upper(substr(q,1,2)) || substr(q,3) END), ''), '')
        |    AS rest
        |  FROM p3),
        |p4 AS (SELECT *,
        |    regexp_extract(rest, '^([^?#]*)', 1) AS path,
        |    regexp_extract(rest, '\?([^#]*)', 1) AS query FROM pn),
        |p5 AS (SELECT *,
        |    coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x,
        |        '^(utm_[^=]*|fbclid|gclid)(=.*)?$'))), '&'), '') AS q
        |  FROM p4),
        |nrm AS (SELECT doc_id, host,
        |  CASE WHEN scheme = '' THEN u ELSE scheme || '://' || host ||
        |    CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
        |           OR (scheme = 'https' AND port = '443'))
        |         THEN ':' || port ELSE '' END ||
        |    CASE WHEN path = '' THEN '/' ELSE path END ||
        |    CASE WHEN q = '' THEN '' ELSE '?' || q END END AS url_norm
        |  FROM p5),
        |sp AS (SELECT doc_id, url_norm, host,
        |    string_split(host, '.') AS parts, len(string_split(host, '.')) AS n
        |  FROM nrm),
        |kb AS (SELECT *, coalesce(list_max(list_transform(range(1, n), k -> CASE
        |      WHEN list_contains(['com','org','net','io','co.uk'],
        |        array_to_string(list_slice(parts, -CAST(k AS INT), -1), '.'))
        |      THEN k ELSE 0 END)), 0) AS kbest
        |  FROM sp)
        |SELECT doc_id, url_norm,
        |  CASE WHEN kbest > 0 THEN
        |    array_to_string(list_slice(parts, -CAST(kbest + 1 AS INT), -1), '.')
        |  ELSE host END AS rdomain
        |FROM kb ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).createOrReplaceTempView("g_documents")
      s.sql(
        """WITH raw AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
          |    WHEN 0 THEN concat('HTTP://WWW.', source, '.Example.COM:80/p/',
          |      CAST(doc_id AS STRING), '?utm_source=x&b=%32&a=1#frag')
          |    WHEN 1 THEN concat('https://Node-', source, '.ORG:8443/a%2fb%70?z=9&y=%4a')
          |    WHEN 2 THEN concat('https://', source, '.net:443')
          |    ELSE concat('ftp://Files.', source, '.io/da%zzta%7e#sec') END AS url
          |  FROM g_documents)
          |SELECT doc_id,
          |  graft_normalize_url(url) AS url_norm,
          |  graft_registrable_domain(
          |    lower(regexp_replace(regexp_extract(
          |      regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
          |      '^([^/?#]*)', 1), ':[0-9]+$', '')),
          |    array('com', 'org', 'net', 'io', 'co.uk')) AS rdomain
          |FROM raw ORDER BY doc_id""".stripMargin)
    },

    // SQL03: the binary-ANN tier through the pure-SQL text path —
    // graft_sign_code (the v20 packed sign-bit code; dim/bits as
    // integer literals compiling the hyperplanes into the plan) and
    // graft_hamming (xor + popcount). A complete Hamming top-10 scan
    // in SQL text, integer end to end — the oracle replays all 60
    // md5-keystream projections and the (ham, id) ranking.
    QueryDef.of("sql03_binary_surface",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v FROM e),
         |cc AS MATERIALIZED (SELECT vec_id, CAST(${QVector.binaryCodeSql} AS BIGINT) AS code
         |  FROM n),
         |qq AS (SELECT vec_id AS query_id, code AS qcode FROM cc WHERE vec_id < 5),
         |hm AS (SELECT q.query_id, c.vec_id AS id,
         |    CAST(bit_count(xor(c.code, q.qcode)) AS BIGINT) AS ham
         |  FROM cc c JOIN qq q ON c.vec_id <> q.query_id)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY ham, id) AS BIGINT) AS rank,
         |  id, ham
         |FROM hm
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ham, id) <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir).createOrReplaceTempView("g_embeddings")
      s.sql(
        """WITH c AS (SELECT vec_id, graft_sign_code(embedding, 64, 60) AS code
          |  FROM g_embeddings),
          |q AS (SELECT vec_id AS query_id, code AS qcode FROM c WHERE vec_id < 5),
          |hm AS (SELECT q.query_id, c.vec_id AS id,
          |    CAST(graft_hamming(c.code, q.qcode) AS BIGINT) AS ham,
          |    row_number() OVER (PARTITION BY q.query_id
          |      ORDER BY graft_hamming(c.code, q.qcode), c.vec_id) AS rn
          |  FROM c JOIN q ON c.vec_id <> q.query_id)
          |SELECT query_id, CAST(rn AS BIGINT) AS rank, id, ham
          |FROM hm WHERE rn <= 10
          |ORDER BY query_id, rank""".stripMargin)
    })
}
