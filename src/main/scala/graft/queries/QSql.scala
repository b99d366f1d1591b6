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
    })
}
