package graft.queries

import graft.operators.{Dedup, SimilaritySearch}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Embedding-vector queries over `embeddings` (64-dim float vectors):
 * brute-force cosine top-k (the exact ANN baseline), sign-LSH
 * bucketed ANN (the scale path), and embedding near-dup pairs.
 *
 * The brute-force oracles replicate the exact cosine formula
 * (`dot / (||a||·||b||)`, double accumulation) in DuckDB; the LSH
 * variants are recall<1 by construction, so they are rows-only here
 * and recall-tested against the brute baselines in ScalaTest.
 */
object QVector {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Shared DuckDB prelude: double vectors + norms. */
  private val N =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      |""".stripMargin

  /** DuckDB replication of [[graft.functions.VectorFunctions
    * .signLshBucket]] with 4 md5-derived hyperplanes over 64 dims:
    * same keystream (`md5('plane:p:j')` top-60-bits / 2^60 − 0.5),
    * same sequential projection order, same sign-bit packing. The
    * four plane projections are inlined (DuckDB 1.0 cannot correlate
    * an outer column into a lambda inside a scalar subquery). */
  private[queries] def proj(p: Int): String =
    s"""list_sum(list_transform(range(0, 64), j ->
       |      v[j+1] * (('0x' || substr(md5('plane:$p:' || j), 1, 15))::BIGINT
       |        / 1152921504606846976.0 - 0.5)))""".stripMargin

  private val BUCKET =
    s""", b AS (SELECT vec_id, v, nrm, CAST(
       |    (CASE WHEN ${proj(0)} >= 0 THEN 1 ELSE 0 END) +
       |    (CASE WHEN ${proj(1)} >= 0 THEN 2 ELSE 0 END) +
       |    (CASE WHEN ${proj(2)} >= 0 THEN 4 ELSE 0 END) +
       |    (CASE WHEN ${proj(3)} >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS bucket
       |FROM n)
       |""".stripMargin

  /** One IVF assignment pass in DuckDB: quantized (4-decimal) cosine
    * argmax against the `cents` CTE, ties to the lower cluster index —
    * the exact [[SimilaritySearch]] assignExpr semantics. */
  private def ivfAssign(cents: String, out: String, src: String = "n"): String =
    s""", s_$out AS MATERIALIZED (SELECT n.vec_id, n.v, c.cluster,
       |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
       |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
       |  FROM $src n CROSS JOIN $cents c),
       |$out AS MATERIALIZED (SELECT vec_id, v, cluster FROM s_$out
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY qcos DESC, cluster) = 1)""".stripMargin

  /** One Lloyd re-centering pass: per-dimension mean truncated to
    * REAL (the engine stores centroids as float), empty cells keep
    * the previous centroid. */
  private def ivfRecenter(assign: String, prev: String, out: String, dim: Int = 64): String =
    s""", m_$out AS MATERIALIZED (SELECT cluster, j, CAST(avg(v[j+1]) AS REAL) AS m
       |  FROM $assign, range($dim) t(j) GROUP BY cluster, j),
       |$out AS MATERIALIZED (SELECT p.cluster, COALESCE(mm.mv, p.v) AS v
       |  FROM $prev p LEFT JOIN (SELECT cluster, list(CAST(m AS DOUBLE) ORDER BY j) AS mv
       |                          FROM m_$out GROUP BY cluster) mm USING (cluster))""".stripMargin

  /** One PQ subspace's oracle chain: slice the 64-dim vectors to the
    * s-th 16-wide subvector, replay the seeded init + two Lloyd passes
    * (the v05 machinery over the slice), emit final codes `afs$s` and
    * the per-query lookup table `lut$s` (sub-dot + sub-centroid squared
    * norm) the ADC scorer consumes. */
  /** One RESIDUAL PQ subspace's oracle chain (v16): identical seeded
    * Lloyd machinery over slices of the residual table `er`, plus the
    * query-side LUT over RAW query slices (dot(q, r̂) decomposes on
    * the raw q) and the per-(cell, code) centroid-dot correction
    * `cd$s` the residual scorer needs. */
  /** DuckDB replica of [[SimilaritySearch.assignEuclidExpr]]: argmin
    * Euclidean distance via the 4-decimal-quantized `2·dot − ‖c‖²`
    * surrogate (DESC), ties to the lower cluster. */
  private def ivfAssignEuclid(cents: String, out: String, src: String): String =
    s""", s_$out AS MATERIALIZED (SELECT n.vec_id, n.v, c.cluster,
       |    round(2.0 * list_dot_product(n.v, c.v) - list_dot_product(c.v, c.v), 4) AS qd
       |  FROM $src n CROSS JOIN $cents c),
       |$out AS MATERIALIZED (SELECT vec_id, v, cluster FROM s_$out
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY qd DESC, cluster) = 1)""".stripMargin

  private def pqResidSubCtes(s: Int, sub: Int, ksub: Int): String = {
    val off = s * sub
    s""", res$s AS MATERIALIZED (SELECT vec_id, v[${off + 1}:${off + sub}] AS v FROM er),
       |rc0s$s AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
       |  FROM (SELECT vec_id, v FROM res$s ORDER BY vec_id LIMIT $ksub))""".stripMargin +
      ivfAssignEuclid(s"rc0s$s", s"ra1s$s", src = s"res$s") +
      ivfRecenter(s"ra1s$s", s"rc0s$s", s"rc1s$s", sub) +
      ivfAssignEuclid(s"rc1s$s", s"ra2s$s", src = s"res$s") +
      ivfRecenter(s"ra2s$s", s"rc1s$s", s"rc2s$s", sub) +
      ivfAssignEuclid(s"rc2s$s", s"rafs$s", src = s"res$s") +
      s""", qes$s AS MATERIALIZED (SELECT vec_id, v[${off + 1}:${off + sub}] AS v FROM e WHERE vec_id < 10),
         |rlut$s AS MATERIALIZED (SELECT q.vec_id AS query_id, c.cluster AS code,
         |    list_dot_product(q.v, c.v) AS d, list_dot_product(c.v, c.v) AS sq
         |  FROM qes$s q CROSS JOIN rc2s$s c),
         |cd$s AS MATERIALIZED (SELECT cc.cluster, cb.cluster AS code,
         |    list_dot_product(cc.v[${off + 1}:${off + sub}], cb.v) AS cd
         |  FROM c2 cc CROSS JOIN rc2s$s cb)""".stripMargin
  }

  /** The v16 residual-IVFADC oracle: coarse replay (c0→af), the
    * float-rounded residual table, per-subspace residual quantizers +
    * LUTs + corrections, then the decomposed score
    * (q·μ + Σlut) / (‖q‖·√(‖μ‖² + 2Σcdot + Σ‖r̂‖²)). */
  private lazy val IvfPqResidualSql: String = N +
    """, c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
      |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin +
    ivfAssign("c0", "a1") + ivfRecenter("a1", "c0", "c1") +
    ivfAssign("c1", "a2") + ivfRecenter("a2", "c1", "c2") +
    ivfAssign("c2", "af") +
    """, er AS MATERIALIZED (SELECT a.vec_id, a.cluster,
      |    list_transform(range(1, 65),
      |      i -> CAST(CAST(a.v[i] - c.v[i] AS REAL) AS DOUBLE)) AS v
      |  FROM af a JOIN c2 c USING (cluster))""".stripMargin +
    (0 until 4).map(s => pqResidSubCtes(s, sub = 16, ksub = 8)).mkString +
    """, rcodes AS MATERIALIZED (SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
      |    a2.cluster AS k2, a3.cluster AS k3
      |  FROM rafs0 a0 JOIN rafs1 a1 USING (vec_id)
      |    JOIN rafs2 a2 USING (vec_id) JOIN rafs3 a3 USING (vec_id)),
      |mn AS MATERIALIZED (SELECT cluster, list_dot_product(v, v) AS m2 FROM c2),
      |qmu AS MATERIALIZED (SELECT n.vec_id AS query_id, c.cluster, list_dot_product(n.v, c.v) AS d
      |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
      |rqs AS MATERIALIZED (SELECT n.vec_id AS query_id, n.nrm AS qn, c.cluster,
      |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
      |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
      |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
      |rqp AS MATERIALIZED (SELECT query_id, qn, cluster FROM rqs
      |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
      |rsc AS MATERIALIZED (SELECT rqp.query_id, a.vec_id AS id,
      |    round(CASE WHEN rqp.qn * sqrt(mn.m2 + 2*(cd0.cd + cd1.cd + cd2.cd + cd3.cd)
      |                                  + l0.sq + l1.sq + l2.sq + l3.sq) = 0 THEN 0.0
      |          ELSE (qmu.d + l0.d + l1.d + l2.d + l3.d)
      |               / (rqp.qn * sqrt(mn.m2 + 2*(cd0.cd + cd1.cd + cd2.cd + cd3.cd)
      |                                + l0.sq + l1.sq + l2.sq + l3.sq)) END, 6) AS cos
      |  FROM rqp JOIN af a USING (cluster)
      |  JOIN rcodes rc ON rc.vec_id = a.vec_id
      |  JOIN mn ON mn.cluster = rqp.cluster
      |  JOIN qmu ON qmu.query_id = rqp.query_id AND qmu.cluster = rqp.cluster
      |  JOIN rlut0 l0 ON l0.query_id = rqp.query_id AND l0.code = rc.k0
      |  JOIN rlut1 l1 ON l1.query_id = rqp.query_id AND l1.code = rc.k1
      |  JOIN rlut2 l2 ON l2.query_id = rqp.query_id AND l2.code = rc.k2
      |  JOIN rlut3 l3 ON l3.query_id = rqp.query_id AND l3.code = rc.k3
      |  JOIN cd0 ON cd0.cluster = rqp.cluster AND cd0.code = rc.k0
      |  JOIN cd1 ON cd1.cluster = rqp.cluster AND cd1.code = rc.k1
      |  JOIN cd2 ON cd2.cluster = rqp.cluster AND cd2.code = rc.k2
      |  JOIN cd3 ON cd3.cluster = rqp.cluster AND cd3.code = rc.k3
      |  WHERE a.vec_id <> rqp.query_id)
      |SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
      |  id, cos
      |FROM rsc
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** The v17 MMR oracle: the v01 top-20 shortlist (cand: query_id,
    * id, rel + rel_micro), then `k` UNROLLED argmax steps — step i
    * computes each remaining candidate's max micro-unit cosine to the
    * i−1 picks and takes the (integer score DESC, id) head. Scores
    * are the operator's exact integers
    * `num·rel_micro − (den−num)·msim_micro`. */
  private def mmrSteps(k: Int, num: Int, den: Int): String = {
    def step(i: Int): String =
      if (i == 1)
        s""", p1 AS MATERIALIZED (SELECT query_id, id, $num * rmic AS s10
           |  FROM cand
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY $num * rmic DESC, id) = 1)""".stripMargin
      else {
        val sel = (1 until i).map(j => s"SELECT query_id, id FROM p$j")
          .mkString(" UNION ALL ")
        s""", sel$i AS MATERIALIZED ($sel),
           |m$i AS MATERIALIZED (SELECT c.query_id, c.id, max(pc.cmic) AS msim
           |  FROM cand c JOIN sel$i s ON s.query_id = c.query_id
           |  JOIN pc ON pc.ia = c.id AND pc.ib = s.id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel$i x
           |    WHERE x.query_id = c.query_id AND x.id = c.id)
           |  GROUP BY 1, 2),
           |p$i AS MATERIALIZED (SELECT c.query_id, c.id,
           |    $num * c.rmic - ${den - num} * m.msim AS s10
           |  FROM cand c JOIN m$i m ON m.query_id = c.query_id AND m.id = c.id
           |  QUALIFY row_number() OVER (PARTITION BY c.query_id
           |    ORDER BY $num * c.rmic - ${den - num} * m.msim DESC, c.id) = 1)""".stripMargin
      }
    (1 to k).map(step).mkString
  }

  private lazy val MmrSql: String = N +
    """, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
      |sc AS (SELECT q.query_id, c.vec_id AS id,
      |    round(CASE WHEN q.qn * c.nrm <> 0
      |          THEN list_dot_product(q.qv, c.v) / (q.qn * c.nrm) ELSE 0.0 END, 6) AS rel
      |  FROM q JOIN n c ON c.vec_id <> q.query_id),
      |cand AS MATERIALIZED (SELECT query_id, id, rel,
      |    CAST(round(rel * 1000000.0) AS BIGINT) AS rmic FROM sc
      |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, id) <= 20),
      |cids AS MATERIALIZED (SELECT DISTINCT id FROM cand),
      |pc AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    CAST(round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
      |        ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1000000.0
      |        END) AS BIGINT) AS cmic
      |  FROM n a JOIN cids ca ON a.vec_id = ca.id
      |  CROSS JOIN n b JOIN cids cb ON b.vec_id = cb.id)""".stripMargin +
    mmrSteps(k = 8, num = 7, den = 10) +
    (1 to 8).map(i =>
      s"SELECT query_id, CAST($i AS BIGINT) AS rank, id, " +
        s"CAST(s10 AS DOUBLE) / 10000000.0 AS mmr_score FROM p$i")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY query_id, rank")

  private def pqSubCtes(s: Int, sub: Int, ksub: Int): String = {
    val off = s * sub
    s""", es$s AS MATERIALIZED (SELECT vec_id, v[${off + 1}:${off + sub}] AS v FROM e),
       |ns$s AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM es$s),
       |c0s$s AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
       |  FROM (SELECT vec_id, v FROM es$s ORDER BY vec_id LIMIT $ksub))""".stripMargin +
      ivfAssign(s"c0s$s", s"a1s$s", src = s"ns$s") +
      ivfRecenter(s"a1s$s", s"c0s$s", s"c1s$s", sub) +
      ivfAssign(s"c1s$s", s"a2s$s", src = s"ns$s") +
      ivfRecenter(s"a2s$s", s"c1s$s", s"c2s$s", sub) +
      ivfAssign(s"c2s$s", s"afs$s", src = s"ns$s") +
      s""", lut$s AS MATERIALIZED (SELECT q.vec_id AS query_id, c.cluster,
         |    list_dot_product(q.v, c.v) AS d, list_dot_product(c.v, c.v) AS sq
         |  FROM ns$s q CROSS JOIN c2s$s c WHERE q.vec_id < 10)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact top-k ANN baseline: broadcast 10 query vectors against the
    // candidate scan, bounded top-k aggregation (no window shuffle).
    QueryDef.of("v01_ann_brute_topk", N +
      """, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |sc AS (SELECT q.query_id, c.vec_id AS id,
        |    round(CASE WHEN q.qn * c.nrm <> 0
        |          THEN list_dot_product(q.qv, c.v) / (q.qn * c.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM q JOIN n c ON c.vec_id <> q.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.bruteForceTopK(queries, cands, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // LSH-bucketed multi-probe ANN — oracle replicates the md5
    // hyperplane bucketing, Hamming-1 probes, and bounded ranking.
    QueryDef.of("v02_ann_lsh_topk", N + BUCKET +
      """, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
        |    unnest([bucket, xor(bucket, 1::BIGINT), xor(bucket, 2::BIGINT)]) AS bucket
        |  FROM b WHERE vec_id < 10),
        |sc AS (SELECT DISTINCT q.query_id, c.vec_id AS id,
        |    round(CASE WHEN q.qn * c.nrm <> 0
        |          THEN list_dot_product(q.qv, c.v) / (q.qn * c.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> q.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.lshTopK(queries, cands, dim = 64, numPlanes = 4, k = 5, probes = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Brute-force embedding near-dup pairs (exact baseline / the LSH
    // verifier's oracle).
    QueryDef.of("v03_embed_neardup_brute", N +
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(CASE WHEN a.nrm * b.nrm <> 0
        |        THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm) ELSE 0.0 END, 6) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(CASE WHEN a.nrm * b.nrm <> 0
        |      THEN list_dot_product(a.v, b.v) / (a.nrm * b.nrm) ELSE 0.0 END, 6) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      // post-scan rebalance (the t68/t39 idiom): the brute pair join
      // streams one side through the scan partitioning, and at bench
      // SFs the embeddings table is ONE row group — StageAudit r19
      // measured 2.8 s of the query's 3.3 s in that single task
      Dedup.embeddingNearDupBrute(
          Tables.rebalanced(emb(s, dir)),
          "vec_id", "embedding", threshold = 0.35)
        .orderBy("id_a", "id_b")
    },

    // Sign-LSH bucketed near-dup (linear shuffle, bucket-local
    // compare) — oracle replicates the bucketing in SQL.
    QueryDef.of("v04_embed_neardup_lsh", N + BUCKET +
      """SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        |  round(CASE WHEN a.nrm * b2.nrm <> 0
        |        THEN list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm) ELSE 0.0 END, 6) AS cos
        |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |WHERE round(CASE WHEN a.nrm * b2.nrm <> 0
        |      THEN list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm) ELSE 0.0 END, 6) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.embeddingNearDupLsh(emb(s, dir), "vec_id", "embedding",
          dim = 64, numPlanes = 4, threshold = 0.2)
        .orderBy("id_a", "id_b")
    },

    // IVF-bucketed ANN — the inverted-file scale path next to the LSH
    // one. Full oracle since r7: assignment/probe argmax compares
    // 4-decimal-quantized cosines (micro-unit pattern, cf. t20/t23),
    // so ulp-level centroid drift between engines can't flip a cell,
    // and the oracle replays the seeded init + two Lloyd passes
    // (REAL-truncated means, empty cells keep their centroid) in SQL.
    QueryDef.of("v05_ann_ivf_topk", N +
      """, c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin +
      ivfAssign("c0", "a1") + ivfRecenter("a1", "c0", "c1") +
      ivfAssign("c1", "a2") + ivfRecenter("a2", "c1", "c2") +
      ivfAssign("c2", "af") +
      """, qs AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, c.cluster,
        |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
        |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
        |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
        |qp AS (SELECT query_id, qv, qn, cluster FROM qs
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
        |sc AS (SELECT qp.query_id, a.vec_id AS id,
        |    round(CASE WHEN qp.qn * n2.nrm <> 0
        |          THEN list_dot_product(qp.qv, n2.v) / (qp.qn * n2.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM qp JOIN af a USING (cluster) JOIN n n2 ON n2.vec_id = a.vec_id
        |  WHERE a.vec_id <> qp.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.ivfTopK(queries, cands,
          numClusters = 8, iters = 2, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Semantic corpus dedup (Dedup.dropEmbeddingNearDups): each
    // near-dup cluster of the v04 pair graph keeps only its min-id
    // representative. The oracle replays the bucketing + pair join,
    // walks the component graph with the t09 recursive CTE, and
    // anti-joins the non-canonical members.
    QueryDef.of("v06_embed_semantic_dedup",
      "WITH RECURSIVE " + N.stripPrefix("WITH ") + BUCKET +
      """, pairs AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |  WHERE round(CASE WHEN a.nrm * b2.nrm <> 0
        |        THEN list_dot_product(a.v, b2.v) / (a.nrm * b2.nrm) ELSE 0.0 END, 6) >= 0.2),
        |edges AS (SELECT id_a AS x, id_b AS y FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |cc AS (
        |  SELECT x AS id, x AS comp FROM edges
        |  UNION
        |  SELECT e2.y AS id, cc.comp FROM cc JOIN edges e2 ON e2.x = cc.id
        |),
        |lab AS (SELECT id, min(comp) AS component FROM cc GROUP BY id)
        |SELECT emb.vec_id FROM embeddings emb LEFT JOIN lab ON emb.vec_id = lab.id
        |WHERE lab.id IS NULL OR lab.component = emb.vec_id
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Dedup.dropEmbeddingNearDups(emb(s, dir), "vec_id", "embedding",
          dim = 64, numPlanes = 4, threshold = 0.2)
        .select("vec_id")
        .orderBy("vec_id")
    },

    // SEMANTIC decontamination (Decontaminate.semanticOverlap): the
    // embedding-space modality of the t74 data card — docs whose max
    // cosine vs ANY eval-suite vector clears the floor, attributed to
    // the nearest suite item (ties to the smallest suite id). Suite =
    // vec_id < 20 (eval-scale, broadcast), corpus = the rest. The
    // oracle is the literal cross join + arg-max replay; both engines
    // round cosine to 6 decimals before ranking and thresholding, so
    // the compare is hash-exact (the v01 discipline).
    QueryDef.of("t80_semantic_decontam", N +
      """, s AS (SELECT vec_id AS sid, v, nrm FROM n WHERE vec_id < 20),
        |d AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 20),
        |p AS (SELECT d.vec_id, s.sid,
        |    round(CASE WHEN d.nrm * s.nrm = 0 THEN 0.0
        |          ELSE list_dot_product(d.v, s.v) / (d.nrm * s.nrm) END, 6) AS cos
        |  FROM d CROSS JOIN s),
        |m AS (SELECT vec_id, sid AS nearest_id, cos FROM p
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, sid) = 1)
        |SELECT vec_id, nearest_id, cos FROM m
        |WHERE cos >= 0.32 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      graft.operators.Decontaminate.semanticOverlap(
          e.filter(col("vec_id") >= 20), "vec_id", "embedding",
          e.filter(col("vec_id") < 20), "vec_id", "embedding",
          threshold = 0.32)
        .orderBy("vec_id")
    },

    // Symmetric int8 quantization — the 4× storage cut a 100 TB
    // vector store takes before indexing: per vector, scale =
    // max|x| (so values land in [-127, 127], never -128), q_i =
    // round(x_i/scale*127), plus reconstruction-error audit. All
    // higher-order functions (transform/zip_with/aggregate) — one
    // codegen'd narrow projection, no shuffle before the final sort.
    // Both engines compute in double from the same widened floats;
    // the checksum is integer-exact and the two micro-unit columns
    // round/floor identical doubles, so the hash compare is exact.
    QueryDef.of("v07_embed_quantize",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, len(v) AS dim,
        |    list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
        |u AS (SELECT vec_id, dim, scale, i, v[i+1] AS x,
        |    CASE WHEN scale = 0 THEN 0
        |         ELSE CAST(round(v[i+1] / scale * 127) AS BIGINT) END AS q
        |  FROM s, unnest(range(0, dim)) AS t(i)),
        |g AS (SELECT vec_id, dim, scale,
        |    SUM((i+1) * q) AS q_checksum,
        |    MAX(abs(x - q * scale / 127.0)) AS max_err
        |  FROM u GROUP BY vec_id, dim, scale)
        |SELECT vec_id, CAST(dim AS INT) AS dim,
        |  CAST(round(scale * 1e6) AS BIGINT) AS scale_micro,
        |  CAST(q_checksum AS BIGINT) AS q_checksum,
        |  CAST(floor(max_err * 1e6) AS BIGINT) AS max_err_micro
        |FROM g ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.operators.Quantize.int8SummaryStats(
          graft.operators.Quantize.int8Symmetric(emb(s, dir), "vec_id", "embedding"),
          "vec_id")
        .orderBy("vec_id")
    },

    // int8 inner-product top-k over the quantized store — the scan a
    // vector database actually runs after the v07 storage cut
    // (integer SIMD dot products; rescale by the per-vector scales).
    // The ranking key is ALL-INTEGER (q·q' × scale_milli × scale'_milli),
    // so both engines rank identically and the compare is hash-exact —
    // no float-ordering tolerance anywhere. Milli (1e3), not micro:
    // |dot| ≤ dim·127² ≈ 1.03e6 at dim 64, so a micro-scaled key
    // overflows int64 once per-vector scale ≳ 3.0 — Spark would wrap
    // silently (non-ANSI) while DuckDB raises, breaking parity
    // data-dependently. With milli scales the key stays < 2^63 for any
    // scale ≤ ~2900; a probe below enforces scale ≤ 1000 outright so a
    // regenerated-embeddings drift fails loudly, not silently. Recall
    // vs the float top-k is spec-tested (OperatorSpecs), not oracled:
    // approximation quality is a property, equality is not expected.
    QueryDef.of("v08_ann_int8_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
        |qz AS (SELECT vec_id, CAST(round(scale * 1e3) AS BIGINT) AS s_milli,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(round(x / scale * 127) AS BIGINT) END) AS q
        |  FROM s),
        |qq AS (SELECT vec_id AS query_id, s_milli AS qs, q AS qv
        |  FROM qz WHERE vec_id < 10),
        |sc AS (SELECT qq.query_id, c.vec_id AS id,
        |    CAST(list_dot_product(qq.qv, c.q) AS BIGINT) * qq.qs * c.s_milli AS ip_scaled
        |  FROM qq JOIN qz c ON c.vec_id <> qq.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY ip_scaled DESC, id) AS BIGINT) AS rank,
        |  id, ip_scaled
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ip_scaled DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val qz = graft.operators.Quantize.int8Symmetric(emb(s, dir), "vec_id", "embedding")
        .select(col("vec_id"),
          round(col("scale") * 1e3).cast("long").as("s_milli"), col("q"))
      // Overflow guard (cheap column-max probe): |key| ≤ dim·127²·qs·cs
      // must stay < 2^63. scale ≤ 1000 (s_milli ≤ 1e6) keeps it below
      // ~1.04e18 at dim 64 with 3 orders of margin; regenerated
      // embeddings with larger magnitudes fail HERE, not as a silent
      // int64 wrap that DuckDB would instead raise on.
      val maxSMilli = qz.agg(max(col("s_milli"))).head().getLong(0)
      require(maxSMilli <= 1000000L,
        s"v08 int ranking key would risk int64 overflow: max scale_milli $maxSMilli > 1e6")
      val queries = qz.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("s_milli").as("qs"),
          col("q").as("qv"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("ip_scaled").desc, col("id"))
      qz.select(col("vec_id").as("id"), col("s_milli"), col("q"))
        .crossJoin(broadcast(queries))
        .filter(col("id") =!= col("query_id"))
        .withColumn("ip_scaled",
          expr("""aggregate(zip_with(qv, q, (a, b) -> a * b),
            |CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin) *
            col("qs") * col("s_milli"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "id", "ip_scaled")
        .orderBy("query_id", "rank")
    },

    // Persisted IVF index lifecycle (AnnIndex): train on the initial
    // 80% (vec_id % 5 <> 0), WRITE centroids + the cell-partitioned
    // store to parquet, UPSERT the remaining 20% against the
    // persisted centroids WITHOUT retraining, then search the
    // reloaded index. The oracle replays the v05 KMeans on the
    // initial set only, assigns ALL vectors to the final centroids
    // (write-time assignment ∪ upsert-time assignment — same argmax),
    // and probes — so the hash compare pins the whole lifecycle:
    // train → persist → reload → upsert → search.
    QueryDef.of("v09_ann_index_upsert", N +
      """, ni AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 5 <> 0),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
        |  FROM (SELECT vec_id, v FROM e WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT 8))""".stripMargin +
      ivfAssign("c0", "a1", "ni") + ivfRecenter("a1", "c0", "c1") +
      ivfAssign("c1", "a2", "ni") + ivfRecenter("a2", "c1", "c2") +
      ivfAssign("c2", "af") +
      """, qs AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, c.cluster,
        |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
        |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
        |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
        |qp AS (SELECT query_id, qv, qn, cluster FROM qs
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
        |sc AS (SELECT qp.query_id, a.vec_id AS id,
        |    round(CASE WHEN qp.qn * n2.nrm <> 0
        |          THEN list_dot_product(qp.qv, n2.v) / (qp.qn * n2.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM qp JOIN af a USING (cluster) JOIN n n2 ON n2.vec_id = a.vec_id
        |  WHERE a.vec_id <> qp.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = "/tmp/graft_ann_index_v09_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.AnnIndex.write(path,
        cands.filter(col("id") % 5 =!= 0), numClusters = 8, iters = 2)
      graft.operators.AnnIndex.upsert(path, cands.filter(col("id") % 5 === 0))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.operators.AnnIndex.topK(s, path, queries, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Index MAINTENANCE lifecycle (AnnIndex.delete/rebalance): v09's
    // train→persist→upsert flow, then DELETE every vec_id % 7 == 0
    // (append-only tombstones — no cell file is touched), REBALANCE
    // (tombstones applied physically, every cell compacted to one
    // file, codes re-encoded under the persisted quantizer — never a
    // silent retrain), and search the rebuilt store. The oracle is
    // v09's replay restricted to the surviving set; AnnIndexSpec
    // additionally pins that the pre-rebalance search (tombstone
    // anti-join path) returns the identical rows, so both deletion
    // paths are hash-gated against each other and DuckDB.
    QueryDef.of("v18_ann_delete_rebalance", N +
      """, ni AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 5 <> 0),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
        |  FROM (SELECT vec_id, v FROM e WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT 8))""".stripMargin +
      ivfAssign("c0", "a1", "ni") + ivfRecenter("a1", "c0", "c1") +
      ivfAssign("c1", "a2", "ni") + ivfRecenter("a2", "c1", "c2") +
      ivfAssign("c2", "af") +
      """, qs AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, c.cluster,
        |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
        |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
        |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
        |qp AS (SELECT query_id, qv, qn, cluster FROM qs
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
        |sc AS (SELECT qp.query_id, a.vec_id AS id,
        |    round(CASE WHEN qp.qn * n2.nrm <> 0
        |          THEN list_dot_product(qp.qv, n2.v) / (qp.qn * n2.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM qp JOIN af a USING (cluster) JOIN n n2 ON n2.vec_id = a.vec_id
        |  WHERE a.vec_id <> qp.query_id AND a.vec_id % 7 <> 0)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = "/tmp/graft_ann_index_v18_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      // fresh lifecycle per run — stale tombstones/cells would leak
      // into the deterministic compare
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.operators.AnnIndex.write(path,
        cands.filter(col("id") % 5 =!= 0), numClusters = 8, iters = 2)
      graft.operators.AnnIndex.upsert(path, cands.filter(col("id") % 5 === 0))
      graft.operators.AnnIndex.delete(path, cands.filter(col("id") % 7 === 0))
      graft.operators.AnnIndex.rebalance(s, path)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.operators.AnnIndex.topK(s, path, queries, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Product-quantization ADC top-k (SimilaritySearch.pqAdcTopK):
    // 4 subspaces × 8 sub-centroids over the 64-dim vectors — each
    // candidate collapses to 4 codes (the 100 TB storage side), each
    // query to a 4×8 lookup table, and the score is 4 lookups + adds.
    // The oracle replays the seeded per-subspace k-means (the v05
    // machinery over vector slices) and the exact ADC arithmetic:
    // fixed-order 4-term sums, reconstructed norm from sub-centroid
    // squared norms, 6-decimal rounding.
    QueryDef.of("v10_ann_pq_adc", N +
      (0 until 4).map(s => pqSubCtes(s, sub = 16, ksub = 8)).mkString +
      """, codes AS (SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
        |    a2.cluster AS k2, a3.cluster AS k3
        |  FROM afs0 a0 JOIN afs1 a1 USING (vec_id)
        |    JOIN afs2 a2 USING (vec_id) JOIN afs3 a3 USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, nrm FROM n WHERE vec_id < 10),
        |sc AS (SELECT q.query_id, cd.vec_id AS id,
        |    round(CASE WHEN q.nrm * sqrt(l0.sq + l1.sq + l2.sq + l3.sq) = 0 THEN 0.0
        |          ELSE (l0.d + l1.d + l2.d + l3.d)
        |               / (q.nrm * sqrt(l0.sq + l1.sq + l2.sq + l3.sq)) END, 6) AS cos
        |  FROM codes cd CROSS JOIN q
        |  JOIN lut0 l0 ON l0.query_id = q.query_id AND l0.cluster = cd.k0
        |  JOIN lut1 l1 ON l1.query_id = q.query_id AND l1.cluster = cd.k1
        |  JOIN lut2 l2 ON l2.query_id = q.query_id AND l2.cluster = cd.k2
        |  JOIN lut3 l3 ON l3.query_id = q.query_id AND l3.cluster = cd.k3
        |  WHERE cd.vec_id <> q.query_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.pqAdcTopK(queries, cands,
          dim = 64, m = 4, ksub = 8, iters = 2, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // IVF + PQ combined (FAISS-style IVFADC, non-residual): coarse
    // cells prune ROWS (nprobe=3 of 8 Voronoi cells per query), PQ
    // codes prune BYTES (4 ints/row instead of 64 floats). The oracle
    // composes the v05 coarse-quantizer replay (c0→af) with the v10
    // per-subspace code + LUT replay, restricted to the probed
    // (query, cluster) pairs. Each candidate lives in exactly one
    // cell, so the probe join yields unique pairs.
    QueryDef.of("v11_ann_ivfpq", IvfPqSql) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.ivfPqTopK(queries, cands,
          numClusters = 8, coarseIters = 2,
          dim = 64, m = 4, ksub = 8, pqIters = 2, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // v11's DISK-resident twin (AnnIndex.writePqCodes / topKPq): the
    // coarse quantizer, PQ codebooks, and the cell-partitioned
    // codes-only table persist to parquet; the search reads nprobe
    // pruned cell directories × 4 ints per row — the float store
    // never loads. Persisted ≡ in-memory is the AnnIndexSpec
    // invariant, so the oracle is v11's verbatim.
    QueryDef.of("v12_ann_pq_persisted", IvfPqSql) { (s, dir) =>
      val e = emb(s, dir)
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = "/tmp/graft_ann_index_v12_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.AnnIndex.write(path, cands, numClusters = 8, iters = 2)
      graft.operators.AnnIndex.writePqCodes(path, cands,
        dim = 64, m = 4, ksub = 8, iters = 2)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.operators.AnnIndex.topKPq(s, path, queries, dim = 64, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Cluster-balanced curation sample: semantic strata are LEARNED
    // (the v05 coarse quantizer's cells), then the t10 deterministic
    // per-stratum top-k caps each cell at 40 docs by md5 order — the
    // SemDeDup-era recipe for diversity-preserving downsampling. The
    // oracle replays the quantizer (c0→af) and the md5 window.
    QueryDef.of("v13_cluster_balanced_sample", N +
      """, c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin +
      ivfAssign("c0", "a1") + ivfRecenter("a1", "c0", "c1") +
      ivfAssign("c1", "a2") + ivfRecenter("a2", "c1", "c2") +
      ivfAssign("c2", "af") +
      """ SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM af
        |QUALIFY row_number() OVER (PARTITION BY cluster
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 40
        |ORDER BY cluster, vec_id""".stripMargin) { (s, dir) =>
      val assigned = SimilaritySearch.assignClusters(
        emb(s, dir).select(col("vec_id"), col("embedding").as("vec")),
        "vec_id", "vec", numClusters = 8, iters = 2)
      graft.operators.Sampling.deterministicPerStratum(
          assigned, Seq("cluster"), k = 40, idCol = "vec_id")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy("cluster", "vec_id")
    },

    // IVFPQ shortlist (25 per query off the codes-only scan) + EXACT
    // cosine re-rank of only those ids to the final 5 — the standard
    // production refinement. The oracle extends the v11 CTEs: ADC
    // top-25 per query, then exact cosine over the shortlisted pairs.
    QueryDef.of("v14_ann_ivfpq_rerank", IvfPqScoredCtes +
      """, sl AS (SELECT query_id, id FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 25),
        |rr AS (SELECT sl.query_id, sl.id,
        |    round(CASE WHEN q.nrm * c.nrm <> 0
        |          THEN list_dot_product(q.v, c.v) / (q.nrm * c.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM sl JOIN n q ON q.vec_id = sl.query_id JOIN n c ON c.vec_id = sl.id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM rr
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.ivfPqRerankTopK(queries, cands,
          numClusters = 8, coarseIters = 2,
          dim = 64, m = 4, ksub = 8, pqIters = 2,
          shortlist = 25, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // RESIDUAL-encoded IVFPQ (v16): true FAISS IVFADC — codes
    // quantize v − μ_cell, the score decomposes into the probe-join
    // q·μ term, the residual LUTs, and KB-sized centroid-dot literal
    // corrections; same m ints per row on the scan side, strictly
    // finer reconstruction at identical storage (specced vs v11).
    QueryDef.of("v16_ann_ivfpq_residual", IvfPqResidualSql) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.ivfPqResidualTopK(queries, cands,
          numClusters = 8, coarseIters = 2,
          dim = 64, m = 4, ksub = 8, pqIters = 2, k = 5, nprobe = 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // V17: MMR diversified re-ranking (SimilaritySearch.mmrRerank,
    // Carbonell & Goldstein 1998) — λ·rel − (1−λ)·max-sim-to-selected
    // over the v01 top-20 shortlist, 8 picks at λ = 7/10. The oracle
    // UNROLLS the 8 argmax steps with the operator's exact INTEGER
    // scores (7·rel_micro − 3·msim_micro over micro-unit inputs, ties
    // to the lower id) — no floating rounding anywhere in the argmax.
    QueryDef.of("v17_ann_mmr", MmrSql) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.mmrRerank(
          SimilaritySearch.bruteForceTopK(queries, cands, k = 20)
            .select(col("query_id"), col("id"), col("cos").as("rel")),
          cands, k = 8, lambdaNum = 7, lambdaDen = 10)
        .orderBy("query_id", "rank")
    },

    // FILTERED ANN over the persisted IVFPQ index: a metadata range
    // predicate (id ∈ [100, 400)) rides the codes scan BEFORE the
    // probe join and ranking — pre-filtering semantics, so the top-k
    // is over exactly the qualifying candidates (a post-filter of an
    // unfiltered top-k could return < k). The predicate is pushed to
    // the parquet reader (PushedFilters, plan-audited); the oracle is
    // v12's IVFADC replay with the same WHERE on the candidate side.
    QueryDef.of("v15_ann_filtered",
      ivfPqSqlWhere(" AND a.vec_id >= 100 AND a.vec_id < 400")) { (s, dir) =>
      val e = emb(s, dir)
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val path = "/tmp/graft_ann_index_v15_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.AnnIndex.write(path, cands, numClusters = 8, iters = 2)
      graft.operators.AnnIndex.writePqCodes(path, cands,
        dim = 64, m = 4, ksub = 8, iters = 2)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.operators.AnnIndex.topKPq(s, path, queries, dim = 64, k = 5, nprobe = 3,
          where = Some(col("id") >= 100 && col("id") < 400))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // V19: recall@5 of the IVF path against the exact brute-force
    // ranking — the ANN quality gauge (tracked next to latency in any
    // FAISS-style deployment). The oracle replays BOTH sides in full
    // (v01's exact ranking, v05's seeded-init + 2-Lloyd-pass IVF) and
    // intersects their top-5 sets per query; the engine runs the two
    // real operators and joins. The brute side is the measurement's
    // inherent quadratic cost, so at scale recall runs on a query
    // sample — here the same 10-query probe set every v-query uses.
    QueryDef.of("v19_ann_recall", N +
      """, c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
        |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin +
      ivfAssign("c0", "a1") + ivfRecenter("a1", "c0", "c1") +
      ivfAssign("c1", "a2") + ivfRecenter("a2", "c1", "c2") +
      ivfAssign("c2", "af") +
      """, bq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |bsc AS (SELECT bq.query_id, c.vec_id AS id,
        |    round(CASE WHEN bq.qn * c.nrm <> 0
        |          THEN list_dot_product(bq.qv, c.v) / (bq.qn * c.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM bq JOIN n c ON c.vec_id <> bq.query_id),
        |bt AS MATERIALIZED (SELECT query_id, id FROM bsc
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5),
        |iqs AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, c.cluster,
        |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
        |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
        |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
        |iqp AS (SELECT query_id, qv, qn, cluster FROM iqs
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
        |isc AS (SELECT iqp.query_id, a.vec_id AS id,
        |    round(CASE WHEN iqp.qn * n2.nrm <> 0
        |          THEN list_dot_product(iqp.qv, n2.v) / (iqp.qn * n2.nrm) ELSE 0.0 END, 6) AS cos
        |  FROM iqp JOIN af a USING (cluster) JOIN n n2 ON n2.vec_id = a.vec_id
        |  WHERE a.vec_id <> iqp.query_id),
        |it AS MATERIALIZED (SELECT query_id, id FROM isc
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5)
        |SELECT b.query_id, CAST(count(i.id) AS BIGINT) AS n_hits,
        |  round(count(i.id) / CAST(count(*) AS DOUBLE), 6) AS recall
        |FROM bt b LEFT JOIN it i ON i.query_id = b.query_id AND i.id = b.id
        |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.recallAtK(
          SimilaritySearch.bruteForceTopK(queries, cands, k = 5),
          SimilaritySearch.ivfTopK(queries, cands,
            numClusters = 8, iters = 2, k = 5, nprobe = 3),
          k = 5)
        .orderBy("query_id")
    },

    // V20: binary-quantized ANN (sign-bit codes, Charikar 2002) — the
    // 32×-compression memory tier: 60 hyperplane sign bits in one
    // long, integer Hamming scan (xor + popcount, engine-exact),
    // exact-cosine rerank of the top-50 shortlist. The oracle replays
    // all 60 md5-keystream projections, the (ham, id) shortlist order,
    // and the rerank.
    QueryDef.of("v20_ann_binary_hamming", N +
      s""", cc AS MATERIALIZED (SELECT vec_id, CAST(${binaryCodeSql} AS BIGINT) AS code
         |  FROM n),
         |qq AS (SELECT vec_id AS query_id, code AS qcode FROM cc WHERE vec_id < 10),
         |hm AS (SELECT q.query_id, c.vec_id AS id, bit_count(xor(c.code, q.qcode)) AS ham
         |  FROM cc c JOIN qq q ON c.vec_id <> q.query_id),
         |sl AS (SELECT query_id, id FROM hm
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ham, id) <= 50),
         |sc AS (SELECT sl.query_id, sl.id,
         |    round(CASE WHEN nq.nrm * nc.nrm <> 0
         |          THEN list_dot_product(nq.v, nc.v) / (nq.nrm * nc.nrm) ELSE 0.0 END, 6) AS cos
         |  FROM sl JOIN n nc ON nc.vec_id = sl.id
         |  JOIN n nq ON nq.vec_id = sl.query_id)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
         |  id, cos
         |FROM sc
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val cands = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      SimilaritySearch.binaryHammingTopK(queries, cands,
          dim = 64, bits = 60, shortlist = 50, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    })

  /** The 60 sign-bit projections packed into one integer — the SQL
    * mirror of `VectorFunctions.signLshBucket(vec, 64, 60)`, generated
    * from the same bit positions so the two can never drift. */
  private[queries] lazy val binaryCodeSql: String =
    (0 until 60).map(p =>
      s"(CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")

  /** The IVFADC oracle (shared by v11/v12, prefix of v14): v05's
    * coarse-quantizer replay (c0→af) composed with v10's per-subspace
    * code + LUT replay, restricted to each query's 3 probed cells. */
  private lazy val IvfPqSql: String = ivfPqSqlWhere("")

  /** The IVFADC replay with an extra candidate-side predicate spliced
    * into the `sc` WHERE — the filtered-search oracle (v15): the
    * filter applies BEFORE ranking, exactly like the pushed scan
    * predicate on the Spark side. */
  private def ivfPqSqlWhere(candWhere: String): String =
    IvfPqScoredCtes.replace(
      "WHERE a.vec_id <> qp.query_id",
      "WHERE a.vec_id <> qp.query_id" + candWhere) +
      """SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS BIGINT) AS rank,
        |  id, cos
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) <= 5
        |ORDER BY query_id, rank""".stripMargin

  private lazy val IvfPqScoredCtes: String = N +
    """, c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
      |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8))""".stripMargin +
    ivfAssign("c0", "a1") + ivfRecenter("a1", "c0", "c1") +
    ivfAssign("c1", "a2") + ivfRecenter("a2", "c1", "c2") +
    ivfAssign("c2", "af") +
    (0 until 4).map(s => pqSubCtes(s, sub = 16, ksub = 8)).mkString +
    """, codes AS (SELECT a0.vec_id, a0.cluster AS k0, a1.cluster AS k1,
      |    a2.cluster AS k2, a3.cluster AS k3
      |  FROM afs0 a0 JOIN afs1 a1 USING (vec_id)
      |    JOIN afs2 a2 USING (vec_id) JOIN afs3 a3 USING (vec_id)),
      |qs AS (SELECT n.vec_id AS query_id, n.nrm AS qn, c.cluster,
      |    round(CASE WHEN n.nrm * sqrt(list_dot_product(c.v, c.v)) = 0 THEN -1.0
      |          ELSE list_dot_product(n.v, c.v) / (n.nrm * sqrt(list_dot_product(c.v, c.v))) END, 4) AS qcos
      |  FROM n CROSS JOIN c2 c WHERE n.vec_id < 10),
      |qp AS (SELECT query_id, qn, cluster FROM qs
      |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, cluster) <= 3),
      |sc AS (SELECT qp.query_id, a.vec_id AS id,
      |    round(CASE WHEN qp.qn * sqrt(l0.sq + l1.sq + l2.sq + l3.sq) = 0 THEN 0.0
      |          ELSE (l0.d + l1.d + l2.d + l3.d)
      |               / (qp.qn * sqrt(l0.sq + l1.sq + l2.sq + l3.sq)) END, 6) AS cos
      |  FROM qp JOIN af a USING (cluster) JOIN codes cd ON cd.vec_id = a.vec_id
      |  JOIN lut0 l0 ON l0.query_id = qp.query_id AND l0.cluster = cd.k0
      |  JOIN lut1 l1 ON l1.query_id = qp.query_id AND l1.cluster = cd.k1
      |  JOIN lut2 l2 ON l2.query_id = qp.query_id AND l2.cluster = cd.k2
      |  JOIN lut3 l3 ON l3.query_id = qp.query_id AND l3.cluster = cd.k3
      |  WHERE a.vec_id <> qp.query_id)
      |""".stripMargin
}
