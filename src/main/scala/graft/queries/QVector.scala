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

    // LSH-bucketed ANN (recall < 1 → rows-only; recall vs brute is
    // asserted in SimilaritySearchSpec).
    QueryDef.rowsOnly("v02_ann_lsh_topk") { (s, dir) =>
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
      Dedup.embeddingNearDupBrute(emb(s, dir), "vec_id", "embedding", threshold = 0.35)
        .orderBy("id_a", "id_b")
    },

    // Sign-LSH bucketed near-dup (linear shuffle, bucket-local
    // compare; subset-of-brute tested in DedupSpec).
    QueryDef.rowsOnly("v04_embed_neardup_lsh") { (s, dir) =>
      Dedup.embeddingNearDupLsh(emb(s, dir), "vec_id", "embedding",
          dim = 64, numPlanes = 4, threshold = 0.2)
        .orderBy("id_a", "id_b")
    })
}
