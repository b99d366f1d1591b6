package graft.queries

import graft.operators.PageRank
import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over `documents` — the crawl-graph quality
 * prior of a training-data pipeline (PageRank as the domain/document
 * weight that feeds sampling, per the public LLM-data recipes that
 * weight by incoming-link authority).
 *
 * The testdata has no link column, so the graph is SYNTHESIZED
 * deterministically from doc_id arithmetic (three out-edges per
 * document, modular-affine targets, self-loops removed, simple-graph
 * dedup) — the oracle rebuilds the identical graph, then replays the
 * power iteration UNROLLED (one materialized CTE per iteration; the
 * MATERIALIZED is load-bearing — each step references its predecessor
 * twice, which DuckDB's CTE inlining would otherwise expand
 * exponentially).
 *
 * Float determinism: per-vertex contribution sums associate
 * differently in Spark's partial aggregates than in DuckDB, but the
 * relative wobble is ~1e-15 per iteration; ranks are scaled to mean 1
 * and rounded to 6 dp at the very end, nine orders of magnitude above
 * the noise.
 */
object QGraph {

  private val Damping = "0.85"
  private val Teleport = "0.15" // 1 − damping, as the same literal text
  private val Iterations = 5

  /** Edge/degree/init CTE prefix shared by the oracle. */
  private val GraphCte =
    """WITH cnt AS (SELECT count(*) AS c FROM documents),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |e0 AS (SELECT doc_id AS src, (doc_id*17+3) % cnt.c AS dst FROM documents CROSS JOIN cnt
      |  UNION ALL SELECT doc_id, (doc_id*31+7) % cnt.c FROM documents CROSS JOIN cnt
      |  UNION ALL SELECT doc_id, (doc_id*13+11) % cnt.c FROM documents CROSS JOIN cnt),
      |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src),
      |r0 AS MATERIALIZED (SELECT doc_id AS id, 1.0/nn.n AS pr FROM documents CROSS JOIN nn)""".stripMargin

  /** One unrolled power-iteration step r{i} from r{i-1}. */
  private def iterCte(i: Int): String =
    s"""r$i AS MATERIALIZED (
       |  SELECT d.doc_id AS id,
       |    $Teleport/nn.n + $Damping * (coalesce(c.contrib, 0.0) + dg.dm/nn.n) AS pr
       |  FROM documents d
       |  CROSS JOIN nn
       |  CROSS JOIN (SELECT coalesce(sum(r.pr), 0.0) AS dm
       |              FROM r${i - 1} r LEFT JOIN deg ON r.id = deg.src
       |              WHERE deg.src IS NULL) dg
       |  LEFT JOIN (SELECT e.dst AS id, sum(r.pr / deg.deg) AS contrib
       |             FROM e JOIN r${i - 1} r ON e.src = r.id
       |             JOIN deg ON deg.src = e.src
       |             GROUP BY e.dst) c ON c.id = d.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // G1: 5-iteration damped PageRank with dangling redistribution
    // over the synthesized 3-out-regular document graph; ranks scaled
    // to mean 1 (Σ pr = 1 ⇒ scaled mean exactly 1) and rounded.
    QueryDef.of("g01_pagerank",
      (Seq(GraphCte) ++ (1 to Iterations).map(iterCte)).mkString(",\n") +
        s"""
           |SELECT id AS doc_id, round(pr * nn.n, 6) AS pr_scaled
           |FROM r$Iterations CROSS JOIN nn ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 17 + 3) % n,
            (col("doc_id") * 31 + 7) % n,
            (col("doc_id") * 13 + 11) % n)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      PageRank.run(docs, "doc_id", edges, "src", "dst",
          iterations = Iterations, damping = Damping.toDouble)
        .select(col("doc_id"), round(col("pr") * n, 6).as("pr_scaled"))
        .orderBy("doc_id")
    })
}
