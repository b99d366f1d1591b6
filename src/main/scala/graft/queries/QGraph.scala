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

  private val HitsIterations = 4

  /** Version tag of the SYNTHESIZED edge formula (the three
    * modular-affine out-edges below). Baked into the persisted
    * EdgeStore path so a formula change — or an sf dir regenerated at
    * the same path and size with different content — can never be
    * served a stale cached graph: a new tag (or new n) is a new path,
    * and the old snapshot is simply never resolved again. */
  private val EdgeFormulaTag = "ef1"

  /** The persisted-EdgeStore path for one (sf dir, vertex count) —
    * written once, reused by every later g01/g02 run. */
  private def edgeStorePath(dir: String, n: Long): String =
    "/tmp/graft_edge_store_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      s"_n${n}_$EdgeFormulaTag"

  /** One unrolled HITS iteration: authority step from h{i-1}, hub step
    * from the fresh a{i}, each L1-normalized via a scalar subquery. */
  private def hitsIter(i: Int): String =
    s"""a${i}r AS MATERIALIZED (SELECT d.doc_id AS id, coalesce(x.s, 0.0) AS s
       |  FROM documents d LEFT JOIN (SELECT e.dst AS id, sum(h.s) AS s
       |    FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY e.dst) x
       |  ON x.id = d.doc_id),
       |a$i AS MATERIALIZED (SELECT id, s / (SELECT sum(s) FROM a${i}r) AS s FROM a${i}r),
       |h${i}r AS MATERIALIZED (SELECT d.doc_id AS id, coalesce(x.s, 0.0) AS s
       |  FROM documents d LEFT JOIN (SELECT e.src AS id, sum(a.s) AS s
       |    FROM e JOIN a$i a ON e.dst = a.id GROUP BY e.src) x
       |  ON x.id = d.doc_id),
       |h$i AS MATERIALIZED (SELECT id, s / (SELECT sum(s) FROM h${i}r) AS s FROM h${i}r)""".stripMargin

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
      // the production shape: the crawl graph persists ONCE as a
      // src/dst-bucketed EdgeStore snapshot (keyed by corpus size AND
      // the edge-formula tag so a formula change or regenerated sf dir
      // re-writes), and every ranking run after loads it with zero
      // edge shuffle — even from a cold start
      val path = edgeStorePath(dir, n)
      if (graft.io.StoreManifest.read(s, path).isEmpty)
        graft.io.EdgeStore.write(path, docs, "doc_id", edges, "src", "dst")
      PageRank.runIndexed(docs, "doc_id", path,
          iterations = Iterations, damping = Damping.toDouble)
        .select(col("doc_id"), round(col("pr") * n, 6).as("pr_scaled"))
        .orderBy("doc_id")
    },

    // G2: 4-iteration HITS hubs/authorities over the same graph,
    // L1-normalized each half-step; both scores scaled to mean 1.
    // The complementary crawl signal to g01: authorities = canonical
    // sources, hubs = directories/link farms.
    QueryDef.of("g02_hits",
      (Seq(GraphCte,
        "h0 AS MATERIALIZED (SELECT doc_id AS id, 1.0/nn.n AS s FROM documents CROSS JOIN nn)") ++
        (1 to HitsIterations).map(hitsIter)).mkString(",\n") +
        s"""
           |SELECT a$HitsIterations.id AS doc_id,
           |  round(a$HitsIterations.s * nn.n, 6) AS authority_scaled,
           |  round(h$HitsIterations.s * nn.n, 6) AS hub_scaled
           |FROM a$HitsIterations JOIN h$HitsIterations USING (id) CROSS JOIN nn
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
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
      // same persisted EdgeStore snapshot as g01 (same synthesized
      // graph): both bucketed copies load with zero edge shuffle
      val path = edgeStorePath(dir, n)
      if (graft.io.StoreManifest.read(s, path).isEmpty)
        graft.io.EdgeStore.write(path, docs, "doc_id", edges, "src", "dst")
      graft.operators.Hits.runIndexed(docs, "doc_id", path,
          iterations = HitsIterations)
        .select(col("doc_id"),
          round(col("authority") * n, 6).as("authority_scaled"),
          round(col("hub") * n, 6).as("hub_scaled"))
        .orderBy("doc_id")
    })
}
