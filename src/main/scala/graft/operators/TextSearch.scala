package graft.operators

import graft.functions.TextFunctions
import graft.plans.TopKAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text relevance search over the corpus: Okapi BM25 scoring
 * (Robertson & Zaragoza 2009, public method) of a small query set
 * against the documents table — the retrieval primitive behind
 * corpus exploration and hard-negative mining.
 *
 * Scale shape (100 TB corpus, broadcast-sized query set):
 *  - the query-term set is BROADCAST; the corpus-side explode is
 *    filtered map-side by that set before any shuffle, so the only
 *    corpus-wide exchange carries (doc, term, tf) rows for QUERY
 *    terms only — |matching docs| × |query terms| at most;
 *  - document frequency per term aggregates over that filtered frame
 *    (≤ |query terms| keys) and joins back as a broadcast;
 *  - corpus size N and average document length are ONE 1-row
 *    aggregate, attached as a broadcast 1-row cross join;
 *  - ranking is the bounded [[TopKAgg]] — never a row_number window
 *    (which would shuffle every scored row onto |queries| reducers).
 */
object TextSearch {

  /**
   * Top-k documents per query by BM25. `queries` is (query_id long,
   * qtext string), broadcast-sized. Repeated query terms count once
   * (set semantics — standard for short keyword queries). Scores are
   * summed in integer micro-units (each term's contribution rounded
   * to 1e-6 first) so the total is exact and independent of the
   * floating-point summation order — reproducible across engines,
   * partitionings and cluster sizes.
   *
   * Returns (query_id, rank, id, score), rank 1-based, ties broken by
   * lower doc id.
   */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries
      .select(col("query_id"), explode(TextFunctions.tokens(
        TextFunctions.canonicalText(col("qtext")))).as("term"))
      .distinct()
    val terms = qTerms.select("term").distinct()

    // (id, dl, term, tf) for query terms only: the broadcast semi-join
    // prunes before the groupBy, so the shuffle is bounded by matches
    val docTerms = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(TextFunctions.canonicalText(col(textCol))).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))

    // avgdl as exact-integer-sum / count: a floating avg() accumulates
    // in engine- and order-dependent ways; the long sum is exact, so
    // both engines derive the identical double
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(TextFunctions.tokenCount(TextFunctions.canonicalText(col(textCol)))
        .cast("long")).cast("double") / count(lit(1))).as("avgdl"))

    val dfPerTerm = docTerms.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val contrib = docTerms
      .join(broadcast(dfPerTerm), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), Seq("term"))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__c_micro",
        round(col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))) * 1e6)
          .cast("long"))

    val scored = contrib
      .groupBy("query_id", "id")
      .agg((sum(col("__c_micro")).cast("double") / 1e6).as("score"))

    val topk = TopKAgg.topK(k)
    scored.groupBy("query_id").agg(topk(col("score"), col("id")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "top")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("top.id").as("id"),
        round(col("top.score"), 6).as("score"))
  }

  /**
   * Top-k tf-idf keywords per document (smooth idf, the sklearn
   * formulation — public: ln((1+N)/(1+df)) + 1, scored tf·idf).
   * Returns (id, rank, term, tfidf), rank 1-based, ties broken
   * lexicographically by term.
   *
   * Scale shape: two linear shuffles — (id, term) term frequencies,
   * then document frequency keyed by term — and a term-keyed join of
   * the two (the vocabulary is unbounded, so the df side is NOT
   * broadcast; AQE may still choose to on small corpora). The final
   * ranking IS a row_number window, deliberately: its partitions are
   * per-document term lists, bounded by document length — unlike
   * ANN/BM25 candidates the group size cannot grow with corpus size,
   * so the window shuffle is linear and skew-free. Scores are the
   * single product tf·idf rounded to integer micro-units (no
   * summation → no float-order sensitivity anywhere).
   */
  def tfidfKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(TextFunctions.canonicalText(col(textCol))).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("__m",
        round((log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0)
          * col("tf") * 1e6).cast("long"))
    val w = Window.partitionBy("id").orderBy(col("__m").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"),
        (col("__m").cast("double") / 1e6).as("tfidf"))
  }

  /**
   * Reciprocal-rank fusion of two rankings (Cormack et al. SIGIR 2009
   * — the standard score-free hybrid-retrieval combiner):
   * `rrf = Σ_lists 1/(kRrf + rank)`, absent list membership
   * contributing 0. Fusing a BM25 list with an ANN cosine list is the
   * textbook sparse+dense hybrid; being rank-based it needs no score
   * normalization between incomparable scales.
   *
   * Both inputs are (query_id, id, rank) top-k lists — BOUNDED per
   * query by construction — so the full-outer join and the final
   * row_number window operate on ≤ 2k rows per query: the window's
   * partition size CANNOT grow with corpus size, making it safe at
   * any scale (the same bounded-window argument as [[tfidfKeywords]]).
   * Returns (query_id, rank, id, rrf_score) with ties broken by lower
   * id; rrf_score rounded to 6 decimals (sum of two exact divisions —
   * engine-reproducible).
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60): DataFrame = {
    require(k >= 1 && kRrf >= 0, "k must be >= 1 and kRrf >= 0")
    val fa = a.select(col("query_id"), col("id"), col("rank").as("__ra"))
    val fb = b.select(col("query_id"), col("id"), col("rank").as("__rb"))
    val score =
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__ra")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rb")), lit(0.0))
    val w = Window.partitionBy("query_id").orderBy(col("__s").desc, col("id"))
    fa.join(fb, Seq("query_id", "id"), "full_outer")
      .withColumn("__s", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"),
        round(col("__s"), 6).as("rrf_score"))
  }
}
