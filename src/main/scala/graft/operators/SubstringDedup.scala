package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact duplicated-substring detection — the token-level analogue of
 * the suffix-array dedup of Lee et al. 2021 ("Deduplicating Training
 * Data Makes Language Models Better", public method): any n-token
 * span whose text occurs more than once in the corpus (in the same or
 * another document) is flagged, and overlapping flagged spans merge
 * into maximal duplicated regions per document. Callers cut or drop
 * the regions.
 *
 * The suffix-array construction of the paper is replaced by the
 * shuffle-friendly equivalent: every POSITION contributes its n-gram
 * (a duplicated span of length L ≥ n is exactly a run of L−n+1
 * duplicated n-grams, so maximal regions are recovered losslessly by
 * merging the per-position hits).
 *
 * Approximation bound (measured by the `t62` planted-span
 * evaluation): duplicated spans of length ≥ n are recovered
 * TOKEN-EXACTLY (a token lies in a flagged region iff it lies inside
 * some duplicated n-token window — recall and precision both 1.0 at
 * the n threshold), while spans SHORTER than n are invisible (every
 * n-gram covering them straddles into non-duplicated context). Pick
 * n = the Lee et al. length threshold; there is no sub-threshold
 * recall, by construction.
 *
 * Scale shape: one positional explode (|tokens| rows, the shingle
 * cost), one 16-byte-key hash aggregate for global n-gram counts, a
 * semi-join back, and a per-document gaps-and-islands window whose
 * partitions are bounded by document length — never by corpus size.
 */
object SubstringDedup {

  /**
   * Maximal duplicated token spans: (id, span_start, span_end,
   * n_positions) with token positions 0-based and `span_end`
   * EXCLUSIVE (span_end − span_start ≥ n for every emitted row).
   * Documents with no duplicated n-gram are absent.
   *
   * Each emitted span is the UNION of a maximal chain of mutually
   * overlapping duplicated windows — every token in it is covered by
   * at least one n-gram that occurs ≥ 2 times corpus-wide, though an
   * interior window of the merged region may itself be unique.
   * Occurrences in the SAME document count: a document repeating its
   * own paragraph is exactly the redundancy the operator exists to
   * find.
   */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, "n-gram order must be >= 2")
    // (id, pos, h): md5 of the n-gram at each 0-based token position
    val grams = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(TextFunctions.canonicalText(col(textCol))).as("__toks"))
      .select(col("id"),
        posexplode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), md5(col("g")).as("h"))
    val dupHashes = grams.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    val hits = grams.join(dupHashes, Seq("h"), "left_semi")
    // gaps-and-islands on positions: two hit positions p1 < p2 belong
    // to one region iff their spans [p, p+n) OVERLAP (share ≥ 1
    // token), i.e. p2 − p1 ≤ n−1 — exactly-touching spans (gap = n)
    // stay separate rows. The t24 oracle encodes the same constant.
    // Both window passes share one (id, pos) sort-shuffle, and the
    // partitions are per-document position lists (bounded by document
    // length, not corpus size).
    val w = Window.partitionBy("id").orderBy("pos")
    hits
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n - 1, 0).otherwise(1))
      .withColumn("__grp", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id").as(idCol), col("__grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + n).cast("long").as("span_end"),
        count(lit(1)).as("n_positions"))
      .drop("__grp")
  }

  /**
   * The CUT step that completes the Lee et al. pipeline: remove every
   * duplicated region from each document and reassemble the survivors
   * — `(id, clean_text, n_tokens, n_cut)` over the SAME canonical
   * token stream [[duplicatedSpans]] indexes (positions align by
   * construction; cutting raw text on canonical positions would
   * mis-slice around punctuation). Documents with no duplicated span
   * pass through with `n_cut = 0`; a fully-duplicated document
   * becomes the empty string — the caller drops or keeps it by
   * `n_tokens − n_cut`.
   *
   * Scale shape: [[duplicatedSpans]]' cost plus ONE equi-join of the
   * per-doc span lists back to the corpus on the id (span lists are
   * bounded by document length — they ride a row, never a shuffle of
   * corpus text), and the cut itself is an in-row higher-order
   * `filter` over (token, position) — codegen, no explode of the
   * corpus tokens.
   */
  def cutDuplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spanType = "array<struct<span_start:bigint,span_end:bigint>>"
    val spans = duplicatedSpans(docs, idCol, textCol, n)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    docs
      .select(col(idCol),
        TextFunctions.tokens(TextFunctions.canonicalText(col(textCol))).as("__toks"))
      .join(spans, Seq(idCol), "left")
      .withColumn("__spans", coalesce(col("__spans"), array().cast(spanType)))
      .withColumn("__kept", filter(col("__toks"), (t, i) =>
        !exists(col("__spans"), s =>
          i.cast("long") >= s("span_start") && i.cast("long") < s("span_end"))))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_cut"))
  }
}
