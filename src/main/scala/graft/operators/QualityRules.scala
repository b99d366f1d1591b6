package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Rule-based document quality gates — the GOPHER filter bundle (Rae
 * et al. 2021 "Scaling Language Models", Appendix A / the MassiveWeb
 * rules; public method, reused by RedPajama/Dolma/FineWeb): unlike
 * the trained classifier ([[QualityModel]]) or the perplexity filters
 * ([[TextModel]]), these are pure per-document heuristics a pipeline
 * runs FIRST because they are map-only and catch the cheap failure
 * modes (machine-generated symbol soup, word-salad length outliers,
 * no-stopword keyword stuffing).
 *
 * Rules (document-level subset — the reference line-based rules need
 * newline structure this corpus lacks; [[LineDedup]] covers the
 * boilerplate-line surface):
 *  - word count within [minWords, maxWords];
 *  - mean word length within [minMeanLen, maxMeanLen] (characters per
 *    whitespace-delimited word);
 *  - symbol-to-word ratio (`#` plus `...` occurrences) ≤
 *    maxSymbolRatio;
 *  - fraction of words containing ≥1 alphabetic character ≥
 *    minAlphaFrac;
 *  - at least minStopwords DISTINCT members of the Gopher stop list
 *    {the, be, to, of, and, that, have, with} appear.
 *
 * Determinism: every ratio is rounded to 6 dp before the rule
 * comparison (the house boundary discipline — engine replicas agree
 * at the threshold), and the word split is the plain `\s+` of trimmed
 * raw text in both engines. Scale shape: ONE map-only projection —
 * no shuffle, no UDF, all built-in codegen expressions; at 100 TB
 * this runs at scan speed ahead of every join-bearing gate.
 */
object QualityRules {

  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopher(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val t = trim(col(textCol))
    def occurrences(needle: String, width: Int): Column =
      (length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(needle), ""))) / width
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    // Σ word lengths = length with ALL whitespace removed — no
    // per-word aggregate needed
    val charSum = length(regexp_replace(t, "\\s+", "")).cast("double")
    val meanLen = round(when(nWords > 0, charSum / nWords).otherwise(0.0), 6)
    val symbolRatio = round(
      when(nWords > 0,
        (occurrences("#", 1) + occurrences("...", 3)).cast("double") / nWords)
        .otherwise(0.0), 6)
    val alphaFrac = round(
      when(nWords > 0,
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
        .otherwise(0.0), 6)
    val nStop = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      array(GopherStopwords.map(lit): _*))).cast("long")
    docs.select(
        col(idCol), nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
        nStop.as("n_stopwords"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("pass_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("pass_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("pass_stopwords", col("n_stopwords") >= minStopwords)
      .withColumn("pass",
        col("pass_words") && col("pass_mean_len") && col("pass_symbols") &&
          col("pass_alpha") && col("pass_stopwords"))
  }
}
