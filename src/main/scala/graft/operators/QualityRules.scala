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
 * Two rule families:
 *  - [[gopher]] — the document-level rules (word counts, mean word
 *    length, symbol ratio, alpha fraction, stop-word floor);
 *  - [[lineRules]] — the LINE-level MassiveWeb/C4 rules over
 *    newline-structured text (bullet-start fraction, ellipsis-end
 *    fraction, terminal-punctuation fraction, duplicate-line
 *    fraction). The synthetic corpus carries no newlines, so the t69
 *    oracle derives a newline-bearing corpus first (the t67 idiom).
 *
 * Document rules ([[gopher]]):
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

  /**
   * LINE-level quality rules — the MassiveWeb line heuristics (Rae et
   * al. 2021 Appendix A) plus C4's terminal-punctuation rule
   * (Raffel et al. 2020 §2.2) lifted to a document-level fraction,
   * plus the duplicate-line fraction (the boilerplate signal behind
   * nav bars / cookie banners):
   *  - fraction of lines starting with a bullet ("- ", "* ", "• ") ≤
   *    maxBulletFrac (Gopher drops docs >90% bulleted);
   *  - fraction of lines ending in an ellipsis ("..." or "…") ≤
   *    maxEllipsisFrac (Gopher: 30%);
   *  - fraction of lines ending in terminal punctuation (./!/?/"/”)
   *    ≥ minTerminalFrac (C4 keeps only such lines; as a document
   *    gate, a mostly-unterminated doc is dropped);
   *  - duplicate-line fraction (1 − distinct/total) ≤ maxDupFrac.
   *
   * Lines are the '\n' splits of the raw text, trimmed, empties
   * dropped. Every fraction is rounded to 6 dp before its rule
   * comparison (the house boundary discipline). Scale shape: ONE
   * map-only projection — all built-in codegen collection
   * expressions, no shuffle, no UDF; runs at scan speed next to
   * [[gopher]] ahead of every join-bearing gate.
   */
  def lineRules(
      docs: DataFrame, idCol: String, textCol: String,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minTerminalFrac: Double = 0.5, maxDupFrac: Double = 0.3): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)), l => length(l) > 0)
    val n = size(lines).cast("long")
    def frac(pred: Column => Column): Column =
      round(when(n > 0, size(filter(lines, pred)).cast("double") / n)
        .otherwise(0.0), 6)
    val bulletFrac = frac(l => substring(l, 1, 2).isin("- ", "* ", "• "))
    val ellipsisFrac = frac(l => l.endsWith("...") || l.endsWith("…"))
    val terminalFrac = frac(l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"", "”"))
    val dupFrac = round(
      when(n > 0,
        (n - size(array_distinct(lines))).cast("double") / n).otherwise(0.0), 6)
    docs.select(
        col(idCol), n.as("n_lines"), bulletFrac.as("bullet_frac"),
        ellipsisFrac.as("ellipsis_frac"), terminalFrac.as("terminal_frac"),
        dupFrac.as("dup_line_frac"))
      .withColumn("pass_bullets", col("bullet_frac") <= maxBulletFrac)
      .withColumn("pass_ellipsis", col("ellipsis_frac") <= maxEllipsisFrac)
      .withColumn("pass_terminal", col("terminal_frac") >= minTerminalFrac)
      .withColumn("pass_dup_lines", col("dup_line_frac") <= maxDupFrac)
      .withColumn("pass",
        col("pass_bullets") && col("pass_ellipsis") &&
          col("pass_terminal") && col("pass_dup_lines"))
  }
}
