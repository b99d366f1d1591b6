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

  /** One language's Gopher rule table — what a multilingual curation
    * run configures PER LANGUAGE after routing (CCNet/Dolma apply
    * language-specific stopword lists and thresholds; word-shape rules
    * are disabled for unsegmented scripts): `stopwords` is the
    * language's own list, `minStopwords = 0` disables the floor (the
    * right configuration for a language with no curated list — the
    * rule must not silently demand ENGLISH stopwords of it), and the
    * mean-word-length / alpha bounds can be opened up for scripts
    * where whitespace "words" are not linguistic words (CJK). */
  final case class LangRules(
      stopwords: Seq[String], minStopwords: Int,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8)

  def gopher(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame =
    gopherFrame(docs, idCol, textCol, Nil,
      array(GopherStopwords.map(lit): _*),
      lit(minWords), lit(maxWords), lit(minMeanLen), lit(maxMeanLen),
      lit(maxSymbolRatio), lit(minAlphaFrac), lit(minStopwords))

  /**
   * [[gopher]] with PER-LANGUAGE rule tables — the post-routing half
   * of a multilingual pipeline: each document is judged by ITS routed
   * language's configuration from `rules` (falling back to `default`
   * for unconfigured languages), so an English stopword floor never
   * drops a French document for lacking 'the', and a language with no
   * curated table gets the structural rules only.
   *
   * Scale shape unchanged from [[gopher]]: the |rules|-entry tables
   * enter the plan as a literal CASE chain over `langCol`, so this is
   * still ONE map-only projection — no join, no broadcast, no shuffle.
   */
  def gopherByLang(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      rules: Map[String, LangRules], default: LangRules): DataFrame = {
    def pick(f: LangRules => Column): Column =
      rules.toSeq.sortBy(_._1).foldLeft(f(default)) {
        case (acc, (lang, r)) => when(col(langCol) === lang, f(r)).otherwise(acc)
      }
    // an empty list must still be a STRING array (bare array() types
    // as array<null> and fails array_intersect's type check)
    def arrOf(ws: Seq[String]): Column =
      if (ws.isEmpty) typedlit(Seq.empty[String]) else array(ws.map(lit): _*)
    gopherFrame(docs, idCol, textCol, Seq(col(langCol)),
      pick(r => arrOf(r.stopwords)),
      pick(r => lit(r.minWords)), pick(r => lit(r.maxWords)),
      pick(r => lit(r.minMeanLen)), pick(r => lit(r.maxMeanLen)),
      pick(r => lit(r.maxSymbolRatio)), pick(r => lit(r.minAlphaFrac)),
      pick(r => lit(r.minStopwords)))
  }

  /** The shared measure+rule projection: thresholds arrive as COLUMNS
    * so the per-language form can key them on the routed language
    * while the scalar form passes literals. */
  private def gopherFrame(
      docs: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[Column], stopwordsArr: Column,
      minWords: Column, maxWords: Column,
      minMeanLen: Column, maxMeanLen: Column,
      maxSymbolRatio: Column, minAlphaFrac: Column,
      minStopwords: Column): DataFrame = {
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
      stopwordsArr)).cast("long")
    docs.select(
        (col(idCol) +: passthrough) ++ Seq(
          nWords.as("n_words"), meanLen.as("mean_word_len"),
          symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
          nStop.as("n_stopwords"),
          (nWords >= minWords && nWords <= maxWords).as("pass_words"),
          (meanLen >= minMeanLen && meanLen <= maxMeanLen).as("pass_mean_len"),
          (symbolRatio <= maxSymbolRatio).as("pass_symbols"),
          (alphaFrac >= minAlphaFrac).as("pass_alpha"),
          (nStop >= minStopwords).as("pass_stopwords")): _*)
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
  /** The default (Latin-script) line-terminal character set — C4's
    * rule (Raffel et al. 2020 §2.2). */
  val LatinTerminals: Seq[String] = Seq(".", "!", "?", "\"", "”")

  /** One language's line-rule configuration — the line-level twin of
    * [[LangRules]]: the TERMINAL-PUNCTUATION set is script-specific
    * (CJK full-width 。！？ vs the Latin set), and each threshold can
    * be opened per language. */
  final case class LineLangRules(
      terminalChars: Seq[String] = LatinTerminals,
      minTerminalFrac: Double = 0.5,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      maxDupFrac: Double = 0.3)

  def lineRules(
      docs: DataFrame, idCol: String, textCol: String,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      minTerminalFrac: Double = 0.5, maxDupFrac: Double = 0.3): DataFrame =
    lineRulesFrame(docs, idCol, textCol, Nil,
      array(LatinTerminals.map(lit): _*),
      lit(maxBulletFrac), lit(maxEllipsisFrac), lit(minTerminalFrac),
      lit(maxDupFrac))

  /** [[lineRules]] with PER-LANGUAGE tables — each document judged by
    * ITS language's terminal set and thresholds (a CJK document's
    * lines end in 。！？, which the Latin set would score as
    * unterminated boilerplate). Same map-only literal-CASE dispatch
    * as [[gopherByLang]]: no join, no shuffle. */
  def lineRulesByLang(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      rules: Map[String, LineLangRules], default: LineLangRules): DataFrame = {
    def pick(f: LineLangRules => Column): Column =
      rules.toSeq.sortBy(_._1).foldLeft(f(default)) {
        case (acc, (lang, r)) => when(col(langCol) === lang, f(r)).otherwise(acc)
      }
    def arrOf(cs: Seq[String]): Column =
      if (cs.isEmpty) typedlit(Seq.empty[String]) else array(cs.map(lit): _*)
    lineRulesFrame(docs, idCol, textCol, Seq(col(langCol)),
      pick(r => arrOf(r.terminalChars)),
      pick(r => lit(r.maxBulletFrac)), pick(r => lit(r.maxEllipsisFrac)),
      pick(r => lit(r.minTerminalFrac)), pick(r => lit(r.maxDupFrac)))
  }

  /** Shared measure+rule projection of the line rules — thresholds
    * and the terminal set arrive as COLUMNS (see [[gopherFrame]]). */
  private def lineRulesFrame(
      docs: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[Column], terminalArr: Column,
      maxBulletFrac: Column, maxEllipsisFrac: Column,
      minTerminalFrac: Column, maxDupFrac: Column): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)), l => length(l) > 0)
    val n = size(lines).cast("long")
    def frac(pred: Column => Column): Column =
      round(when(n > 0, size(filter(lines, pred)).cast("double") / n)
        .otherwise(0.0), 6)
    val bulletFrac = frac(l => substring(l, 1, 2).isin("- ", "* ", "• "))
    val ellipsisFrac = frac(l => l.endsWith("...") || l.endsWith("…"))
    val terminalFrac = frac(l => array_contains(terminalArr, substring(l, -1, 1)))
    val dupFrac = round(
      when(n > 0,
        (n - size(array_distinct(lines))).cast("double") / n).otherwise(0.0), 6)
    docs.select(
        (col(idCol) +: passthrough) ++ Seq(
          n.as("n_lines"), bulletFrac.as("bullet_frac"),
          ellipsisFrac.as("ellipsis_frac"), terminalFrac.as("terminal_frac"),
          dupFrac.as("dup_line_frac"),
          (bulletFrac <= maxBulletFrac).as("pass_bullets"),
          (ellipsisFrac <= maxEllipsisFrac).as("pass_ellipsis"),
          (terminalFrac >= minTerminalFrac).as("pass_terminal"),
          (dupFrac <= maxDupFrac).as("pass_dup_lines")): _*)
      .withColumn("pass",
        col("pass_bullets") && col("pass_ellipsis") &&
          col("pass_terminal") && col("pass_dup_lines"))
  }
}
