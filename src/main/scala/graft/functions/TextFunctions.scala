package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis columns for large-scale training-data pipelines:
 * tokenization, quality scoring, language ID, fingerprinting,
 * shingling. All pure `functions._` compositions (codegen'd,
 * no UDF serialization) so a 100 TB scan stays in Tungsten.
 *
 * Regex patterns are deliberately written in the common subset of
 * Java regex and RE2 (no lookaround, no backrefs) so the DuckDB
 * oracle evaluates them identically.
 */
object TextFunctions {

  /** Whitespace tokens of the lowercased text. Empty text → empty
    * array (Spark's split("") yields [""], which we filter). */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count — cheap, no array materialization. */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** BPE-ish subword count: alphabetic runs, digit runs, and single
    * non-alnum marks each count as one token. */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Share of non-alphanumeric, non-space chars. */
  def punctRatio(c: Column): Column =
    ScalarFunctions.safeDiv(
      regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double"),
      length(c).cast("double"))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

  /** Share of tokens that are English stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(stopwords.map(lit): _*))
    ScalarFunctions.safeDiv(size(stops).cast("double"), size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    ScalarFunctions.safeDiv(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double"),
      size(toks).cast("double"))
  }

  /**
   * Composite document-quality score in [0,1]: rewards reasonable
   * length and stopword density, penalizes punctuation noise. The
   * exact weights are a policy choice; what matters for the engine is
   * that it is one codegen'd pass over the text.
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / lit(50.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio(c)) +
      lit(0.3) * least(stopwordRatio(c) * lit(4.0), lit(1.0))
  }

  /** Language marker words per language for the n-gram-heuristic
    * language ID. Deterministic and tiny — broadcast as literals. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "los", "que", "de"))

  /** Marker-word count for one language. */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val toks = tokens(c)
    size(filter(toks, t => t.isin(markers.map(lit): _*)))
  }

  /** Heuristic language ID: argmax of marker-word counts, ties broken
    * by the [[langMarkers]] declaration order, "und" (undetermined)
    * when nothing matches. */
  def langId(c: Column): Column = {
    val scored = langMarkers.map { case (lang, ms) => (lang, langScore(c, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s === best && s > 0, lit(lang)).otherwise(rest)
    }
  }

  /** Canonical text for near-dup comparison: lowercase, collapse
    * whitespace, strip punctuation. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), "\\s+", " "))

  /** 16-hex document fingerprint over the canonical text (the
    * content-hash analogue of the reference's salted-id scheme,
    * `scripts/hash_player_ids.py`). */
  def fingerprint(c: Column): Column =
    substring(md5(canonicalText(c)), 1, 16)

  /**
   * Word n-gram shingles from an already-materialized token-ARRAY
   * column. `toks` MUST be a plain column reference (attribute), not
   * an expression: it is captured inside the `transform` lambda, and
   * Catalyst re-evaluates captured subtrees once PER ELEMENT — an
   * inlined tokenizer chain here costs O(#tokens) full-text regex
   * passes per document (measured 26× slowdown on the dedup bench).
   * Callers materialize tokens behind a projection boundary first
   * (see [[graft.operators.Dedup.shingled]]).
   */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())

  /** Word n-gram shingles of the canonical text, as an array of
    * space-joined strings. Fewer than n tokens → empty array.
    * WARNING: inlines the tokenizer into the lambda (see
    * [[shinglesFromTokens]]) — fine for single-row/test use, use the
    * two-step form in scans. */
  def shingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(canonicalText(c)), n)

  /**
   * Largest multiplicity of any single element = max run length in
   * the sorted array — one `aggregate` fold over `array_sort`,
   * O(L log L) per row, map-only (the Gopher-style repetition signals
   * need no explode/groupBy shuffle; a 100 TB corpus passes through
   * as one projection). Empty array → 0.
   */
  def maxMultiplicity(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))

  /** Max over distinct elements of multiplicity × element length —
    * "characters covered by the most repeated n-gram" (the Gopher
    * top-n-gram character-fraction numerator), tie-free because the
    * max is over the product, not an argmax. Same sorted-run fold as
    * [[maxMultiplicity]]. */
  def maxRunCharCoverage(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (s, x) => {
        val run = when(x === s.getField("prev"), s.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run * length(x)).as("best"))
      },
      s => s.getField("best"))

  /** Type-token ratio: distinct / total tokens (0 for empty). */
  def typeTokenRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))

  /**
   * Fixed-size token chunks with overlap — context-window preparation:
   * chunk i covers tokens [i·stride, i·stride + chunkSize). The last
   * chunk may be short; a document shorter than one chunk yields one
   * chunk; an empty document yields none. Returns an array of
   * space-rejoined chunk strings (explode downstream). `toks` must be
   * an attribute (see [[shinglesFromTokens]] — captured columns
   * re-evaluate per element).
   */
  def chunkTokens(toks: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    // number of chunks: 1 + ceil(max(0, n - chunkSize) / stride)
    val n = size(toks)
    val nChunks = lit(1) + ceil(greatest(n - chunkSize, lit(0)).cast("double") / stride).cast("int")
    when(n === 0, array())
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize)))))
  }

  /**
   * MinHash signature: for seed i, min over shingles of the universal
   * hash (aᵢ·h+bᵢ) mod 2³¹−1 of the shingle's 31-bit base hash
   * ([[PortableHash.minhashParams]]; same family as
   * [[graft.operators.Dedup.minhashSignaturesFromShingles]]).
   * 31-bit operands keep the multiply overflow-free in both Spark
   * and the DuckDB oracle.
   *
   * NOT the production-scale path: the `bases` transform is textually
   * duplicated into each of the numHashes array entries, and
   * higher-order-function lambdas are neither codegen'd nor
   * CSE'd — md5 still evaluates per shingle PER SEED here. The
   * hash-each-shingle-once win only holds for the row form
   * ([[graft.operators.Dedup.minhashSignaturesFromShingles]], where
   * the base hash is a materialized attribute); use this array form
   * for single-row/test convenience only.
   */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column = {
    import PortableHash.{MinhashP, minhashParams}
    val params = minhashParams(numHashes)
    val bases = transform(shingleArr,
      s => ScalarFunctions.md5Long(s).bitwiseAND(lit(MinhashP)))
    array(params.map { case (a, b) =>
      array_min(transform(bases, h => (h * a + b) % MinhashP))
    }: _*)
  }

  /** HTML → text extraction (the web-crawl front door of a training
    * pipeline): drop script/style/comment blocks, strip tags, decode
    * the common named entities, collapse whitespace. Map-only codegen
    * regex chain. Patterns are RE2-safe (no backreferences — script
    * and style close-tags are matched by SEPARATE patterns), so the
    * DuckDB oracle replays the identical chain. `&amp;` decodes LAST
    * so `&amp;lt;` yields the literal `&lt;`, not `<`. */
  def htmlToText(c: Column): Column = {
    val noBlocks = Seq(
      "(?is)<script\\b[^>]*>.*?</script\\s*>",
      "(?is)<style\\b[^>]*>.*?</style\\s*>",
      "(?s)<!--.*?-->").foldLeft(c)((acc, p) => regexp_replace(acc, p, " "))
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
