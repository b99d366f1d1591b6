package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar column helpers — the port of the reference's small pure-Python
 * function zoo (SURVEY §2.8). Everything here composes Spark built-ins,
 * so it stays inside whole-stage codegen; no UDFs on the hot path.
 */
object ScalarFunctions {

  /** `n/d` guarded against zero/null denominators, the reference's
    * ubiquitous `np.where(d != 0, n / d, 0)` (e.g. reference
    * `processors/get_er_matrix.py:26-27`). */
  def safeDiv(n: Column, d: Column, default: Column = lit(0.0)): Column =
    when(d.isNotNull && d =!= 0, n / d).otherwise(default)

  /** Clamp into [lo, hi] — pandas `Series.clip` (reference
    * `processors/sos_utils.py:86-91`). */
  def clip(c: Column, lo: Column, hi: Column): Column =
    least(greatest(c, lo), hi)

  /** Salted SHA-256 id truncated to 16 hex chars — semantics of the
    * reference's player-id anonymizer
    * (`scripts/hash_player_ids.py:8-41`). */
  def saltedId(c: Column, salt: String): Column =
    substring(sha2(concat_ws(":", lit(salt), c), 256), 1, 16)

  /**
   * Baseball innings-pitched notation → true fraction: "6.2" means
   * 6 innings + 2 outs = 6⅔ (reference
   * `processors/war_calculation/common.py:10-24`). Input is the raw
   * decimal form (6.2), output the arithmetic value (6.6667…).
   */
  def ipToFloat(ip: Column): Column = {
    val whole = floor(ip)
    val thirds = round((ip - whole) * 10) // 0, 1, or 2 outs
    whole + thirds / lit(3.0)
  }

  /** Inverse of [[ipToFloat]]: 6.6667 → 6.2 (reference
    * `processors/war_calculation/common.py:27-36`). */
  def floatToIp(f: Column): Column = {
    val whole = floor(f)
    val thirds = round((f - whole) * 3)
    whole + thirds / lit(10.0)
  }

  /** Lower, trim, collapse runs of whitespace, `&`→`and`, strip
    * punctuation — the reference's team/player name normalizer
    * (`processors/sos_utils.py:5-20`, `names/helpers.py:6-19`). */
  def normName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), "&", " and "),
        "[^a-z0-9 ]", ""),
      "\\s+", " "))

  /** "Last, First" → "First Last" (reference
    * `processors/reconcile_players.py:26-56`). */
  def flipLastFirst(c: Column): Column =
    when(c.contains(","),
      concat_ws(" ",
        trim(element_at(split(c, ",", 2), 2)),
        trim(element_at(split(c, ",", 2), 1))))
      .otherwise(c)

  /** Portable 60-bit hash: first 15 hex chars of md5, parsed base-16.
    * Chosen because it is reproducible bit-for-bit in any engine that
    * has md5 (the DuckDB oracle included) — unlike engine-native
    * `hash()`/`xxhash64` seeds. Used as the base hash for MinHash /
    * LSH (SURVEY-plus dedup operators). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Portable 32-bit md5 bucket in [0, 2³²): the uniform deterministic
    * gate shared by every rate/split sampler
    * ([[graft.operators.Sampling]], [[graft.operators.Mixture]]) —
    * ONE definition so the surviving-row sets can never diverge
    * between sampling and mixing. */
  def md5Bucket32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** The roster-position whitelist of the reference's cube-position
    * cleaner (`scripts/clean_cube_positions.py:20`). */
  val ValidPositions: Seq[String] = Seq(
    "P", "C", "1B", "2B", "3B", "SS", "OF", "IF", "UT", "DH", "LF", "CF", "RF")

  /**
   * Multi-position string cleaner (reference
   * `scripts/clean_cube_positions.py:23-35`): strip "(N)" count
   * suffixes, split on dashes/dots/whitespace, uppercase, keep only
   * whitelisted positions, dedupe preserving first occurrence, join
   * with ", ". Empty/None/"nan"/no-valid-token → null. Quirk
   * preserved: a comma glued to a token ("1B," in "1B, C" split on
   * whitespace) fails the whitelist and drops, exactly as in the
   * reference's `re.split(r"[-.\s]+")`.
   */
  def cleanPositions(c: Column): Column = {
    val s = trim(c.cast("string"))
    val toks = transform(
      split(regexp_replace(s, "\\(\\d+\\)", ""), "[-.\\s]+"),
      t => upper(trim(t)))
    val deduped = array_distinct(filter(toks, t => t.isin(ValidPositions: _*)))
    when(c.isNull || s === "" || s === "nan" || size(deduped) === 0,
      lit(null).cast("string"))
      .otherwise(array_join(deduped, ", "))
  }

  /**
   * Division-format normalizer (reference
   * `scripts/update_division_format.py:10-33`): numeric 1/2/3 (ints
   * or "3.0"-style floats, truncated toward zero) become
   * "ncaa_1"/"ncaa_2"/"ncaa_3"; strings already prefixed "ncaa_" and
   * anything non-numeric pass through; null stays null. Numeric
   * detection is a regex gate (the engine-portable subset of Python's
   * `float()` — no exponents/signs, which never occur in division
   * columns) so the cast can never throw under ANSI mode.
   */
  def normalizeDivision(c: Column): Column = {
    val s = c.cast("string")
    val numeric = s.rlike("^[0-9]+(\\.[0-9]+)?$")
    // string->double only under the regex gate, and the range check
    // stays in DOUBLE (an int/long cast of an oversized numeric like
    // "4294967296" would throw under ANSI; the double compare passes
    // it through instead) — the narrow cast only runs on matched 1/2/3
    val n = when(numeric, floor(s.cast("double")))
    when(c.isNull, lit(null).cast("string"))
      .when(s.startsWith("ncaa_"), s)
      .when(n === 1.0 || n === 2.0 || n === 3.0,
        concat(lit("ncaa_"), n.cast("int").cast("string")))
      .otherwise(s)
  }
}
