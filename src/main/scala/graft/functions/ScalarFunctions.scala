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
}
