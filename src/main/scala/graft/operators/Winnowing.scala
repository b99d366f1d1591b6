package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints — Schleimer, Wilkerson & Aiken,
 * "Winnowing: Local Algorithms for Document Fingerprinting"
 * (SIGMOD 2003, public method; the MOSS selection scheme). From every
 * window of `w` consecutive k-gram hashes, select the minimum hash —
 * breaking ties by the RIGHTMOST position — and fingerprint the
 * document with the distinct selected (position, hash) pairs. The
 * paper guarantees any shared substring of length ≥ w + k − 1 yields
 * at least one shared fingerprint, with expected density 2/(w+1).
 *
 * Reference context: the reference engine fingerprints documents with
 * a single whole-text hash (see `scripts/hash_player_ids.py` /
 * SURVEY §2.8); winnowing is the positional generalization a
 * training-data pipeline needs for partial-overlap detection, kept
 * exactly replayable in SQL.
 *
 * The rightmost-min selection is folded into ONE orderable key:
 * `h ‖ zeropad(10^9 − pos)` — lexicographic min over the window frame
 * is simultaneously (min h, max pos), so a plain `min(...)` window
 * aggregate does the whole selection with no argmin gymnastics and no
 * second pass. Both halves decode back out of the winning key.
 *
 * Scale shape: one positional explode (|tokens| rows — the shingle
 * cost every dedup operator here already pays), ONE (id, pos)
 * sort-shuffle carrying both window aggregates (the frame min and the
 * per-document gram count), then a per-document hash aggregate.
 * Window partitions are bounded by document length, never corpus
 * size; nothing is collected to the driver.
 */
object Winnowing {

  /** pos is packed as (PosPack − pos) so bigger positions sort
    * SMALLER inside the key; 10 digits covers any in-document
    * position. */
  private val PosPack = 1000000000L

  /**
   * Distinct winnowing fingerprints per document:
   * `(id, fp_pos, fp_hash)` with `fp_pos` the 0-based k-gram position
   * and `fp_hash` the 32-hex md5 of the k-gram. Documents shorter
   * than k tokens emit nothing; documents with fewer than w k-grams
   * emit the single whole-sequence minimum (the paper's degenerate
   * window).
   */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame =
    selected(docs, idCol, textCol, k, w)
      .select(col("id").as(idCol), col("fp_pos"), col("fp_hash")).distinct()

  /** Shared selection pipeline: per-(id, fp_pos, fp_hash) rows BEFORE
    * the distinct, with `__m` (the document's gram count) carried
    * alongside so [[summary]] needs no second corpus scan. */
  private def selected(
      docs: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame = {
    require(k >= 2, "k-gram order must be >= 2")
    require(w >= 1, "winnowing window must be >= 1")
    val grams = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(TextFunctions.canonicalText(col(textCol))).as("__toks"))
      .select(col("id"),
        posexplode(TextFunctions.shinglesFromTokens(col("__toks"), k)).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), md5(col("g")).as("h"))
    // rightmost-min key: lexicographic min = (min h, then max pos)
    val keyed = grams.withColumn("__key",
      concat(col("h"), lpad((lit(PosPack) - col("pos")).cast("string"), 10, "0")))
    val byPos = Window.partitionBy("id").orderBy("pos")
    keyed
      .withColumn("__wkey", min(col("__key")).over(byPos.rowsBetween(0, w - 1)))
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy("id").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // valid window starts: pos ≤ m − w; a short document (m < w)
      // keeps only pos = 0, whose frame truncates to the whole
      // sequence — exactly the degenerate single window.
      .filter(col("pos") <= greatest(col("__m") - w, lit(0)))
      .select(col("id"), col("__m"),
        (lit(PosPack) - substring(col("__wkey"), 33, 10).cast("long")).as("fp_pos"),
        substring(col("__wkey"), 1, 32).as("fp_hash"))
  }

  /**
   * Per-document fingerprint summary: gram count, fingerprint count,
   * selection density (≈ 2/(w+1) on random text), and a single
   * order-sensitive digest (md5 of the position-ordered hash
   * concatenation) — the value two corpora compare to find shared
   * regions without shipping the full fingerprint sets.
   */
  def summary(
      docs: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame =
    // __m is constant per document, so folding it into the distinct
    // key changes nothing — and saves the second corpus scan + join a
    // separate gram count would cost. The distinct and the final
    // aggregate share the selection pipeline's hashpartitioning(id).
    selected(docs, idCol, textCol, k, w)
      .select("id", "__m", "fp_pos", "fp_hash").distinct()
      .groupBy("id")
      .agg(
        max(col("__m")).cast("long").as("n_grams"),
        count(lit(1)).as("n_fps"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("fp_pos"), col("fp_hash")))),
          s => s("fp_hash")), " ")).as("digest"))
      .select(col("id").as(idCol), col("n_grams"), col("n_fps"),
        round(col("n_fps").cast("double") / col("n_grams"), 6).as("density"),
        col("digest"))
}
