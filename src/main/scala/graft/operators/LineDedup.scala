package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-level exact deduplication — the CCNet/RefinedWeb boilerplate
 * scrub (public method: Wenzek et al. 2020 §3.1, Penedo et al. 2023):
 * a line that repeats across many documents ("subscribe to our
 * newsletter", cookie banners, nav menus) is template noise, not
 * content. Documents are split into lines, each line's document
 * frequency is counted corpus-wide, lines above the cap are dropped,
 * and the surviving lines are reassembled in their original order.
 *
 * Scale shape: three linear shuffles and nothing else — explode to
 * (doc, pos, line), one hash-aggregate keyed by the line's md5 (the
 * 16-byte key bounds the exchange regardless of line length), one
 * semi-join back on that key, one groupBy(doc) to reassemble. No
 * window, no driver collection; a hot boilerplate line concentrates
 * into a single count cell, not a skewed join (the semi-join's build
 * side is the KEPT keys, which the cap itself bounds per key).
 */
object LineDedup {

  /**
   * Drop lines whose trimmed text appears in more than `maxLineDf`
   * distinct documents; reassemble the rest. Returns
   * (idCol, clean_text, n_lines, n_kept) — `clean_text` is '' when
   * every line was boilerplate (the document row is never lost).
   *
   * A line repeated WITHIN one document counts once toward its
   * document frequency (it is the cross-document repetition that
   * marks boilerplate), and every copy shares the keep/drop verdict.
   */
  def dropCommonLines(
      docs: DataFrame, idCol: String, textCol: String,
      maxLineDf: Int): DataFrame = {
    require(maxLineDf >= 1, "maxLineDf must be >= 1")
    val lines = docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("__k", md5(trim(col("line"))))
    // document frequency per distinct line; the per-doc distinct is
    // map-side (id, key) dedup before the count — no count-distinct
    // rewrite with its double exchange
    val kept = lines.select("id", "__k").distinct()
      .groupBy("__k").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxLineDf)
      .select("__k")
    val surviving = lines.join(kept, Seq("__k"), "left_semi")
    val reassembled = surviving
      .groupBy("id")
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs
      .select(col(idCol).as("id"),
        (size(split(col(textCol), "\n", -1))).cast("long").as("n_lines"))
      .join(reassembled, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
