package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Character-n-gram language identification, Cavnar & Trenkle 1994
 * ("N-Gram-Based Text Categorization") profile style — the REAL
 * upgrade over the marker-word heuristic ([[graft.functions
 * .TextFunctions.langId]]): per-language profiles are the top-K char
 * n-grams by frequency, and a document scores against each profile
 * by summed gram ranks (absent gram → K+1 penalty); lowest total
 * wins. The simplified "every occurrence scores" variant keeps the
 * whole classifier integer-exact (oracle-replayable) and the scoring
 * MAP-ONLY.
 *
 * Scale shape: training is one explode + hash aggregation over the
 * labeled corpus, cut to |langs|·K rows by a per-language window on
 * the (lang, gram) count table (language-count-sized, not
 * corpus-sized); the profiles then ship as LITERAL maps, so
 * classification is a per-row fold with no join and no shuffle at
 * any corpus size.
 */
object LangId {

  /** Canonical text for gram extraction: lowercase, whitespace
    * collapsed to single spaces, trimmed. */
  def canonical(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** All char n-gram OCCURRENCES of the canonical text, in order;
    * texts shorter than n yield none. */
  def charNgrams(c: Column, n: Int): Column = {
    val s = canonical(c)
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-language rank profiles: top-`topK` grams by count (ties by
    * gram ascending), rank 1-based. Collected driver-side —
    * |langs|·topK rows, an O(1) model like the IVF centroid tables. */
  def trainProfiles(
      docs: DataFrame, langCol: String, textCol: String,
      n: Int = 3, topK: Int = 40): Map[String, Map[String, Int]] = {
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("gr"))
    docs
      .select(col(langCol).as("lang"), explode(charNgrams(col(textCol), n)).as("gr"))
      .groupBy("lang", "gr").agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("lang", "gr", "rank").collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.map(r => r.getString(1) -> r.getInt(2)).toMap
      }
  }

  /** (id, pred_lang, dist): argmin of summed profile ranks over the
    * doc's gram occurrences (absent → topK+1), ties by language
    * ascending; gramless docs predict "" with dist 0. Map-only: the
    * profiles are literal maps, the argmin a struct array-min. */
  def classify(
      docs: DataFrame, idCol: String, textCol: String,
      profiles: Map[String, Map[String, Int]],
      n: Int = 3, topK: Int = 40): DataFrame = {
    require(profiles.nonEmpty, "no language profiles")
    val grams = charNgrams(col(textCol), n)
    val entries = profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      val m = typedlit(prof)
      val dist = aggregate(grams, lit(0L),
        (acc, g) => acc + coalesce(element_at(m, g).cast("long"), lit((topK + 1).toLong)))
      struct(dist.as("dist"), lit(lang).as("lang"))
    }
    val best = array_min(array(entries: _*))
    docs.select(
      col(idCol),
      when(size(grams) === 0, lit("")).otherwise(best.getField("lang")).as("pred_lang"),
      when(size(grams) === 0, lit(0L)).otherwise(best.getField("dist")).as("dist"))
  }

  /** Train on the labeled corpus, classify every row. */
  def trainAndClassify(
      docs: DataFrame, idCol: String, langCol: String, textCol: String,
      n: Int = 3, topK: Int = 40): DataFrame =
    classify(docs, idCol, textCol, trainProfiles(docs, langCol, textCol, n, topK), n, topK)
}
