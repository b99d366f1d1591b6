package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the deequ/dbt-tests-style
 * validation pass every production ingest runs before publishing
 * (public pattern: AWS Deequ, Great Expectations): a rule set is
 * evaluated into a per-rule violation report in as few passes as the
 * rule types permit.
 *
 * Scale shape: every ROW-WISE rule (not-null, range, regex) becomes
 * one conditional-sum column of a SINGLE aggregate over one corpus
 * scan — adding rules adds projection columns, not passes. Each
 * UNIQUE rule needs its own grouped pass by nature (duplicate
 * detection is an aggregation over its key set); its exchange carries
 * one count per distinct key, map-side combined. The report itself is
 * rule-count-sized.
 */
object Expectations {

  sealed trait Rule {
    /** Stable report key, e.g. `not_null(user_id)`. */
    def label: String
  }
  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def label = s"not_null($col)"
  }
  /** Numeric column must lie in [lo, hi]; NULLs do not violate (pair
    * with [[NotNull]] to require presence). A string-typed column is
    * `try_cast` to double — a NON-NUMERIC value COUNTS AS A VIOLATION
    * (it is certainly not in range) rather than throwing under ANSI
    * mode: a validation pass must survive the malformed data it
    * exists to report. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def label = s"in_range($col,$lo,$hi)"
  }
  /** String column must fully match the regex; NULLs do not violate. */
  final case class Matches(col: String, regex: String) extends Rule {
    def label = s"matches($col)"
  }
  /** Key columns must identify rows uniquely; the violation count is
    * the number of EXCESS rows (rows beyond the first per key). */
  final case class Unique(cols: Seq[String]) extends Rule {
    def label = s"unique(${cols.mkString(",")})"
  }

  private def violation(r: Rule): Column = r match {
    case NotNull(c) => when(col(c).isNull, 1L).otherwise(0L)
    case InRange(c, lo, hi) =>
      // try_cast: a non-numeric string yields NULL (never an ANSI
      // throw); with the source non-NULL that NULL means "unparseable"
      // → violation
      val d = col(c).try_cast(org.apache.spark.sql.types.DoubleType)
      when(col(c).isNotNull && (d.isNull || d < lo || d > hi), 1L).otherwise(0L)
    case Matches(c, re) =>
      when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L)
    case _: Unique =>
      throw new IllegalStateException("Unique is not row-wise")
  }

  /**
   * Evaluate `rules` into `(rule, violations, total, pass)` — one
   * report row per rule, ordered by rule label. One corpus aggregate
   * covers all row-wise rules; each Unique rule adds one grouped
   * pass.
   */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val rowWise = rules.collect { case r @ (_: NotNull | _: InRange | _: Matches) => r }
    val uniques = rules.collect { case u: Unique => u }

    val parts = Seq.newBuilder[DataFrame]
    if (rowWise.nonEmpty) {
      // single pass: total + one conditional sum per rule, then the
      // 1×(n+1) result UNPIVOTS into report rows (row-count bounded
      // by the rule count — never the corpus)
      val aggs = count(lit(1)).as("__total") +:
        rowWise.zipWithIndex.map { case (r, i) => sum(violation(r)).as(s"__v$i") }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      parts += wide.unpivot(
          Array(col("__total")),
          rowWise.indices.map(i => col(s"__v$i")).toArray,
          "__rule", "violations")
        .select(
          element_at(typedlit(rowWise.map(_.label)),
            (regexp_extract(col("__rule"), "__v(\\d+)", 1).cast("int") + 1))
            .as("rule"),
          col("violations"),
          col("__total").as("total"))
    }
    uniques.foreach { u =>
      val dup = df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("__n")), lit(0L)).as("total"))
      parts += dup.select(lit(u.label).as("rule"), col("violations"), col("total"))
    }
    parts.result().reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }

  /**
   * ENFORCEMENT — the routing half of the validation story (the deequ
   * "checks that gate a publish"): split `df` into (clean,
   * quarantined) under the same rules. Row-wise rules evaluate inline
   * — ONE projection, no shuffle, each rule one conditional array
   * element. Each [[Unique]] rule adds one window pass over its key
   * (the same one-exchange cost its [[report]] pass pays) and
   * quarantines EVERY member of a duplicated key group: the report
   * counts EXCESS rows, but routing has no principled survivor
   * without a caller-supplied order, so all copies are suspect —
   * the deliberate, documented asymmetry between counting and
   * routing.
   *
   * Clean rows return with the original schema; quarantined rows
   * carry `failed_rules` (sorted array of rule labels) so the
   * quarantine table is self-describing.
   */
  def enforce(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "need at least one rule")
    import org.apache.spark.sql.expressions.Window
    val rowWise = rules.collect { case r @ (_: NotNull | _: InRange | _: Matches) => r }
    val uniques = rules.collect { case u: Unique => u }
    val rwFailed: Column =
      if (rowWise.isEmpty) array().cast("array<string>")
      else filter(
        array(rowWise.map(r => when(violation(r) === 1L, lit(r.label))): _*),
        x => x.isNotNull)
    val tagged = uniques.foldLeft(df.withColumn("__failed", rwFailed)) { (d, u) =>
      val w = Window.partitionBy(u.cols.map(col): _*)
      d.withColumn("__failed",
        when(count(lit(1)).over(w) > 1,
          concat(col("__failed"), array(lit(u.label))))
          .otherwise(col("__failed")))
    }.withColumn("failed_rules", array_sort(col("__failed"))).drop("__failed")
    (tagged.filter(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.filter(size(col("failed_rules")) > 0))
  }
}
