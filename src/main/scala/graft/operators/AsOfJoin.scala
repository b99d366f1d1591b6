package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (backward) join: for every left row, attach the payload of the
 * latest right row with the same key and `rightTs <= leftTs`
 * (inclusive), optionally within a tolerance window.
 *
 * Spark has no built-in as-of join; the classic formulations are a
 * range join (quadratic blow-up) or per-key `flatMapGroups`. This
 * implementation uses the union+window trick instead: tag both inputs,
 * union them, and carry the right payload forward with
 * `last(_, ignoreNulls) OVER (PARTITION BY key ORDER BY ts)` — ONE
 * sort-shuffle on the key, no pair explosion, fully codegen'd. That is
 * the plan that survives 100 TB on either side.
 *
 * The whole matched right row travels as ONE struct through the
 * window, so a NULL in one payload column can never mix values from
 * different right rows (pandas `merge_asof` semantics: the matched row
 * is attached atomically, nulls included).
 *
 * If several right rows share the same `(key, rightTs)`, the one
 * sorting last by the remaining payload order wins — callers who need
 * a specific winner should dedup the right side first (see the
 * `asof01` query for the pattern).
 */
object AsOfJoin {

  /**
   * @param left      probe side; all its columns are kept
   * @param right     reference side; only `key`, `rightTs`, `payload` used
   * @param key       equi-key column name present on both sides
   * @param leftTs    event-time (TimestampType) column on `left`
   * @param rightTs   event-time (TimestampType) column on `right`
   * @param payload   right columns to attach (must not collide with left)
   * @param toleranceSeconds  max allowed `leftTs - rightTs`; None = unbounded.
   *                          Compared in exact integer microseconds.
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__us", unix_micros(col(leftTs)))
      .withColumn("__side", lit(1))
    // the entire right row rides in one struct => atomic attachment
    val r = right
      .select(col(key), unix_micros(col(rightTs)).as("__us"),
        struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__pay"))
      .withColumn("__side", lit(0))

    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal ts => "<=" (inclusive) match
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__us"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned
      .withColumn("__m", last(when(col("__side") === 0, col("__pay")), ignoreNulls = true).over(w))

    val inTol: Column = toleranceSeconds match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        col("__m").isNotNull &&
          col("__us") - unix_micros(col("__m.__rts")) <= tol * 1000000L
    }

    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => when(inTol, col(s"__m.$p")).otherwise(lit(null)).as(p)) :+
        when(inTol, col("__m.__rts")).otherwise(lit(null)).as("matched_ts")): _*)
  }
}
