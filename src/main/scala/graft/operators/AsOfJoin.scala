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

  /**
   * As-of FORWARD join: for every left row, the EARLIEST right row
   * with the same key and `rightTs >= leftTs` (inclusive), optionally
   * within `toleranceSeconds`. The mirror of [[backward]] with the
   * same union+window plan: left rows tag-sort BEFORE right rows at
   * equal time, so an equal-timestamp right row is inside the
   * current-row-to-following frame — the inclusive match.
   */
  def forward(
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
    val r = right
      .select(col(key), unix_micros(col(rightTs)).as("__us"),
        struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__pay"))
      .withColumn("__side", lit(2))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__us"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__m", first(when(col("__side") === 2, col("__pay")), ignoreNulls = true).over(w))

    val inTol: Column = toleranceSeconds match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        col("__m").isNotNull &&
          unix_micros(col("__m.__rts")) - col("__us") <= tol * 1000000L
    }

    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => when(inTol, col(s"__m.$p")).otherwise(lit(null)).as(p)) :+
        when(inTol, col("__m.__rts")).otherwise(lit(null)).as("matched_ts")): _*)
  }

  /**
   * As-of NEAREST join: the closer of the backward and forward
   * matches, with exact-tie preference to the BACKWARD row (pandas
   * `merge_asof(direction='nearest')` attaches one row atomically the
   * same way). An equal-timestamp right row counts as a backward
   * match at distance zero, which no forward candidate can beat.
   *
   * Still ONE sort-shuffle: both directions ride the same
   * `(ts, side)` ordering as two frames of one window — no second
   * exchange, no join of two as-of results.
   *
   * @param toleranceSeconds symmetric bound: each direction's match
   *                         must be within it before the distance
   *                         comparison.
   */
  def nearest(
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
    val r = right
      .select(col(key), unix_micros(col(rightTs)).as("__us"),
        struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__pay"))
      .withColumn("__side", lit(0))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val ord = Window.partitionBy(col(key)).orderBy(col("__us"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__mb", last(when(col("__side") === 0, col("__pay")), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(when(col("__side") === 0, col("__pay")), ignoreNulls = true).over(wf))

    val bDist = col("__us") - unix_micros(col("__mb.__rts"))
    val fDist = unix_micros(col("__mf.__rts")) - col("__us")
    val (bOk, fOk): (Column, Column) = toleranceSeconds match {
      case None => (col("__mb").isNotNull, col("__mf").isNotNull)
      case Some(tol) =>
        (col("__mb").isNotNull && bDist <= tol * 1000000L,
          col("__mf").isNotNull && fDist <= tol * 1000000L)
    }
    // forward wins only STRICTLY closer — ties go backward
    val chooseF = fOk && (!bOk || fDist < bDist)
    val chosen = when(chooseF, col("__mf")).when(bOk, col("__mb"))

    carried
      .filter(col("__side") === 1)
      .withColumn("__c", chosen)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__c.$p").as(p)) :+
        col("__c.__rts").as("matched_ts")): _*)
  }
}
