package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered engine query: a Spark plan over the harness tables
 * plus (when SQL-expressible) the equivalent DuckDB oracle SQL the
 * driver checks it against (see repo SparkEntry contract).
 *
 * Conventions that make the hash-compare deterministic:
 *  - every query ends in an `orderBy` on a unique key combination;
 *  - no raw timestamp columns in output — epoch longs (`ts_ns`,
 *    `epoch_us`) instead;
 *  - money/metric doubles leave as exact integer cents
 *    (`round(x*100) :: long`) or rounded doubles whose inputs are
 *    exact (integer ratios, single multiplications);
 *  - aggregate outputs are LongType/`CAST(... AS BIGINT)` on both
 *    sides (DuckDB's SUM(BIGINT) is HUGEINT otherwise).
 */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible operator: driver records rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Load oracle SQL from a classpath resource (pinned-fixture oracles
    * too large to inline as source literals). */
  def resourceSql(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing oracle resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
}
