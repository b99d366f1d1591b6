package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. AQE's skew-join handles most
 * cases at runtime; explicit salting remains the tool when one side's
 * hot keys are known to dwarf a task (the 100 TB failure mode: one
 * reducer owning a billion-row key).
 *
 * Construction: the LEFT (large, skewed) side gets a deterministic
 * salt in [0, saltFactor) — derived from stable row content, so
 * retries produce identical assignments — while the RIGHT side is
 * replicated saltFactor× with every salt value. The join key becomes
 * (key, salt): the hot key's rows spread over saltFactor reducers.
 * Cost: right side shuffles saltFactor× its size — use for
 * moderate-sized right sides or pre-filtered hot keys.
 */
object SkewJoin {

  /**
   * @param saltCols stable left-side columns the salt is derived from
   *                 (a unique id is ideal; must not be the join key
   *                 alone or the salt would not spread it)
   */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, saltCols: Seq[String]): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("__salt",
      pmod(hash(saltCols.map(col): _*), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
