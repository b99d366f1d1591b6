package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Random samplers
 * (`df.sample`, `sampleBy`) are seed- and partitioning-dependent —
 * rerunning a 100 TB job must not produce a different training set, so
 * these operators order by a content hash instead: the "random" order
 * is a pure function of the data, reproducible across runs, engines
 * and cluster sizes.
 */
object Sampling {

  /** md5-of-id sort key: uniform, engine-portable (hex md5 compares
    * identically everywhere), and stable under repartitioning. */
  private def hashKey(idCol: Column): Column = md5(idCol.cast("string"))

  /**
   * Keep at most `k` rows per stratum, chosen by hash order of
   * `idCol` — i.e. a uniform-at-random-looking but fully deterministic
   * per-group downsample. One window sort-shuffle on the strata keys;
   * bounded output per group regardless of skew.
   */
  def deterministicPerStratum(
      df: DataFrame, strataCols: Seq[String], k: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Deterministic rate-based sample: keep a row iff the first 8 hex
   * digits of md5(id) fall under `rate` — the classic hash-mod gate.
   * No shuffle at all (pure filter, pushes into the scan stage), and
   * the SAME rows survive at any scale or partitioning.
   */
  def deterministicByRate(df: DataFrame, rate: Double, idCol: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val bucket = graft.functions.ScalarFunctions.md5Bucket32(col(idCol))
    df.filter(bucket < (rate * (1L << 32)).toLong)
  }

  /** Cumulative 32-bit thresholds for [[assignSplit]] — exposed so the
    * SQL oracle can inline the identical integer literals. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    splits.inits.toSeq.reverse.tail // running prefixes, shortest first
      .zip(splits)
      .map { case (prefix, (name, _)) =>
        name -> (prefix.map(_._2).sum * (1L << 32)).toLong
      }
  }

  /**
   * Deterministic train/val/test assignment: the 32-bit md5 bucket of
   * the id lands in cumulative-fraction ranges. Pure projection —
   * no shuffle, no RNG — so the SAME document lands in the SAME split
   * on every run, cluster size, and engine (the property that keeps
   * eval sets leak-free across pipeline reruns).
   */
  def assignSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    val thresholds = splitThresholds(splits)
    val bucket = graft.functions.ScalarFunctions.md5Bucket32(col(idCol))
    val assigned = thresholds.init.foldRight(lit(thresholds.last._1)) {
      case ((name, upper), rest) => when(bucket < upper, name).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }
}
