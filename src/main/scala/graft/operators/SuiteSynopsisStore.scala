package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.StoreManifest

/**
 * Persisted per-eval-suite decontamination synopses — the INCREMENTAL
 * home of [[Decontaminate.ngramOverlapBySuiteBloom]]'s filters: a
 * production curation run accumulates eval suites over months
 * (hundreds, per the attribution operator's design target), and a new
 * suite's arrival must not rebuild every existing filter. Each suite's
 * Bloom synopsis is built ONCE from its own benchmark slice and
 * persists as one parquet row `(suite, seq, bytes)`; probes read the
 * latest row per suite (re-adding a suite supersedes by `seq`), so
 * steady-state cost of a new suite is one [[Decontaminate
 * .benchGramsBloom]] aggregate over THAT suite plus a numBits/8-byte
 * append — existing suites are never touched.
 *
 * Versioning follows the [[DedupIndex]] store discipline:
 * [[StoreManifest]] pointer-commits publish the `synopses` table
 * version ([[compact]] rewrites superseded rows + small files into a
 * fresh `v<N+1>` atomically), and the FILTER GRID — gram size `n`,
 * estimated items, filter bits — is recorded in the manifest at store
 * creation and REQUIRED to match on every later add (the
 * shingle-unit / store-stride mixed-grid discipline: a suite built on
 * a different gram size would silently never match the probes).
 * Sizings must be powers of two (stored as log2 in the int-valued
 * manifest); that is the natural Bloom sizing and keeps the manifest
 * format shared with the other stores.
 *
 * 100 TB shape: the store holds |suites| × numBits/8 bytes TOTAL — a
 * driver/broadcast-scale artifact by construction, independent of the
 * gram volume the suites accumulate ([[graft.tools.LlmScaleSmoke]]
 * pins the footprint fixed as the corpus grows 10×). [[attribution]]
 * probes every suite in ONE map-only corpus pass through the single
 * broadcast array of [[graft.plans.BloomsHitIndicesExpr]].
 */
object SuiteSynopsisStore {

  private def log2Exact(v: Long, what: String): Int = {
    require(v > 0 && (v & (v - 1)) == 0,
      s"SuiteSynopsisStore: $what must be a power of two, got $v")
    java.lang.Long.numberOfTrailingZeros(v)
  }

  private def requireGrid(
      m: Map[String, Int], n: Int, estimatedGrams: Long, numBits: Long): Unit =
    Seq("gram_n" -> n.toLong, "est_log2" -> log2Exact(estimatedGrams, "estimatedGrams").toLong,
        "bits_log2" -> log2Exact(numBits, "numBits").toLong)
      .foreach { case (k, v) =>
        require(m(k).toLong == v,
          s"SuiteSynopsisStore grid mismatch: store has $k=${m(k)}, caller passed $v")
      }

  /** Add (or REPLACE) one suite's synopsis: builds the filter from
    * `bench`'s text column and appends it under the current table
    * version with the next sequence number — one small parquet file,
    * no rewrite of any other suite. First add creates the store and
    * records the grid. */
  def addSuite(
      path: String, suite: String, bench: DataFrame, benchTextCol: String,
      n: Int, estimatedGrams: Long = 1L << 20, numBits: Long = 1L << 23): Unit = {
    val spark = bench.sparkSession
    import spark.implicits._
    val bytes = Decontaminate.benchGramsBloom(
      bench, benchTextCol, n, estimatedGrams, numBits)
    StoreManifest.read(spark, path) match {
      case None =>
        Seq((suite, 1L, bytes)).toDF("suite", "seq", "bytes")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/synopses/v1")
        StoreManifest.commit(spark, path, Map(
          "synopses" -> 1, "seq" -> 1, "gram_n" -> n,
          "est_log2" -> log2Exact(estimatedGrams, "estimatedGrams"),
          "bits_log2" -> log2Exact(numBits, "numBits")))
      case Some(m) =>
        requireGrid(m, n, estimatedGrams, numBits)
        val seq = m("seq") + 1
        Seq((suite, seq.toLong, bytes)).toDF("suite", "seq", "bytes")
          .coalesce(1).write.mode("append").parquet(s"$path/synopses/v${m("synopses")}")
        StoreManifest.commit(spark, path, m.updated("seq", seq))
    }
  }

  /** The LIVE synopses of one committed snapshot: latest `seq` per
    * suite (a re-added suite supersedes its older rows). The collect
    * is |suites| rows of numBits/8 bytes — the suite-count-bounded
    * driver artifact the store exists to hold. */
  def blooms(spark: SparkSession, path: String): Seq[(String, Array[Byte])] = {
    val m = StoreManifest.current(spark, path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("suite").orderBy(col("seq").desc)
    spark.read.parquet(s"$path/synopses/v${m("synopses")}")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("suite", "bytes")
      .collect().toSeq
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .sortBy(_._1)
  }

  /** Per-(doc, suite) contamination attribution against the persisted
    * pool — [[Decontaminate.ngramOverlapBySuiteBloomAgainst]] with the
    * store's filters and its recorded gram size. */
  def attribution(
      spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val m = StoreManifest.current(spark, path)
    Decontaminate.ngramOverlapBySuiteBloomAgainst(
      docs, idCol, textCol, blooms(spark, path), m("gram_n"))
  }

  /** The strict gate against the persisted pool: docs sharing ≥1 gram
    * with ANY stored suite drop (probing each suite's filter covers
    * the union — Blooms have no false negatives). */
  def removeContaminated(
      spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    docs.join(
      attribution(spark, path, docs, idCol, textCol)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** One compaction summary from [[compact]]. */
  final case class CompactReport(filesBefore: Long, filesAfter: Long, rows: Long)

  /** Physical maintenance: rewrite the synopsis table keeping only the
    * latest row per suite (every add leaves one small file; a re-added
    * suite leaves a superseded row) into a fresh version, published in
    * ONE manifest commit. */
  def compact(spark: SparkSession, path: String): CompactReport = {
    import graft.io.StoreKit.{compactInput, parquetFileCount}
    val m = StoreManifest.current(spark, path)
    val v = m("synopses")
    val before = parquetFileCount(spark, s"$path/synopses/v$v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("suite").orderBy(col("seq").desc)
    val live = compactInput(spark, s"$path/synopses/v$v")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("suite", "seq", "bytes")
    live.coalesce(1).write.mode("overwrite").parquet(s"$path/synopses/v${v + 1}")
    StoreManifest.commit(spark, path, m.updated("synopses", v + 1))
    graft.io.StoreKit.reclaim(spark, path, "synopses", v + 1)
    CompactReport(before, parquetFileCount(spark, s"$path/synopses/v${v + 1}"),
      spark.read.parquet(s"$path/synopses/v${v + 1}").count())
  }
}
