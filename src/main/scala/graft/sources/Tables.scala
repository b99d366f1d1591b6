package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-declared readers for the harness tables (TESTDATA.md).
 *
 * The reference infers schemas at every `pd.read_csv` and hardens them
 * ad hoc (`usecols`/`dtype`/`ensure_columns` — see SURVEY §1.3, e.g.
 * reference `processors/get_war.py:35-36`). Declaring `StructType`s at
 * the source boundary is the port's robustness upgrade: bad files fail
 * at scan, not three stages later, and Catalyst prunes columns against
 * a known schema.
 *
 * At 100 TB these would be directory-partitioned tables
 * (`.../division=…/year=…`); the readers stay the same because parquet
 * partition discovery adds the partition columns transparently.
 */
object Tables {

  /** Round-robin rebalance ONLY when the frame's scan parallelism sits
    * below the session default — the input-layout artifact where a
    * whole table is one parquet row group, so the scan cannot split
    * and every downstream explode/projection/pair-join runs on ONE
    * task (StageAudit r19: t39 3.2 s, v03 2.8 s, t68 1.9 s single-task
    * stages). The probe is static and must only be used on
    * SCAN-ROOTED frames (scan + filter/project, no exchange): such a
    * plan is not AQE-wrapped, so `.rdd` builds lineage without running
    * a job. At real scale the scan already splits past the default
    * parallelism and this is the identity — no shuffle is added
    * (guide §2.5 input skew, §6 input splits; the scale-adaptive form
    * of the glue-level `repartition(defaultParallelism)` idiom). */
  def rebalanced(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /**
   * Load through the DECLARED schema regardless of physical drift.
   *
   * The harness regenerates the parquet testdata between rounds and has
   * already shipped two physical re-encodings of the same logical column
   * (`events.ts` as TIMESTAMP(NANOS) then timestamp[us]). Pinning
   * `spark.read.schema(declared)` makes any such drift a scan-time
   * failure for EVERY query on the table, so the readers instead load
   * the file's own schema and reconcile each declared column:
   *
   *  - same logical type (nullability ignored) → identity, so the common
   *    path is a plain Project of attributes — filter pushdown and
   *    column pruning reach the scan exactly as before;
   *  - TIMESTAMP declared, long loaded → the long is TIMESTAMP(NANOS)
   *    read raw under `nanosAsLong`; exact integer `DIV 1000` to micros
   *    (a double divide loses precision above 2^53 ns);
   *  - anything else (int32↔int64, float↔double, TIMESTAMP_NTZ under the
   *    pinned-UTC session, array element widening) → `cast` to declared;
   *  - declared column missing from the file → loud error at plan time,
   *    not a silent NULL column three stages later.
   */
  private[sources] def reconcile(raw: DataFrame, schema: StructType, table: String): DataFrame = {
    val byName = raw.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val cols = schema.fields.map { f =>
      val lf = byName.getOrElse(f.name.toLowerCase, throw new IllegalArgumentException(
        s"table $table: declared column ${f.name} absent from loaded schema ${raw.schema.simpleString}"))
      val out =
        if (lf.dataType.sql == f.dataType.sql) col(lf.name)
        else (f.dataType, lf.dataType) match {
          case (TimestampType, LongType) => timestamp_micros(expr(s"`${lf.name}` DIV 1000"))
          case _                         => col(lf.name).cast(f.dataType)
        }
      out.as(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  private def read(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reconcile(spark.read.parquet(path(dir, name)), schema, name)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem", lineitemSchema)
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders", ordersSchema)
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part", partSchema)
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation", nationSchema)
  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region", regionSchema)
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", embeddingsSchema)

  /**
   * Events stream table. The harness has generated `ts` as BOTH
   * TIMESTAMP(NANOS) (rounds ≤8) and timestamp[us] (round 9+), so the
   * reader dispatches on the LOADED dtype rather than assuming one
   * encoding. Either way it presents the same two columns:
   *
   *  - `ts_ns`: the epoch-nanos long — exact, the column queries
   *    order and hash on (the DuckDB oracle reads it as `epoch_ns(ts)`,
   *    which yields identical values for both physical encodings);
   *  - `ts`: microsecond TimestampType.
   *
   * TIMESTAMP(NANOS) files Spark's parquet reader otherwise rejects
   * ([PARQUET_TYPE_ILLEGAL]); we read nanos as a raw long
   * (`spark.sql.legacy.parquet.nanosAsLong` — set in the session
   * builder, see [[graft.GraftSession]]/Verify/Bench; defensively
   * re-set here only when absent so ad-hoc sessions still work) and
   * divide with exact integer division (a double division would lose
   * precision above 2^53 ns). Micros files load as TIMESTAMP or
   * TIMESTAMP_NTZ (naive — the session is pinned UTC, so the cast is
   * value-preserving) and multiply back up to nanos losslessly.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        val t = col("ts").cast("timestamp")
        raw.withColumn("ts_ns", unix_micros(t) * lit(1000L))
          .withColumn("ts", t)
    }
  }
}
