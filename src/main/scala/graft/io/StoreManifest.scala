package graft.io

import org.apache.spark.sql.SparkSession

/**
 * The pointer-commit manifest log shared by the persisted index
 * stores ([[graft.operators.AnnIndex]], [[graft.operators.DedupIndex]])
 * — the Delta-log / HBase-CURRENT pattern, public practice: each
 * manifest file `manifest/m<K>` is one COMPLETE (table → version)
 * snapshot written to a dot-tmp name and renamed into place, so one
 * rename atomically publishes any number of table rewrites together.
 * Readers resolve max-K once per operation and see exactly one
 * consistent snapshot; a crash before the commit leaves only
 * unreferenced `v<N+1>` directories (invisible; clobbered by the next
 * maintenance run's overwrite-mode writes).
 */
object StoreManifest {

  private val Name = "^m(\\d+)$".r

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed snapshot, or None for a never-committed path.
    * Listing + max is atomic-enough: a concurrent commit either
    * renamed before the listing (reader sees the new snapshot) or
    * after (the old one, still fully intact — cleanup is
    * post-commit). */
  def read(spark: SparkSession, path: String): Option[Map[String, Int]] = {
    val fs = fsOf(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    if (!fs.exists(dir)) None
    else {
      val ks = fs.listStatus(dir).map(_.getPath.getName)
        .collect { case Name(k) => k.toInt }
      if (ks.isEmpty) None
      else {
        val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"m${ks.max}"))
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(txt.linesIterator.map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v.trim.toInt }.toMap)
      }
    }
  }

  def current(spark: SparkSession, path: String): Map[String, Int] =
    read(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not a versioned store (no committed manifest) — run write() first"))

  /** Publish a snapshot: ONE dot-tmp write + ONE rename. Everything
    * the snapshot references must already be fully written — the
    * rename IS the commit point. */
  def commit(spark: SparkSession, path: String, versions: Map[String, Int]): Unit = {
    val fs = fsOf(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    fs.mkdirs(dir)
    val next = 1 + fs.listStatus(dir).map(_.getPath.getName)
      .collect { case Name(k) => k.toInt }.foldLeft(0)(math.max)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tmp-m$next")
    val out = fs.create(tmp, true)
    try out.write(versions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v\n" }.mkString.getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"m$next")),
      s"manifest commit m$next failed (concurrent maintenance run?)")
  }

  /** The CURRENTLY COMMITTED directory of one versioned table. */
  def currentDir(spark: SparkSession, path: String, table: String): String =
    s"$path/$table/v${current(spark, path)(table)}"

  /** Post-commit cleanup: delete every `$table/v*` directory BELOW
    * the committed version. Failures strand bytes, never readers. */
  def dropSuperseded(spark: SparkSession, path: String, table: String): Unit = {
    val fs = fsOf(spark, path)
    val cur = current(spark, path).getOrElse(table, Int.MaxValue)
    val dir = new org.apache.hadoop.fs.Path(s"$path/$table")
    if (fs.exists(dir)) {
      val V = "^v(\\d+)$".r
      fs.listStatus(dir).map(_.getPath).foreach { p =>
        p.getName match {
          case V(n) if n.toInt < cur => fs.delete(p, true)
          case _ => ()
        }
      }
    }
  }
}
