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
 *
 * CONCURRENCY CONTRACT: any number of concurrent READERS, but ONE
 * maintenance writer at a time (the Delta model without its
 * lock-service half — on POSIX-rename filesystems a rename onto an
 * existing name silently overwrites, so two racing committers cannot
 * be serialized by the rename alone). [[commit]] therefore VERIFIES
 * its own payload after the rename and fails loudly if a racing
 * commit clobbered it — a lost commit is an exception, never silent.
 */
object StoreManifest {

  private val Name = "^m(\\d+)$".r

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestKs(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case Name(k) => k.toInt }.toSeq

  private def readK(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, k: Int): Map[String, Int] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"m$k"))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.map(_.split("=", 2))
      .collect { case Array(k2, v) => k2 -> v.trim.toInt }.toMap
  }

  /** Highest committed snapshot, or None for a never-committed path.
    * Listing + max is atomic-enough: a concurrent commit either
    * renamed before the listing (reader sees the new snapshot) or
    * after (the old one, still fully intact — cleanup keeps a
    * one-snapshot grace window, see [[dropSuperseded]]). */
  def read(spark: SparkSession, path: String): Option[Map[String, Int]] = {
    val fs = fsOf(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val ks = manifestKs(fs, dir)
    if (ks.isEmpty) None else Some(readK(fs, dir, ks.max))
  }

  def current(spark: SparkSession, path: String): Map[String, Int] =
    read(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path is not a versioned store (no committed manifest) — run write() first"))

  /** Publish a snapshot: ONE dot-tmp write + ONE rename, then a
    * read-back VERIFY. Everything the snapshot references must already
    * be fully written — the rename IS the commit point. The verify
    * closes the racing-committer hole on rename-overwrite filesystems:
    * if another maintenance run renamed the same `m<K>` between our
    * listing and our rename, exactly one committer reads back foreign
    * content and throws (its directories are stranded, never a mixed
    * snapshot). Single-maintenance-writer remains the supported mode;
    * the verify just makes a violation loud instead of silent. */
  def commit(spark: SparkSession, path: String, versions: Map[String, Int]): Unit = {
    val fs = fsOf(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    fs.mkdirs(dir)
    val next = 1 + manifestKs(fs, dir).foldLeft(0)(math.max)
    val payload = versions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v\n" }.mkString
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tmp-m$next-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(payload.getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"m$next")),
      s"manifest commit m$next failed (concurrent maintenance run?)")
    require(readK(fs, dir, next) == versions,
      s"manifest m$next was clobbered by a concurrent committer — " +
        "stores require a single maintenance writer; this commit is lost")
  }

  /** The CURRENTLY COMMITTED directory of one versioned table. */
  def currentDir(spark: SparkSession, path: String, table: String): String =
    s"$path/$table/v${current(spark, path)(table)}"

  /** Post-commit cleanup with a ONE-SNAPSHOT GRACE WINDOW: keep every
    * version the current AND the immediately-previous committed
    * manifests reference; delete `$table/v*` below both. A reader that
    * resolved the previous snapshot just before this commit keeps
    * reading intact directories until the NEXT maintenance run's
    * cleanup — the Delta-retention idea with a depth-1 window (enough
    * for operation-scoped readers; long-lived readers must not overlap
    * two maintenance cycles). Failures strand bytes, never readers. */
  def dropSuperseded(spark: SparkSession, path: String, table: String): Unit = {
    val fs = fsOf(spark, path)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val live = manifestKs(fs, mdir).sorted.takeRight(2)
      .flatMap(k => readK(fs, mdir, k).get(table)).filter(_ > 0)
    if (live.isEmpty) return // nothing provably superseded — never delete blind
    val keepMin = live.min
    val dir = new org.apache.hadoop.fs.Path(s"$path/$table")
    if (fs.exists(dir)) {
      val V = "^v(\\d+)$".r
      fs.listStatus(dir).map(_.getPath).foreach { p =>
        p.getName match {
          case V(n) if n.toInt < keepMin => fs.delete(p, true)
          case _ => ()
        }
      }
    }
  }
}
