package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted link-graph edge table, kept in TWO bucketed copies — one
 * by `src`, one by `dst` — so iterative graph algorithms
 * ([[graft.operators.PageRank]], [[graft.operators.Hits]]) load their
 * per-iteration join sides already co-located: the power iteration's
 * edges⋈ranks join keys on `src`, HITS' hub half-step on `dst`, and
 * with both copies bucketed on exactly those keys NO iteration — and
 * no cold restart — ever shuffles the edge table again; only the
 * node-sized score frame moves per round. This closes the loop the
 * in-memory operators document ("an edge table bucketed by src drops
 * in and saves even this one-time exchange", PageRank.scala): the
 * crawl-graph is written once per snapshot and re-read by every
 * ranking run after.
 *
 * The store is VERTEX-CLOSED at write time: [[write]] drops edges
 * whose endpoint is missing from the vertex set (the same closure
 * [[graft.operators.PageRank.run]] enforces — an open edge would
 * inflate its source's outdegree and leak rank mass). Versions are
 * published through the shared [[StoreManifest]] pointer commit:
 * both copies become visible in ONE commit, superseded versions are
 * reclaimed with the grace window.
 */
object EdgeStore {

  /** The manifest is (String → Int); the vertex count is a Long at
    * crawl scale, so it rides in two 31-bit halves. */
  private def nvKeys(n: Long): Map[String, Int] =
    Map("nv_lo" -> (n & 0x7fffffffL).toInt, "nv_hi" -> (n >>> 31).toInt)

  /** The vertex count recorded at write/upsert time — the universe
    * every stored edge is closed against. None for pre-r15 stores. */
  def vertexCount(spark: SparkSession, path: String): Option[Long] = {
    val m = StoreManifest.current(spark, path)
    for (lo <- m.get("nv_lo"); hi <- m.get("nv_hi"))
      yield (hi.toLong << 31) | lo.toLong
  }

  /** Write one vertex-closed snapshot of `(src, dst)` edges. */
  def write(
      path: String, nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      buckets: Int = 8): Unit = {
    val spark = edges.sparkSession
    val ids = nodes.select(col(idCol).as("id"))
    val closed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = StoreManifest.read(spark, path).fold(1)(_.getOrElse("edges", 0) + 1)
    BucketedTables.write(closed, s"$path/by_src/v$v", "src", "src", buckets)
    BucketedTables.write(closed, s"$path/by_dst/v$v", "dst", "dst", buckets)
    closed.unpersist()
    StoreManifest.commit(spark, path,
      Map("edges" -> v, "buckets" -> buckets) ++ nvKeys(ids.count()))
    // grace-window cleanup (both copies share the one `edges` version):
    // keep the immediately-previous snapshot for in-flight readers,
    // reclaim everything older
    val fs = StoreManifest.fsOf(spark, path)
    for (t <- Seq("by_src", "by_dst"); k <- 1 until v - 1) {
      val dir = s"$path/$t/v$k"
      if (fs.exists(new org.apache.hadoop.fs.Path(dir))) {
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        BucketedTables.dropEntry(spark, dir)
      }
    }
  }

  /** Append a day's new edges into the current snapshot — the crawl
    * pipeline's daily shape (edge list grows, vertices only ever
    * REGISTER, never unregister). The new edges are closed against
    * `nodes` exactly as [[write]] closes its corpus, and `nodes` must
    * be a SUPERSET of the write-time vertex set (checked by count —
    * a shrunk universe would strand already-stored edges outside it
    * and break the Σ pr = 1 closure invariant). Bucketed appends are
    * task-committed files; the manifest re-commits only to advance
    * the recorded vertex count. */
  def upsert(
      path: String, nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String): Unit = {
    val spark = edges.sparkSession
    val m = StoreManifest.current(spark, path)
    val ids = nodes.select(col(idCol).as("id"))
    val n = ids.count()
    vertexCount(spark, path).foreach(prev => require(n >= prev,
      s"EdgeStore.upsert: vertex set shrank ($prev -> $n) — stored edges " +
        "would fall outside the universe; vertices may only be added"))
    val closed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(ids.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (v, buckets) = (m("edges"), m("buckets"))
    BucketedTables.append(closed, s"$path/by_src/v$v", "src", "src", buckets)
    BucketedTables.append(closed, s"$path/by_dst/v$v", "dst", "dst", buckets)
    closed.unpersist()
    StoreManifest.commit(spark, path,
      Map("edges" -> v, "buckets" -> buckets) ++ nvKeys(n))
  }

  /** The current snapshot's src-bucketed copy — zero-exchange side of
    * any join keyed on `src`. */
  def bySrc(spark: SparkSession, path: String): DataFrame = {
    val m = StoreManifest.current(spark, path)
    BucketedTables.read(spark, s"$path/by_src/v${m("edges")}",
      "src", "src", m("buckets"))
  }

  /** The current snapshot's dst-bucketed copy. */
  def byDst(spark: SparkSession, path: String): DataFrame = {
    val m = StoreManifest.current(spark, path)
    BucketedTables.read(spark, s"$path/by_dst/v${m("edges")}",
      "dst", "dst", m("buckets"))
  }
}
