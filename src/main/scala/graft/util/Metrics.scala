package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * No-silent-caps surface: operators that drop quality-affecting rows
 * (e.g. [[graft.operators.Dedup.shingled]]'s document-frequency cap)
 * attach `Dataset.observe` aggregates — computed inline during the
 * normal pass, zero extra jobs — and this listener prints every
 * `graft_*` observation so bench/verify runs show what was dropped.
 *
 * Prints to stderr: Bench's stdout contract is ONE JSON line.
 */
object Metrics {

  /** Unique observation name per operator call site: Spark rejects a
    * query plan containing two observe nodes with the same name (two
    * capped operators composed into one query would collide). */
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  def observationName(tag: String): String = s"graft_${tag}_${seq.incrementAndGet()}"

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Idempotently register the printing listener on a session. */
  def enableLogging(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_")) System.err.println(s"[graft-metric] $name $row")
          }
        override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
      })
    }
}
