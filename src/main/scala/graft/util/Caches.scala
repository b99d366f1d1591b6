package graft.util

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer
import scala.util.DynamicVariable

/**
 * Scoped tracking of persisted frames. Library stages (WAR cores,
 * linear weights, baserunning composites) cache intermediates they
 * re-read; a long-lived session running many slices would accumulate
 * that pinned storage forever. Wrapping a driver entry point in
 * [[scoped]] releases exactly the frames persisted inside it — unlike
 * `spark.catalog.clearCache()`, caller-owned caches are untouched.
 *
 * Outside any scope, [[track]] is a no-op: direct library calls keep
 * their caches alive for the caller to reuse (and release).
 */
object Caches {

  private val active = new DynamicVariable[ArrayBuffer[Dataset[_]]](null)

  /** Register a frame the current scope persisted; returns it. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val buf = active.value
    if (buf != null) buf.synchronized { buf += ds }
    ds
  }

  /** Run `f`, then unpersist every frame [[track]]ed inside it.
    * Scopes nest: an inner scope releases only its own frames. */
  def scoped[A](f: => A): A = {
    val buf = ArrayBuffer.empty[Dataset[_]]
    try active.withValue(buf)(f)
    finally buf.foreach { ds =>
      try ds.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
