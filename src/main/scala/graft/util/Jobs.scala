package graft.util

/** Driver-side job overlap (optimization guide §2.6): Spark's
  * scheduler runs several jobs at once inside one application —
  * independent actions are only sequential because driver code calls
  * them sequentially. `inParallel` runs independent Spark-action
  * thunks from a small thread pool so the next job's tasks back-fill
  * executors freed by the current job's tail. Arithmetic is
  * untouched: the SAME jobs run with the SAME plans, only overlapped,
  * so results stay bit-identical to the sequential schedule. Callers
  * must only pass thunks with NO shared uncached persisted parent
  * (two jobs racing to compute the same uncached persist duplicate
  * that work — materialize the shared parent first). */
object Jobs {
  def inParallel[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.length, 8))
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] { def call(): T = t() })
        }
        futs.map(_.get())
      } finally pool.shutdown()
    }
}
