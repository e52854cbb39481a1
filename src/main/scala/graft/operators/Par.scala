package graft.operators

/** Overlap independent driver-synchronized Spark job chains (guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because the driver
  * calls them sequentially. A grid sweep that runs one window+aggregate
  * job per (probe, family) cell, or a choice operator that builds three
  * independent family substrates, leaves most executor slots idle in
  * each job's tail; submitting the independent chains from a pool lets
  * the next chain's tasks back-fill the slots the current chain's
  * stragglers freed. FIFO scheduling (the default) gives exactly that
  * back-fill behaviour.
  *
  * Determinism contract: results return in INPUT order, so callers'
  * row assembly is byte-identical to the sequential loop — the
  * parallelism changes WHEN jobs run, never what they compute. Each
  * thunk must be independent of its siblings (shared persisted/
  * checkpointed upstreams are fine: BlockManager computes each cached
  * block once under a per-block lock, concurrent readers wait).
  */
object Par {

  // Unbounded cached pool of daemon threads: call sites nest (a choice
  // operator's family builders each fan out their own probe sweeps),
  // and a BOUNDED pool would deadlock when outer tasks block on inner
  // ones. Live thread count is bounded by the call pattern (tens), and
  // idle threads are reclaimed after 60 s by the cached pool.
  private lazy val pool =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })

  /** Run the thunks concurrently; return results in input order. A
    * single thunk (or none) runs inline — nothing to overlap. The
    * first failure is rethrown with its ORIGINAL exception (not the
    * pool's ExecutionException wrapper) after cancelling the rest, so
    * callers' error contracts (loud requires, raise_error audits) are
    * unchanged. */
  def all[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.lengthCompare(2) < 0) thunks.map(_())
    else {
      val futs = thunks.map { th =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = th()
        })
      }
      try futs.map(_.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          futs.foreach(_.cancel(true))
          throw Option(e.getCause).getOrElse(e)
      }
    }

  /** Two-branch convenience: `val (a, b) = Par.two(mkA, mkB)`. */
  def two[A, B](a: => A, b: => B): (A, B) = {
    val r = all[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  /** Start `thunk` in the background NOW; the returned join handle
    * rethrows the thunk's original exception. For overlapping an
    * independent side computation (a truth job, an index build) with a
    * sequential chain the caller must drive synchronously (a beam
    * walk's hops) — call the handle before the side result is consumed
    * so failures stay loud and ordered. */
  def bg[T](thunk: => T): () => T = {
    val fut = pool.submit(new java.util.concurrent.Callable[T] {
      def call(): T = thunk
    })
    () =>
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
  }
}
