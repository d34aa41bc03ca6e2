package graft.operators

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Overlap INDEPENDENT Spark actions inside one commit (guide §2.6:
  * the driver submits jobs sequentially only because caller code calls
  * actions sequentially; independent actions submitted from threads
  * back-fill the scheduler and overlap each other's driver-side
  * planning with the other's running tasks).
  *
  * Scope contract — callers may only parallelize legs that are
  * independent BY THE COMMIT'S OWN CRASH CONTRACT: every Tx*Stack face
  * publishes all its asset writes with ONE manifest pointer swap, so
  * the relative ORDER in which the per-family asset directories land
  * is unobservable (a crash before the swap leaves orphans whichever
  * leg finished first). Legs whose order IS load-bearing (the
  * non-transactional streaming drain's postings-before-derived-stats
  * authority ordering) must stay sequential at the call site.
  *
  * The pool is small and daemon: commit legs are latency-bound driver
  * work (plan + submit + wait), not CPU work — 2-4 in flight per
  * commit is the shape, and FIFO scheduling back-fills the tail
  * exactly as §2.6 describes. Failures rethrow the ORIGINAL cause so
  * [[Manifest.CommitConflict]] (and REQUIRE errors) keep their type
  * for [[Manifest.withConflictRetry]]. */
private[graft] object Par {
  private lazy val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-commit-par")
    t.setDaemon(true)
    t
  }

  /** Run every thunk concurrently; return results in order. Waits for
    * ALL legs (no orphaned in-flight write can outlive the commit
    * body), then rethrows the first failure by submission order. */
  def all[A](tasks: (() => A)*): Seq[A] = {
    val fs = tasks.map(t => pool.submit(new Callable[A] {
      def call(): A = t()
    }))
    // gather outcomes first — never abandon a still-running leg
    val outs = fs.map(f =>
      try Right(f.get())
      catch { case e: ExecutionException => Left(e.getCause) })
    outs.collectFirst { case Left(t) => t }.foreach(throw _)
    outs.map(_.toOption.get)
  }

  /** Two-leg face with heterogeneous result types. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val r = all(() => a, () => b)
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
