package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT driver-blocking work (guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because the driver code calls them
  * sequentially. The ANN searchers issue long chains of small
  * driver-blocking actions (trainer collects, checkpoint
  * materializations, truth counts); where two chains share no data
  * dependency, running them from two threads lets the second chain's
  * tasks back-fill executors idled by the first chain's driver
  * round-trips — and, just as important locally, lets their PLANNING
  * and codegen (the measured 1.7–2.3 s inter-job gap of the trained
  * searchers) proceed concurrently.
  *
  * The pool is cached/unbounded (driver threads are cheap and the
  * fan-out is 2 per call site, bounded nesting depth 2) so a nested
  * par2 can never deadlock on pool exhaustion. Results are whatever the
  * thunks compute — bit-identical to sequential execution; only the
  * wall-clock interleaving changes. */
object DriverPar {
  private lazy val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-driver-par")
        t.setDaemon(true)
        t
      }))

  /** Sequential kill-switch: for A/B measurement and as a production
    * escape hatch (a cluster where concurrent driver jobs fight for
    * executors can flip it off without a rebuild). */
  private lazy val disabled = sys.env.contains("SPARK_GRAFT_NO_PAR")

  /** Run `a` on the pool while `b` runs on the calling thread; return
    * both. An exception from either side propagates (a's at the Await,
    * b's inline) — same failure surface as sequential code. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    if (disabled) { val av = a; (av, b) }
    else {
      val fa = Future(a)(ec)
      val bv = b
      (Await.result(fa, Duration.Inf), bv)
    }
  }
}
