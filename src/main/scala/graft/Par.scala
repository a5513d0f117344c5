package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent submission of an INDEPENDENT Spark subtree from a second
  * driver thread, so its jobs interleave with the main phase's jobs on
  * the shared executors. This buys no extra hardware — the win is
  * filling the scheduler gaps that a chain of small stages (iterative
  * graph rounds) leaves idle, which is exactly the shape of the q62/q39
  * compositions: a heavy scan-side aggregate (the low-coverage list)
  * can stream through while the edge-building rounds checkpoint.
  * Determinism is unaffected: only job scheduling order changes, never
  * any result. */
object Par {
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Start `f` now on another thread; the returned thunk blocks until
    * it finishes (rethrowing any failure at the await site). */
  def async[T](f: => T): () => T = {
    val fut = Future(f)
    () => Await.result(fut, Duration.Inf)
  }
}
