package graft

import org.apache.spark.sql.SparkSession
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

  /** A running background subtree: `apply()` blocks for the result
    * (rethrowing any failure); `cancelJobs()` kills its Spark jobs —
    * call it when the MAIN phase chain fails, so the background work
    * neither runs on unobserved nor hangs the driver's await. */
  final class Async[T] private[Par] (fut: Future[T], doCancel: () => Unit) {
    def apply(): T = Await.result(fut, Duration.Inf)
    def cancelJobs(): Unit = doCancel()
  }

  /** Start `f` now on another thread inside its own Spark job group
    * (interrupt-on-cancel), returning a handle that can await the
    * result or cancel the group's jobs. The job group is thread-local
    * and cleared in a finally, so pooled-thread reuse cannot leak it. */
  def async[T](spark: SparkSession, group: String)(f: => T): Async[T] = {
    val fut = Future {
      spark.sparkContext.setJobGroup(group, s"graft background: $group",
        interruptOnCancel = true)
      try f finally spark.sparkContext.clearJobGroup()
    }
    new Async[T](fut, () => spark.sparkContext.cancelJobGroup(group))
  }
}
