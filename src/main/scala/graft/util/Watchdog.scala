package graft.util

import java.util.concurrent.{FutureTask, TimeUnit, TimeoutException}

import org.apache.spark.SparkContext

/** Bounded-await execution for harness query bodies (Verify / Bench /
  * Audit). Round 13 proved the failure mode: ONE query that never
  * terminates (a whole-stage-codegen compile explosion — not a slow job,
  * so no Spark-level timeout applies) silently zeroed every round
  * artifact, because all three harness mains iterate the full board in
  * the calling thread. The reference's own operational posture is
  * per-task timeouts (get_data_apis_vanilla.py:115 — 60 s per render
  * task); this is the engine-side equivalent.
  *
  * The body runs on a fresh daemon thread under a per-query Spark job
  * group. On timeout the job group is cancelled (kills any RUNNING jobs;
  * `interruptOnCancel` reaches the executor threads) and the daemon
  * thread is interrupted — a driver-side hang (codegen) cannot be
  * killed, but the daemon flag means it can never block JVM exit, and
  * the caller moves on to the next query.
  *
  * Residual (accepted) risk: cancelJobGroup only kills jobs RUNNING at
  * cancel time. A driver-side hang that later unblocks can still submit
  * and run its job — late work that may overlap the next query (in
  * Bench, inflating a min-of-passes window; in Audit, publishing a plan
  * into the next query's listener window). Both harnesses already mark
  * the timed-out query failed, so the run is flagged suspect either
  * way; a hard kill would need Thread.stop, which risks the whole JVM. */
object Watchdog {
  /** Default per-query bound, env-tunable: generous against the slowest
    * green query the board has ever recorded (~7 s at sf0.1), tight
    * against a genuine hang eating a round. */
  def defaultTimeoutSec: Long =
    sys.env.get("GRAFT_QUERY_TIMEOUT_SEC").map(_.toLong).getOrElse(180L)

  /** Run `body` with a bounded await. Right(result) on completion,
    * Left(cause) on failure, Left(TimeoutException) after `timeoutSec`.
    * `sc` is used to scope and cancel the query's Spark jobs. */
  def run[A](sc: SparkContext, name: String, timeoutSec: Long)
            (body: => A): Either[Throwable, A] = {
    val task = new FutureTask[A](() => {
      sc.setJobGroup(s"graft-wd-$name", name, interruptOnCancel = true)
      try body finally sc.clearJobGroup()
    })
    val t = new Thread(task, s"graft-watchdog-$name")
    t.setDaemon(true)
    t.start()
    try Right(task.get(timeoutSec, TimeUnit.SECONDS))
    catch {
      case e: java.util.concurrent.ExecutionException =>
        Left(Option(e.getCause).getOrElse(e))
      case _: TimeoutException =>
        sc.cancelJobGroup(s"graft-wd-$name")
        t.interrupt()
        Left(new TimeoutException(
          s"$name TIMED OUT after ${timeoutSec}s (watchdog)"))
    }
  }
}
