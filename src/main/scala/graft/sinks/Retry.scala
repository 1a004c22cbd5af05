package graft.sinks

import scala.annotation.tailrec

/** Retry with exponential backoff for external-sink calls (SURVEY §4 O8):
  * the reference wraps every Drive/API call in a retry decorator with
  * doubling delays (/root/reference/src/01-scrape-images.py:54-74) and
  * each download in a bounded retry loop (:366-382). Inside Spark, task
  * retry (`spark.task.maxFailures`) covers compute; this wrapper is for
  * driver-side calls to external systems (catalog lookups, remote sink
  * existence probes) where a task retry would redo a whole partition.
  */
object Retry {

  /** Runs `body`, retrying up to `attempts` times with delays
    * `baseDelayMs * factor^n`. Rethrows the last failure. */
  def withBackoff[A](attempts: Int = 5, baseDelayMs: Long = 100L, factor: Double = 2.0)(
      body: => A): A = {
    @tailrec
    def loop(remaining: Int, delayMs: Long): A = {
      val attempt = try Right(body) catch { case e: Exception => Left(e) }
      attempt match {
        case Right(a) => a
        case Left(e) if remaining <= 1 => throw e
        case Left(_) =>
          Thread.sleep(delayMs)
          loop(remaining - 1, (delayMs * factor).toLong)
      }
    }
    require(attempts >= 1, "attempts must be >= 1")
    loop(attempts, baseDelayMs)
  }
}
