package graft.streaming

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, AtomicReference}

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Reconnect/backoff supervision for streaming queries on failure-prone
  * transports (socket/kafka-style sources that drop mid-stream).
  *
  * The reference's listener simply continues on a non-200 response
  * (`streamer.py:32-36`) — it never re-establishes the connection, so a
  * dropped stream silently stops producing. This is the production twin:
  * when a supervised query dies with an error, it is restarted against
  * the SAME checkpoint after an exponentially growing backoff, so the
  * restarted run resumes from the last committed offsets and replays the
  * failed micro-batch — reconnect without data loss (T5's exactly-once
  * sink semantics make the replay idempotent).
  *
  * Shape: a supervisor thread runs `start()` and blocks in
  * `awaitTermination()` — the restart decision is made from the
  * supervisor, NOT from inside a `StreamingQueryListener` callback:
  * listener events are delivered asynchronously on Spark's listener bus,
  * where a blocking backoff sleep would stall every other listener and a
  * `start()` from the callback races query teardown. The listener API
  * remains the right place for OBSERVING restarts (metrics/alerts); the
  * control loop belongs to a thread that owns the query's lifecycle.
  */
object Supervision {

  /** Exponential backoff policy: delay n = min(maxMs, initialMs·factorⁿ).
    * Defaults give 500ms → 1s → 2s → … → 30s ceiling, 8 attempts — the
    * usual "ride out a rolling broker restart without hammering it". */
  final case class Backoff(maxRestarts: Int = 8,
                           initialMs: Long = 500,
                           maxMs: Long = 30000,
                           factor: Double = 2.0) {
    require(maxRestarts >= 0 && initialMs > 0 && maxMs >= initialMs)
    def delayMs(attempt: Int): Long =
      math.min(maxMs.toDouble, initialMs * math.pow(factor, attempt.toDouble))
        .toLong
  }

  /** Handle on a supervised query: observe restarts, stop it, await the
    * terminal state (clean completion, stop(), or retries exhausted). */
  final class Handle private[Supervision] () {
    private[Supervision] val current =
      new AtomicReference[StreamingQuery](null)
    private[Supervision] val restartCount = new AtomicInteger(0)
    private[Supervision] val failure = new AtomicReference[Throwable](null)
    private[Supervision] val done = new CountDownLatch(1)
    @volatile private[Supervision] var stopRequested = false

    /** Restarts performed so far (not counting the initial start). */
    def restarts: Int = restartCount.get()

    /** The error that ended supervision, if retries were exhausted. */
    def lastError: Option[Throwable] = Option(failure.get())

    /** True once the supervisor has given up or completed. */
    def isDone: Boolean = done.getCount == 0

    /** Request a clean stop of the active query and end supervision. */
    def stop(): Unit = {
      stopRequested = true
      Option(current.get()).foreach { q =>
        try q.stop() catch { case _: Throwable => () }
      }
    }

    /** Block until supervision reaches a terminal state. */
    def await(timeoutMs: Long): Boolean =
      done.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  /** The OBSERVING counterpart of [[supervise]] (which owns the control
    * loop — see the object scaladoc for why restart decisions don't live
    * on the listener bus): a `StreamingQueryListener` that counts query
    * starts/terminations, failures, and input rows, and keeps the last
    * error message. Under supervision every restart is a fresh start
    * event for the same logical query, so `restarts = starts - 1` is the
    * restart metric an alerting system scrapes; `lastError` is what it
    * pages with. Register via `spark.streams.addListener(...)`;
    * `queryName` scopes the metrics to one named query (pass None in a
    * single-query session, e.g. StreamDemo --supervised).
    *
    * Callbacks arrive asynchronously on Spark's listener bus — all state
    * here is atomic, and a terminated event may land shortly after the
    * supervisor's own await returns (callers sampling metrics right at
    * shutdown should allow for that, as StreamingSpec does). */
  final class MetricsListener(queryName: Option[String] = None)
      extends StreamingQueryListener {
    private val tracked =
      java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    private val startCount = new AtomicInteger(0)
    private val terminationCount = new AtomicInteger(0)
    private val failureCount = new AtomicInteger(0)
    private val rowCount = new AtomicLong(0L)
    private val lastErr = new AtomicReference[String](null)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      if (queryName.forall(_ == e.name)) {
        tracked.add(e.runId)
        startCount.incrementAndGet()
      }
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (tracked.contains(e.progress.runId))
        rowCount.addAndGet(e.progress.numInputRows)
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      if (tracked.contains(e.runId)) {
        terminationCount.incrementAndGet()
        e.exception.foreach { msg =>
          failureCount.incrementAndGet()
          lastErr.set(msg)
        }
      }

    def starts: Int = startCount.get()
    /** Restarts observed: every start after the first one. */
    def restarts: Int = math.max(0, startCount.get() - 1)
    def terminations: Int = terminationCount.get()
    /** Terminations that carried an exception. */
    def failures: Int = failureCount.get()
    def lastError: Option[String] = Option(lastErr.get())
    /** Total input rows across all (re)starts of the tracked query. */
    def inputRows: Long = rowCount.get()
  }

  /** Start `start()` under supervision. `sleep` is injectable so tests
    * (and embedding schedulers) control time; production uses the
    * default. The factory MUST build its query on the same checkpoint
    * every time — that is what turns "restart" into "resume". */
  def supervise(start: () => StreamingQuery,
                policy: Backoff = Backoff(),
                sleep: Long => Unit = Thread.sleep): Handle = {
    val h = new Handle()
    val t = new Thread(() => {
      var attempt = 0
      var running = true
      while (running && !h.stopRequested) {
        try {
          val q = start()
          h.current.set(q)
          // covers the race where stop() landed between the factory call
          // and the handle update
          if (h.stopRequested) q.stop()
          q.awaitTermination() // returns normally on stop()/completion
          h.failure.set(null)  // a recovered-then-clean run ends error-free
          running = false
        } catch {
          case e: Throwable =>
            h.failure.set(e)
            if (h.stopRequested || attempt >= policy.maxRestarts) {
              running = false
            } else {
              sleep(policy.delayMs(attempt))
              // a stop() that landed during the backoff sleep means no
              // restart happens — don't count one
              if (h.stopRequested) running = false
              else {
                attempt += 1
                h.restartCount.incrementAndGet()
              }
            }
        }
      }
      h.done.countDown()
    }, "graft-stream-supervisor")
    t.setDaemon(true)
    t.start()
    h
  }
}
