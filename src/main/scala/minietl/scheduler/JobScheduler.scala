package minietl.scheduler

import java.time.{Clock, LocalDateTime}

import scala.collection.mutable

/** One row of [[JobScheduler.status]] — the reference's status dict
  * (core/scheduler.py:322-343), typed.
  */
final case class JobStatus(
    name: String, schedule: String, enabled: Boolean,
    lastRun: Option[LocalDateTime], nextRun: Option[LocalDateTime],
    runCount: Long, lastError: Option[String])

/** Background job runner over [[CronParser]]/[[IntervalParser]] schedules —
  * the execution half of the reference scheduler (core/scheduler.py:152-349):
  * a job registry with enable/disable, runNow, status, and a polling loop
  * that fires due jobs and reschedules them from the fire time. A failing
  * job records its error in `status` and never kills the loop.
  *
  * The clock is injectable so specs drive time deterministically through
  * [[runPending]] (the loop body) instead of sleeping; the background
  * thread adds nothing but the 200 ms poll cadence around it.
  *
  * This runs PIPELINES, not tasks: at 100 TB each job is a whole Spark
  * application run, so the single-driver polling loop is never the
  * bottleneck — the cluster scheduler below it is.
  */
final class JobScheduler(clock: Clock = Clock.systemDefaultZone()) {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private final class Entry(
      val name: String, val schedule: Schedule, val fn: () => Unit,
      var enabled: Boolean, var nextRun: LocalDateTime) {
    var lastRun: Option[LocalDateTime] = None
    var runCount: Long = 0L
    var lastError: Option[String] = None
  }

  // insertion-ordered so status/firing order is the registration order
  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private var thread: Option[Thread] = None
  @volatile private var looping = false

  private def now: LocalDateTime = LocalDateTime.now(clock)

  /** Register a job; `schedule` is 5-field cron (e.g. every-5-minutes) or
    * an interval string ("30m"). Re-adding a name replaces the previous job
    * (fresh counters).
    */
  def add(name: String, schedule: String, fn: () => Unit,
          enabled: Boolean = true): Unit = {
    val sched = Schedule.parse(schedule)
    synchronized {
      val e = new Entry(name, sched, fn, enabled, sched.next(now))
      entries(name) = e
      log.info(s"scheduled job '$name' (${sched.render}): next run at ${e.nextRun}")
    }
  }

  /** Remove a job; unknown names are a no-op (reference semantics). */
  def remove(name: String): Unit = synchronized { entries.remove(name) }

  /** Unknown names are a no-op (reference semantics); a re-enabled overdue
    * job fires on the next poll.
    */
  def enable(name: String): Unit = synchronized {
    entries.get(name).foreach(_.enabled = true)
  }

  def disable(name: String): Unit = synchronized {
    entries.get(name).foreach(_.enabled = false)
  }

  /** Execute a job immediately, bypassing its schedule (and its enabled
    * flag, like the reference); throws for unknown names.
    */
  def runNow(name: String): Unit = {
    val e = synchronized(entries.getOrElse(name,
      throw new IllegalArgumentException(s"job '$name' not found")))
    execute(e)
  }

  /** One pass of the scheduler loop: fire every enabled job whose nextRun
    * has arrived, then reschedule it from the fire time. Returns the number
    * of jobs fired. Public so tests (and embedders with their own loop) can
    * drive the scheduler without a thread.
    */
  def runPending(): Int = {
    val t = now
    val due = synchronized(entries.values.filter(e => e.enabled && !t.isBefore(e.nextRun)).toSeq)
    due.foreach { e =>
      execute(e)
      synchronized { e.nextRun = e.schedule.next(t) }
    }
    due.size
  }

  private def execute(e: Entry): Unit = {
    // the job body runs OUTSIDE the registry lock so a long pipeline never
    // blocks add/status/disable from another thread
    synchronized { e.lastRun = Some(now); e.runCount += 1 }
    try {
      e.fn()
      synchronized { e.lastError = None }
      log.info(s"job '${e.name}' completed")
    } catch {
      case ex: Exception =>
        synchronized { e.lastError = Some(ex.toString) }
        log.error(s"job '${e.name}' failed: $ex")
    }
  }

  def status: Seq[JobStatus] = synchronized {
    entries.values.map(e => JobStatus(e.name, e.schedule.render, e.enabled,
      e.lastRun, Some(e.nextRun), e.runCount, e.lastError)).toSeq
  }

  def isRunning: Boolean = looping

  /** Start the polling loop; `blocking = true` runs it on the caller's
    * thread (reference semantics), otherwise on a daemon thread.
    */
  def start(blocking: Boolean = false): Unit = {
    synchronized {
      if (looping) { log.warn("scheduler already running"); return }
      looping = true
    }
    if (blocking) loop()
    else {
      val t = new Thread(() => loop(), "minietl-scheduler")
      t.setDaemon(true)
      thread = Some(t)
      t.start()
    }
  }

  /** Stop the loop and join the background thread (if any). */
  def stop(timeoutMillis: Long = 5000L): Unit = {
    synchronized {
      if (!looping) return
      looping = false
      notifyAll()
    }
    thread.foreach(_.join(timeoutMillis))
    thread = None
  }

  private def loop(): Unit = {
    log.info("scheduler loop started")
    while (looping) {
      runPending()
      synchronized { if (looping) wait(200L) }
    }
    log.info("scheduler loop stopped")
  }
}
