package minietl.scheduler

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class SchedulerSpec extends AnyFunSuite {

  test("interval parser covers the reference's 30s/5m/2h/1d forms") {
    assert(IntervalParser.toMillis("30s") === 30000L)
    assert(IntervalParser.toMillis("5m") === 300000L)
    assert(IntervalParser.toMillis("2h") === 7200000L)
    assert(IntervalParser.toMillis("1d") === 86400000L)
    assert(IntervalParser.toMillis("10 minutes") === 600000L)
    intercept[IllegalArgumentException](IntervalParser.toMillis("soon"))
  }

  test("cron parser: *, */N, lists, ranges") {
    val c = CronParser.parse("*/15 9-17 1,15 * 1-5")
    assert(c.minutes === Set(0, 15, 30, 45))
    assert(c.hours === (9 to 17).toSet)
    assert(c.daysOfMonth === Set(1, 15))
    assert(c.months === (1 to 12).toSet)
    assert(c.daysOfWeek === (1 to 5).toSet)
    intercept[IllegalArgumentException](CronParser.parse("* * *"))
    intercept[IllegalArgumentException](CronParser.parse("99 * * * *"))
  }

  test("cron next-fire walks to the first matching minute") {
    val c = CronParser.parse("30 10 * * *")
    val from = LocalDateTime.of(2026, 1, 5, 10, 0)
    assert(c.next(from) === LocalDateTime.of(2026, 1, 5, 10, 30))
    // already past today's fire → tomorrow
    assert(c.next(LocalDateTime.of(2026, 1, 5, 11, 0)) === LocalDateTime.of(2026, 1, 6, 10, 30))
  }

  test("cron day-of-week uses 0=Sunday") {
    val sundays = CronParser.parse("0 0 * * 0")
    assert(sundays.next(LocalDateTime.of(2026, 1, 5, 0, 0)).getDayOfWeek
      === java.time.DayOfWeek.SUNDAY)
  }

  test("retry: backs off exponentially, caps delay, rethrows non-retryable") {
    val delays = scala.collection.mutable.Buffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff(Retry.RetryConfig(
      maxAttempts = 4, initialDelayMs = 100, maxDelayMs = 300, sleep = d => { delays += d; () })) {
      calls += 1
      if (calls < 4) throw new java.io.IOException("flaky")
      "ok"
    }
    assert(out === "ok")
    assert(delays.toSeq === Seq(100L, 200L, 300L))

    intercept[IllegalArgumentException] {
      Retry.withBackoff(Retry.RetryConfig(sleep = _ => ())) {
        throw new IllegalArgumentException("not retryable")
      }
    }

    var n = 0
    intercept[java.io.IOException] {
      Retry.withBackoff(Retry.RetryConfig(maxAttempts = 2, sleep = _ => ())) {
        n += 1; throw new java.io.IOException("always")
      }
    }
    assert(n === 2)
  }

  /** Controllable clock: specs drive scheduler time explicitly. */
  private final class TestClock(private var at: java.time.Instant) extends java.time.Clock {
    def advanceSeconds(s: Long): Unit = at = at.plusSeconds(s)
    override def getZone: java.time.ZoneId = java.time.ZoneOffset.UTC
    override def withZone(z: java.time.ZoneId): java.time.Clock = this
    override def instant(): java.time.Instant = at
  }

  private def clockAt(iso: String) =
    new TestClock(java.time.Instant.parse(iso))

  test("job runner fires interval jobs when due and reschedules from fire time") {
    val clock = clockAt("2026-01-01T10:00:00Z")
    val s = new JobScheduler(clock)
    var runs = 0
    s.add("tick", "5m", () => runs += 1)
    assert(s.runPending() === 0) // not due yet
    clock.advanceSeconds(5 * 60)
    assert(s.runPending() === 1 && runs === 1)
    assert(s.runPending() === 0) // rescheduled 5m from the fire time
    clock.advanceSeconds(5 * 60)
    assert(s.runPending() === 1 && runs === 2)
    val st = s.status.head
    assert(st.runCount === 2 && st.lastError.isEmpty &&
      st.nextRun.contains(java.time.LocalDateTime.parse("2026-01-01T10:15:00")))
  }

  test("job runner: cron schedules, disable/enable, remove") {
    val clock = clockAt("2026-01-01T10:00:30Z")
    val s = new JobScheduler(clock)
    var runs = 0
    s.add("hourly", "0 * * * *", () => runs += 1)
    assert(s.status.head.nextRun.contains(
      java.time.LocalDateTime.parse("2026-01-01T11:00:00")))
    s.disable("hourly")
    clock.advanceSeconds(3600)
    assert(s.runPending() === 0 && runs === 0) // disabled jobs never fire
    s.enable("hourly")
    assert(s.runPending() === 1 && runs === 1) // overdue + re-enabled fires now
    s.remove("hourly")
    assert(s.status.isEmpty)
    s.disable("ghost"); s.enable("ghost"); s.remove("ghost") // no-ops
  }

  test("job runner: runNow bypasses the schedule; failures are recorded") {
    val clock = clockAt("2026-01-01T10:00:00Z")
    val s = new JobScheduler(clock)
    var runs = 0
    s.add("job", "1h", () => runs += 1)
    s.add("bad", "1h", () => throw new RuntimeException("boom"))
    s.runNow("job")
    assert(runs === 1)
    assert(s.status.find(_.name == "job").get.runCount === 1)
    intercept[IllegalArgumentException](s.runNow("nope"))
    // a failing job records its error and does not break the loop
    clock.advanceSeconds(3601)
    assert(s.runPending() === 2)
    val bad = s.status.find(_.name == "bad").get
    assert(bad.lastError.exists(_.contains("boom")) && bad.runCount === 1)
    assert(runs === 2)
    intercept[IllegalArgumentException](s.add("x", "not a schedule", () => ()))
  }

  test("job runner: background loop fires and stops cleanly") {
    val clock = clockAt("2026-01-01T10:00:00Z")
    val s = new JobScheduler(clock)
    val fired = new java.util.concurrent.CountDownLatch(1)
    s.add("bg", "1m", () => fired.countDown())
    s.start()
    assert(s.isRunning)
    s.start() // second start is a warning no-op, not a second thread
    clock.advanceSeconds(61)
    assert(fired.await(5, java.util.concurrent.TimeUnit.SECONDS))
    s.stop()
    assert(!s.isRunning)
  }
}
