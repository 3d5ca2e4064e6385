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
}
