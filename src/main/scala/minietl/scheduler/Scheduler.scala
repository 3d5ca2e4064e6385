package minietl.scheduler

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Interval strings "30s" / "5m" / "2h" / "1d"
  * (reference: mini_etl/core/scheduler.py:110-149).
  */
object IntervalParser {
  private val Pattern = """(?i)^\s*(\d+)\s*(s|sec|secs|seconds?|m|min|mins|minutes?|h|hr|hrs|hours?|d|days?)\s*$""".r

  def toMillis(s: String): Long = s match {
    case Pattern(n, unit) =>
      val base = unit.toLowerCase.charAt(0) match {
        case 's' => 1000L
        case 'm' => 60L * 1000
        case 'h' => 3600L * 1000
        case 'd' => 86400L * 1000
      }
      n.toLong * base
    case other => throw new IllegalArgumentException(s"bad interval: '$other'")
  }
}

/** 5-field cron: minute hour day-of-month month day-of-week, supporting
  * wildcard, slash-step, lists and ranges (reference: core/scheduler.py:48-79).
  * [[JobScheduler]] is the in-process runner over these; production
  * deployments typically hand the same expressions to an external
  * scheduler (SURVEY §2.9) or use streaming triggers.
  */
final case class CronExpr(
    minutes: Set[Int], hours: Set[Int], daysOfMonth: Set[Int],
    months: Set[Int], daysOfWeek: Set[Int]) {

  def matches(t: LocalDateTime): Boolean =
    minutes(t.getMinute) && hours(t.getHour) && daysOfMonth(t.getDayOfMonth) &&
      months(t.getMonthValue) && daysOfWeek(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday

  /** Next fire time strictly after `from` (minute resolution). */
  def next(from: LocalDateTime): LocalDateTime = {
    var t = from.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = from.plusYears(5)
    while (!matches(t)) {
      t = t.plusMinutes(1)
      if (t.isAfter(limit)) throw new IllegalStateException(s"no fire time within 5 years of $from")
    }
    t
  }
}

/** A job's schedule: a 5-field cron expression or an interval string —
  * the same two forms the reference accepts (core/scheduler.py:240-259,
  * cron tried first, then interval).
  */
sealed trait Schedule {
  def next(after: LocalDateTime): LocalDateTime
  def render: String
}

object Schedule {
  final case class Cron(expr: CronExpr, render: String) extends Schedule {
    def next(after: LocalDateTime): LocalDateTime = expr.next(after)
  }
  final case class Every(millis: Long, render: String) extends Schedule {
    def next(after: LocalDateTime): LocalDateTime =
      after.plus(millis, ChronoUnit.MILLIS)
  }

  def parse(s: String): Schedule =
    scala.util.Try(Cron(CronParser.parse(s), s)).getOrElse {
      scala.util.Try(Every(IntervalParser.toMillis(s), s)).getOrElse(
        throw new IllegalArgumentException(
          s"could not parse schedule '$s' as cron (5 fields) or interval (e.g. 30m)"))
    }
}

object CronParser {
  private def field(spec: String, min: Int, max: Int): Set[Int] = {
    def one(part: String): Seq[Int] = part match {
      case "*" => min to max
      case s if s.startsWith("*/") => min to max by s.drop(2).toInt
      case s if s.contains("/") =>
        val Array(range, step) = s.split("/", 2)
        one(range).sliding(1, step.toInt).flatten.toSeq
      case s if s.contains("-") =>
        val Array(a, b) = s.split("-", 2)
        a.toInt to b.toInt
      case s => Seq(s.toInt)
    }
    val vals = spec.split(",").toIndexedSeq.flatMap(one)
    require(vals.forall(v => v >= min && v <= max), s"cron field '$spec' out of [$min,$max]")
    vals.toSet
  }

  def parse(expr: String): CronExpr = {
    val parts = expr.trim.split("""\s+""")
    require(parts.length == 5, s"cron needs 5 fields, got ${parts.length}: '$expr'")
    CronExpr(
      field(parts(0), 0, 59), field(parts(1), 0, 23), field(parts(2), 1, 31),
      field(parts(3), 1, 12), field(parts(4), 0, 6))
  }
}
