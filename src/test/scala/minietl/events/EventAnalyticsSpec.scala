package minietl.events

import java.sql.Timestamp

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val log = Seq(
    // user 1: full funnel in order
    (1L, 10L, "signup", "2024-01-01 10:00:00", 5.0),
    (1L, 11L, "click", "2024-01-01 11:00:00", 1.0),
    (1L, 12L, "purchase", "2024-01-02 09:00:00", 20.0),
    // user 2: purchase BEFORE any click — funnel stops at signup
    (2L, 20L, "purchase", "2024-01-01 08:00:00", 9.0),
    (2L, 21L, "signup", "2024-01-01 09:00:00", 0.0),
    (2L, 22L, "view", "2024-01-03 09:00:00", 0.0),
    // user 3: clicks but never signs up — depth 0
    (3L, 30L, "click", "2024-01-05 10:00:00", 2.0),
    (3L, 31L, "purchase", "2024-01-05 11:00:00", 7.0)
  ).toDF("user_id", "event_id", "event_type", "ts_s", "value")
    .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("funnel attributes stages in order and stops on abandonment") {
    val out = EventAnalytics.funnel(log, "user_id", "event_type", "ts",
      "event_id", Seq("signup", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.length === 3)
    val u1 = out(0)
    assert(u1.getAs[Timestamp]("t_signup") === ts("2024-01-01 10:00:00"))
    assert(u1.getAs[Timestamp]("t_click") === ts("2024-01-01 11:00:00"))
    assert(u1.getAs[Timestamp]("t_purchase") === ts("2024-01-02 09:00:00"))
    assert(u1.getAs[Long]("depth") === 3L)
    val u2 = out(1) // the pre-signup purchase must not count
    assert(u2.getAs[Timestamp]("t_signup") === ts("2024-01-01 09:00:00"))
    assert(u2.getAs[Timestamp]("t_click") === null)
    assert(u2.getAs[Timestamp]("t_purchase") === null)
    assert(u2.getAs[Long]("depth") === 1L)
    val u3 = out(2) // no signup at all
    assert(u3.getAs[Timestamp]("t_signup") === null)
    assert(u3.getAs[Long]("depth") === 0L)
  }

  test("funnel counts a later same-type event once a predecessor lands") {
    // second purchase happens after the click → that one is attributed
    val extra = log.unionByName(Seq(
      (2L, 23L, "click", ts("2024-01-02 09:00:00"), 1.0),
      (2L, 24L, "purchase", ts("2024-01-02 10:00:00"), 3.0)
    ).toDF("user_id", "event_id", "event_type", "ts", "value"))
    val u2 = EventAnalytics.funnel(extra, "user_id", "event_type", "ts",
      "event_id", Seq("signup", "click", "purchase"))
      .where(col("user_id") === 2L).collect()(0)
    assert(u2.getAs[Timestamp]("t_click") === ts("2024-01-02 09:00:00"))
    assert(u2.getAs[Timestamp]("t_purchase") === ts("2024-01-02 10:00:00"))
    assert(u2.getAs[Long]("depth") === 3L)
  }

  test("funnel rejects duplicate stages") {
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.funnel(log, "user_id", "event_type", "ts", "event_id",
        Seq("click", "click"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("cohortRetention computes ISO-week cohorts and whole-week offsets") {
    val out = EventAnalytics.cohortRetention(log, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
    // users 1+2 first seen Mon 2024-01-01 (cohort 2024-01-01); user 2 active
    // again on Jan 3 (offset 0); user 3 first seen Fri Jan 5 (same ISO week)
    assert(out.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("2024-01-01", 0L, 3L)))
  }

  test("cohortRetention separates later weeks") {
    val two = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (1L, 2L, "view", ts("2024-01-09 10:00:00"), 0.0), // 8 days → offset 1
      (2L, 3L, "view", ts("2024-01-10 10:00:00"), 0.0) // cohort week Jan 8
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = EventAnalytics.cohortRetention(two, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("sigmaOutliers flags only the extreme value, exactly") {
    // 20 ones + one 100: z(100) = 20/sqrt(21-ish) > 3; z(1) << 3
    val rows = ((1 to 20).map(i => (i.toLong, "a", 1.0)) :+ (99L, "a", 100.0)) ++
      Seq((200L, "b", 42.42)) // singleton group: never an outlier (0 > 0)
    val out = EventAnalytics.sigmaOutliers(
      rows.toDF("event_id", "event_type", "value"), Seq("event_type"), "value", k = 3)
    val flagged = out.where(col("is_outlier")).select("event_id")
      .as[Long].collect().toSet
    assert(flagged === Set(99L))
    assert(out.where(col("event_type") === "b").select("group_n")
      .as[Long].collect().toSeq === Seq(1L))
  }

  test("sigmaOutliers keep decision is float-free (cents discipline)") {
    // values that are NOT exactly representable as doubles still flag
    // consistently because the decision runs on rounded integer cents
    val rows = (1 to 30).map(i => (i.toLong, "g", 0.1 + (i % 3) * 0.01)) :+
      (999L, "g", 7.77)
    val out = EventAnalytics.sigmaOutliers(
      rows.toDF("event_id", "event_type", "value"), Seq("event_type"), "value", k = 3)
    assert(out.where(col("is_outlier")).select("event_id")
      .as[Long].collect().toSeq === Seq(999L))
  }

  test("sigmaOutliers degrades NaN values to unflagged instead of failing under ANSI") {
    val rows = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", Double.NaN))
    val out = EventAnalytics.sigmaOutliers(
      rows.toDF("event_id", "event_type", "value"), Seq("event_type"), "value")
    assert(out.where(col("is_outlier")).count() === 0L)
    assert(out.count() === 3L) // the NaN row itself is kept, just never flagged
  }

  test("madOutliers flags by median distance, robust to the outlier itself") {
    // one extreme among n=7: a lone outlier's population-z converges to
    // √(n²/(n−1)) = √8.17 < 3 as it grows, so k=3 sigma NEVER flags it —
    // the outlier masks itself by inflating sigma. MAD is immune.
    val rows = ((1 to 6).map(i => (i.toLong, "a", 10.0 + (i % 3))) :+
      (99L, "a", 10000.0)) :+ (200L, "b", 5.0) // singleton: never flags
    val df = rows.toDF("event_id", "event_type", "value")
    val sigma = EventAnalytics.sigmaOutliers(df, Seq("event_type"), "value", k = 3)
      .where(col("is_outlier")).select("event_id").as[Long].collect().toSet
    val mad = EventAnalytics.madOutliers(df, Seq("event_type"), "value", k = 3)
      .where(col("is_outlier")).select("event_id").as[Long].collect().toSet
    assert(sigma === Set.empty[Long]) // masked: the outlier inflates sigma
    assert(mad === Set(99L)) // MAD is not fooled
  }

  test("madOutliers carries exact 2·median / 4·MAD integers") {
    // even count: median of {10, 20, 30, 40} = 25 (a .5-free midpoint),
    // deviations {30, 10, 10, 30} in 2x-cents → 4·MAD = 2·median{…} = 4000
    val rows = Seq((1L, "g", 10.0), (2L, "g", 20.0), (3L, "g", 30.0), (4L, "g", 40.0))
    val out = EventAnalytics.madOutliers(
        rows.toDF("event_id", "event_type", "value"), Seq("event_type"), "value")
      .select("median_x2_cents", "mad_x4_cents").distinct().collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 5000L) // 2 × 2500 cents
    assert(out(0).getLong(1) === 4000L) // 4 × 1000 cents = 4 × $10 MAD
  }

  test("madOutliers leaves null and NaN values unflagged") {
    val rows = Seq((1L, "g", 1.0), (2L, "g", 1.0), (3L, "g", Double.NaN),
      (4L, "g", 50.0))
    val out = EventAnalytics.madOutliers(
      rows.toDF("event_id", "event_type", "value"), Seq("event_type"), "value")
    assert(out.count() === 4L)
    assert(out.where(col("is_outlier")).select("event_id")
      .as[Long].collect().toSeq === Seq(4L)) // MAD=0 group: any deviation flags
  }

  test("periodOverPeriod computes exact cent deltas and floored bp ratios") {
    val rows = Seq(
      (1L, "buy", ts("2024-01-01 09:00:00"), 10.0),
      (2L, "buy", ts("2024-01-01 17:00:00"), 10.0), // day 1 total 20.00
      (3L, "buy", ts("2024-01-02 12:00:00"), 25.0), // +5.00, 12500 bp
      (4L, "buy", ts("2024-01-04 12:00:00"), 5.0) // observed-day lag: vs Jan 2
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventAnalytics.periodOverPeriod(rows, Seq("event_type"), "ts", "value")
      .orderBy("day")
      .select("value_cents", "delta_cents", "ratio_bp")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq(
      (2000L, None, None), // first day: no previous
      (2500L, Some(500L), Some(12500L)),
      (500L, Some(-2000L), Some(2000L)))) // 500*10000/2500 = 2000 bp
  }

  test("periodOverPeriod nulls the ratio when the previous total is not positive") {
    val rows = Seq(
      (1L, "x", ts("2024-01-01 10:00:00"), -3.0),
      (2L, "x", ts("2024-01-02 10:00:00"), 7.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventAnalytics.periodOverPeriod(rows, Seq("event_type"), "ts", "value")
      .orderBy("day").select("delta_cents", "ratio_bp")
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq((None, None), (Some(1000L), None)))
  }

  test("resampleDaily fills calendar gaps with the previous observed total") {
    val out = EventAnalytics.resampleDaily(
      log.where(col("user_id") === 2L), "user_id", "ts", "value")
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getBoolean(2),
        Option(r.getDecimal(3)).map(_.toPlainString).orNull))
    assert(out.toSeq === Seq(
      ("2024-01-01", true, "9.00"), // purchase 9.0 + signup 0.0
      ("2024-01-02", false, "9.00"), // gap day carries Jan 1 total
      ("2024-01-03", true, "0.00")))
  }

  test("timeWeightedAvg weights values by holding duration, exactly") {
    val rows = Seq(
      // value 10 held 60 s, value 20 held 30 s → twap = (10*60+20*30)/90
      (1L, 1L, "x", ts("2024-01-01 10:00:00"), 10.0),
      (1L, 2L, "x", ts("2024-01-01 10:01:00"), 20.0),
      (1L, 3L, "x", ts("2024-01-01 10:01:30"), 99.0), // terminal: no interval
      (2L, 4L, "x", ts("2024-01-01 10:00:00"), 5.0) // single obs → no row
    ).toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = EventAnalytics.timeWeightedAvg(rows, "user_id", "ts", "value", "event_id")
      .collect()
    assert(out.length === 1)
    val u1 = out(0)
    assert(u1.getLong(0) === 1L)
    // (10*60 + 20*30)/90 = 13.333..., rounded at 4dp by the operator
    assert(u1.getDouble(1) === 13.3333)
    assert(u1.getLong(2) === 90L * 1000000L)
    assert(u1.getLong(3) === 2L)
  }

  test("resampleDaily emits one dense row per day per entity") {
    val out = EventAnalytics.resampleDaily(log, "user_id", "ts", "value")
    // user 1: Jan 1-2 (2 rows); user 2: Jan 1-3 (3); user 3: Jan 5 (1)
    assert(out.count() === 6L)
    assert(out.where(!col("observed")).count() === 1L)
  }

  test("markovTransitions counts consecutive pairs and row-normalizes") {
    // log transitions: u1 signup→click→purchase; u2 purchase→signup→view;
    // u3 click→purchase
    val out = EventAnalytics.markovTransitions(log, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(("signup", "click"), ("click", "purchase"),
      ("purchase", "signup"), ("signup", "view")))
    // from signup: one →click, one →view ⇒ p = 0.5 each
    assert(out(("signup", "click")) === ((1L, 0.5)))
    assert(out(("signup", "view")) === ((1L, 0.5)))
    // from click: both →purchase ⇒ p = 1.0
    assert(out(("click", "purchase")) === ((2L, 1.0)))
  }

  test("markovTransitions refuses clashing output columns") {
    val bad = log.withColumn("from_type", lit("x"))
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.markovTransitions(bad, "user_id", "event_type", "ts", "event_id")
    }
    assert(e.getMessage.contains("from_type"))
  }
}
