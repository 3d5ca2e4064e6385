package minietl.ops

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "qts", "px")

  private lazy val trades = Seq(
    ("A", 5L), ("A", 20L), ("A", 25L), ("A", 99L),
    ("B", 14L), ("C", 50L)
  ).toDF("sym", "tts")

  test("asof backward picks the latest right row at-or-before each left ts") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
        leftTs = "tts", rightTs = "qts",
        rightPayload = Seq("px" -> "px", "qts" -> "quote_ts"))
      .orderBy("sym", "tts")
      .as[(String, Long, Option[Double], Option[Long])].collect().toSeq
    assert(out === Seq(
      ("A", 5L, None, None),            // no quote yet
      ("A", 20L, Some(2.0), Some(20L)), // exact-ts tie is inclusive
      ("A", 25L, Some(2.0), Some(20L)),
      ("A", 99L, Some(3.0), Some(30L)),
      ("B", 14L, None, None),
      ("C", 50L, None, None)))          // key never seen on right
  }

  test("asof forward picks the earliest right row at-or-after each left ts") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
        leftTs = "tts", rightTs = "qts",
        rightPayload = Seq("px" -> "px"), direction = Joins.Forward)
      .orderBy("sym", "tts")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      ("A", 5L, Some(1.0)),
      ("A", 20L, Some(2.0)),  // inclusive at equal ts
      ("A", 25L, Some(3.0)),
      ("A", 99L, None),
      ("B", 14L, Some(9.0)),
      ("C", 50L, None)))
  }

  test("asof tolerance nulls matches farther than the bound") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
        leftTs = "tts", rightTs = "qts",
        rightPayload = Seq("px" -> "px"),
        tolerance = Some(lit(5L)))
      .orderBy("sym", "tts")
      .as[(String, Long, Option[Double])].collect().toSeq
    // A@99 matched quote@30 at gap 69 > 5 → nulled; A@25 gap 5 → kept
    assert(out.collect { case ("A", t, p) => (t, p) } ===
      Seq((5L, None), (20L, Some(2.0)), (25L, Some(2.0)), (99L, None)))
  }

  test("asof nearest picks the closer side; ties prefer backward") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
        leftTs = "tts", rightTs = "qts",
        rightPayload = Seq("px" -> "px"), direction = Joins.Nearest)
      .orderBy("sym", "tts")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      ("A", 5L, Some(1.0)),   // only forward exists (gap 5)
      ("A", 20L, Some(2.0)),  // exact hit
      ("A", 25L, Some(2.0)),  // back gap 5 == fwd gap 5 → backward wins
      ("A", 99L, Some(3.0)),  // only backward exists
      ("B", 14L, Some(9.0)),  // forward gap 1
      ("C", 50L, None)))
  }

  test("asof nearest applies tolerance to each arm before choosing") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
        leftTs = "tts", rightTs = "qts",
        rightPayload = Seq("px" -> "px"), direction = Joins.Nearest,
        tolerance = Some(lit(4L)))
      .orderBy("sym", "tts")
      .as[(String, Long, Option[Double])].collect().toSeq
    // A@25: both arms at gap 5 > 4 → null; A@5 fwd gap 5 > 4 → null
    assert(out.collect { case ("A", t, p) => (t, p) } ===
      Seq((5L, None), (20L, Some(2.0)), (25L, None), (99L, None)))
  }

  test("asof nearest still runs on one exchange (two window arms, no join)") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
      leftTs = "tts", rightTs = "qts", rightPayload = Seq("px" -> "px"),
      direction = Joins.Nearest)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 1,
      s"more than one exchange:\n$plan")
  }

  test("asof plan is a single shuffle, not a join") {
    val out = Joins.asof(trades, quotes, on = Seq("sym"),
      leftTs = "tts", rightTs = "qts", rightPayload = Seq("px" -> "px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("rangeJoin matches containment exactly, including bin-crossing intervals") {
    val pts = Seq((1L, 0.5), (2L, 10.0), (3L, 14.9), (4L, 15.0), (5L, 99.0))
      .toDF("pid", "v")
    // width-10 bins; interval B spans three bins, C is empty-range
    val ivs = Seq(("X", 0.0, 10.0), ("Y", 9.5, 35.0), ("Z", 40.0, 41.0))
      .toDF("band", "lo", "hi")
    val out = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0)
      .select("pid", "band").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "X"), (2L, "X"), (2L, "Y"), (3L, "Y"), (4L, "Y")))
    val exHi = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0,
        hiExclusive = true)
      .select("pid", "band").as[(Long, String)].collect().toSet
    assert(exHi === Set((1L, "X"), (2L, "Y"), (3L, "Y"), (4L, "Y")))
  }

  test("rangeJoin plan is an equi-join on the bin, not a nested loop") {
    val pts = spark.range(100).select(col("id").as("pid"),
      (col("id") * 3.3).as("v"))
    val ivs = spark.range(30).select(col("id").as("band"),
      (col("id") * 11.0).as("lo"), (col("id") * 11.0 + 15).as("hi"))
    val out = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
      s"nested-loop plan:\n$plan")
    // correctness against the naive predicate join
    val naive = pts.join(ivs, col("lo") <= col("v") && col("v") <= col("hi"))
      .select("pid", "band").as[(Long, Long)].collect().toSet
    assert(out.select("pid", "band").as[(Long, Long)].collect().toSet === naive)
  }

  test("rangeJoin with extra equi keys restricts matches") {
    val pts = Seq(("a", 1L, 5.0), ("b", 2L, 5.0)).toDF("k", "pid", "v")
    val ivs = Seq(("a", "A1", 0.0, 10.0), ("b", "B1", 6.0, 10.0)).toDF("k", "band", "lo", "hi")
    val out = Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0, on = Seq("k"))
      .select("pid", "band").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "A1")))
  }

  test("rangeJoin rejects overlapping non-key column names") {
    val pts = Seq((1L, 5.0)).toDF("id", "v")
    val ivs = Seq((1L, 0.0, 10.0)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0)
    }
  }
}
