package minietl.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, evaluated in ONE aggregation pass
  * over the frame regardless of how many checks are attached — at 100 TB a
  * per-check scan would multiply the read cost by the number of checks.
  * Complements [[SchemaValidator]] (shape/type coercion) with value-level
  * invariants: completeness, uniqueness, ranges, set membership, and
  * arbitrary predicate satisfaction rates.
  */
object Checks {

  /** One constraint = one aggregate expression + a pass predicate over its
    * value, with a human-readable description.
    */
  final case class Check(name: String, agg: Column, passes: Any => Boolean,
                         describe: Any => String)

  final case class CheckResult(name: String, passed: Boolean, detail: String)

  private def asLong(v: Any): Long = v match {
    case null => 0L
    case n: Long => n
    case n: Number => n.longValue()
  }
  private def asDouble(v: Any): Double = v match {
    case null => Double.NaN
    case n: Number => n.doubleValue()
  }

  /** No nulls in `c`. */
  def complete(c: String): Check = Check(
    s"complete($c)",
    sum(when(col(c).isNull, 1L).otherwise(0L)),
    v => asLong(v) == 0L,
    v => s"${asLong(v)} null(s)")

  /** At most `ratio` of rows may have a null `c`. Vacuously true on empty
    * input, consistent with the counting checks (`complete`, `inRange`, …)
    * which also pass when there are no rows to violate them.
    */
  def completeness(c: String, minRatio: Double): Check = Check(
    s"completeness($c >= $minRatio)",
    avg(when(col(c).isNotNull, 1.0).otherwise(0.0)),
    v => v == null || asDouble(v) >= minRatio,
    v => if (v == null) "vacuous (empty input)" else f"observed ${asDouble(v)}%.4f")

  /** `c` has no duplicate values (nulls ignored). */
  def unique(c: String): Check = Check(
    s"unique($c)",
    count(col(c)) - countDistinct(col(c)),
    v => asLong(v) == 0L,
    v => s"${asLong(v)} duplicate value(s)")

  /** All non-null values in [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check = Check(
    s"inRange($c, [$lo, $hi])",
    sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L)),
    v => asLong(v) == 0L,
    v => s"${asLong(v)} out-of-range value(s)")

  /** All non-null values in the allowed set. */
  def isIn(c: String, allowed: Seq[Any]): Check = Check(
    s"isIn($c)",
    sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L).otherwise(0L)),
    v => asLong(v) == 0L,
    v => s"${asLong(v)} value(s) outside ${allowed.mkString("{", ",", "}")}")

  /** At least `minRatio` of rows satisfy the predicate; vacuously true on
    * empty input (see [[completeness]]).
    */
  def satisfies(name: String, predicate: Column, minRatio: Double = 1.0): Check = Check(
    s"satisfies($name >= $minRatio)",
    avg(when(predicate, 1.0).otherwise(0.0)),
    v => v == null || asDouble(v) >= minRatio,
    v => if (v == null) "vacuous (empty input)" else f"observed ${asDouble(v)}%.4f")

  /** Row count within [lo, hi]. */
  def countBetween(lo: Long, hi: Long): Check = Check(
    s"countBetween($lo, $hi)",
    count(lit(1)),
    v => { val n = asLong(v); n >= lo && n <= hi },
    v => s"observed ${asLong(v)} rows")

  /** One aggregation job; one aggregated row feeds every verdict. */
  private def evaluate(df: DataFrame, checks: Seq[Check]): Seq[(Check, Any)] = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.agg.as(s"__c$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.zipWithIndex.map { case (c, i) => (c, row.get(i)) }
  }

  /** Evaluate all checks in one job; one aggregated row feeds every verdict. */
  def run(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] =
    evaluate(df, checks).map { case (c, v) =>
      CheckResult(c.name, c.passes(v), c.describe(v))
    }

  /** [[run]] as a one-row-per-check DataFrame (check_name, passed, observed)
    * — the shape a quality dashboard or the oracle battery consumes. The
    * observed aggregates are exact cross-engine: counting checks are
    * integers, ratio checks divide an exact 0/1 sum by the row count (both
    * exactly rounded IEEE ops).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    evaluate(df, checks).map { case (c, v) =>
      val observed = v match {
        case null => None
        case n: Number => Some(n.doubleValue())
        case _ => None
      }
      (c.name, c.passes(v), observed)
    }.toDF("check_name", "passed", "observed")
  }

  /** Throw on any failed check (for pipeline gating). */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val failed = run(df, checks).filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException("data-quality checks failed: " +
        failed.map(r => s"${r.name}: ${r.detail}").mkString("; "))
  }
}
