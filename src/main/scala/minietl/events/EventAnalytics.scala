package minietl.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an immutable event log — funnel completion,
  * cohort retention, and calendar resampling with forward-fill. These are
  * supersets of the reference's capabilities (SURVEY §2.8): mini-etl's
  * transformer set has no ordered-sequence operators at all
  * (reference mini_etl/components/transformers.py covers only row-local and
  * group-agg transforms).
  *
  * Scale notes (100 TB event logs):
  *  - [[funnel]] is ONE shuffle: every stage is a prefix-scan window over the
  *    same (entity, ts, tie) sort, and the final per-entity aggregate reuses
  *    the window's hash partitioning — no joins, no second exchange, no
  *    per-entity collect.
  *  - [[cohortRetention]] shuffles twice (entity window, then the cohort-cell
  *    aggregate whose cardinality is weeks², i.e. tiny).
  *  - [[resampleDaily]] is the lag-gap-fill formulation: two exchanges (daily
  *    pre-aggregate, entity window) and row growth bounded by the emitted
  *    calendar spine — it never materializes a dense spine × join like the
  *    naive generate-series-then-outer-join plan.
  */
object EventAnalytics {

  /** Ordered funnel: for each entity, the earliest `stages(0)` event, then the
    * earliest `stages(1)` event at-or-after it, and so on. Emits one row per
    * entity with a `t_<stage>` timestamp per stage (null once the funnel is
    * abandoned) and `depth` = number of stages reached.
    *
    * Events with identical timestamps are ordered by `tieCol` (must be
    * unique) so the stage attribution is deterministic: a same-instant
    * predecessor event only counts if it sorts before the successor.
    */
  def funnel(df: DataFrame, entityCol: String, typeCol: String, tsCol: String,
             tieCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate funnel stages: $stages")
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = df
    var prevReach: Option[Column] = None
    stages.zipWithIndex.foreach { case (stage, i) =>
      val cand = prevReach match {
        case None    => when(col(typeCol) === stage, col(tsCol))
        case Some(p) => when(col(typeCol) === stage && p <= col(tsCol), col(tsCol))
      }
      cur = cur.withColumn(s"__cand_$i", cand)
      // prefix min INCLUDING the current row: "stage k-1 already reached by
      // the time this row fires" — evaluated inside the same sorted pass
      prevReach = Some(min(col(s"__cand_$i")).over(w))
    }
    val stageMins = stages.zipWithIndex.map { case (stage, i) =>
      min(col(s"__cand_$i")).as(s"t_$stage")
    }
    val agged = cur.groupBy(col(entityCol)).agg(stageMins.head, stageMins.tail: _*)
    val depth = stages.map(s => when(col(s"t_$s").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    agged.withColumn("depth", depth.cast("bigint"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday) of the entity's first
    * activity day; a (cohort_week, week_offset) cell counts the distinct
    * entities active `week_offset` weeks after their first day. Offsets are
    * whole-day integer division — no float anywhere.
    */
  def cohortRetention(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol)
    df.select(col(entityCol), to_date(col(tsCol)).as("__day"))
      .withColumn("__first", min(col("__day")).over(w))
      .select(col(entityCol),
        date_trunc("week", col("__first")).cast("date").as("cohort_week"),
        expr("CAST(datediff(__day, __first) DIV 7 AS BIGINT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /** Per-group k-sigma outlier flags with an EXACT keep decision: the classic
    * |x - mean| > k·stddev test, algebraically cleared of division and
    * square root —
    *
    *   (n·x - S)² > k² · (n·Q - S²)        with S = Σx, Q = Σx²
    *
    * — and evaluated in integer cents (BIGINT) and bounded-width DECIMALs,
    * so the flag replays bit-for-bit in any engine: no float enters the
    * decision (same discipline as the Gopher rules and quality score).
    *
    * Plan shape: ONE shuffle (the group window); everything else is
    * scan-side arithmetic. n=1 groups are never outliers (0 > 0).
    *
    * Width budget (documented, asserted nowhere hot): works while
    * |n·x_cents - S_cents| < 2⁶³, n < 10¹⁶, |S_cents| < 10¹⁷ and the
    * variance numerator fits 36 digits — true for any group under ~10¹¹
    * rows of ≤ $10⁵ values, i.e. comfortably past 100 TB per group.
    */
  def sigmaOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    k: Int = 3): DataFrame = {
    require(groupCols.nonEmpty, "sigmaOutliers needs at least one group column")
    require(k > 0 && k <= 9, s"k must be in [1, 9], got $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
    // try_cast: under ANSI a NaN/±Inf/overflow value would fail the job
    // mid-scan; here it degrades to a null cent value, which the count/sum
    // windows skip and the coalesce reports as not-an-outlier
    val xc = expr(s"try_cast(round(`$valueCol` * 100, 0) AS BIGINT)")
    val d19 = "decimal(19,0)"
    val out = df
      .withColumn("__xc", xc)
      .withColumn("__n", count(col("__xc")).over(w))
      .withColumn("__s", sum(col("__xc")).over(w))
      .withColumn("__q", sum(col("__xc") * col("__xc")).over(w))
      // dev = n·x - S (BIGINT, exact); dev² via (19,0)×(19,0) → 38 digits
      .withColumn("__dev", col("__n") * col("__xc") - col("__s"))
      .withColumn("__dev2", col("__dev").cast(d19) * col("__dev").cast(d19))
      // variance numerator n·Q - S² at width 36 (so ×k², width 2, stays
      // inside every engine's 38-digit product-width cap)
      .withColumn("__varnum",
        col("__n").cast("decimal(16,0)") * col("__q").cast(d19) -
          col("__s").cast("decimal(17,0)") * col("__s").cast("decimal(18,0)"))
      .withColumn("__thresh", col("__varnum") * lit(k * k).cast("decimal(2,0)"))
      .withColumn("is_outlier", coalesce(col("__dev2") > col("__thresh"), lit(false)))
    out.drop("__xc", "__s", "__q", "__dev", "__dev2", "__varnum", "__thresh")
      .withColumnRenamed("__n", "group_n")
  }

  /** Time-weighted average of `valueCol` per entity: each observation holds
    * its value until the next one, so the mean weights by holding duration
    * (the standard TWAP), computed on EXACT integer accumulators —
    * microsecond durations × cent values summed as bounded-width decimals;
    * only the final ratio is a double. The last observation per entity has
    * no successor and contributes no interval (entities with a single
    * observation yield a null twap).
    *
    * ONE shuffle: the lead window and the per-entity aggregate share the
    * entity hash partitioning.
    */
  def timeWeightedAvg(df: DataFrame, entityCol: String, tsCol: String,
                      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(entityCol), col(tsCol), col(tieCol),
        expr(s"try_cast(round(`$valueCol` * 100, 0) AS BIGINT)").as("__cents"))
      .withColumn("__dur",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .where(col("__dur").isNotNull && col("__cents").isNotNull)
      .groupBy(col(entityCol))
      .agg(
        sum((col("__cents") * col("__dur")).cast("decimal(28,0)"))
          .cast("decimal(38,0)").as("__num"),
        sum(col("__dur").cast("decimal(28,0)")).cast("decimal(38,0)").as("__den"),
        count(lit(1)).as("n_intervals"))
      .select(col(entityCol),
        round(col("__num").cast("double") / col("__den").cast("double") / 100, 4)
          .as("twap"),
        col("__den").cast("bigint").as("total_dur_us"),
        col("n_intervals"))
  }

  /** Daily resample with forward-fill: per entity, one row per calendar day
    * from its first to its last active day; `day_total` is the day's exact
    * DECIMAL sum of `valueCol` when observed, else the previous observed
    * day's total (classic ffill). `observed` marks real vs filled rows.
    *
    * Gap-fill rides the lag window: each observed day emits itself plus the
    * gap days since the previous observation (carrying that previous total),
    * so no dense spine is ever joined against the fact table.
    */
  def resampleDaily(df: DataFrame, entityCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(entityCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("day_total"))
    val w = Window.partitionBy(entityCol).orderBy(col("day").asc)
    daily
      .withColumn("__prev_day", lag(col("day"), 1).over(w))
      .withColumn("__prev_total", lag(col("day_total"), 1).over(w))
      .select(col(entityCol), col("day"), col("day_total"), col("__prev_total"),
        explode(sequence(coalesce(date_add(col("__prev_day"), 1), col("day")),
          col("day"))).as("__d"))
      .select(col(entityCol), col("__d").as("day"),
        (col("__d") === col("day")).as("observed"),
        when(col("__d") === col("day"), col("day_total"))
          .otherwise(col("__prev_total")).as("day_total"))
  }
}
