package minietl.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / interval join operators Spark lacks natively.
  *
  * Both are built to survive 100 TB:
  *  - [[asof]] is the union-merge formulation: ONE shuffle of (left ∪ right)
  *    on the join keys, then a per-partition sort and an O(n) running-value
  *    window — no pair explosion, no nested loop, state bounded by one row.
  *  - [[rangeJoin]] buckets the number line so point-in-interval containment
  *    becomes a bin equi-join: each interval is exploded to the bins it
  *    overlaps, each point probes exactly one bin, and the residual
  *    lo<=p<=hi predicate runs post-join. The plan is a hash/sort-merge
  *    join, never BroadcastNestedLoopJoin.
  *
  * No counterpart in the reference (pandas merge_asof territory); included
  * under the large-scale-pipeline mandate.
  */
object Joins {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  sealed trait AsofDirection
  /** match the LATEST right row with right.ts <= left.ts */
  case object Backward extends AsofDirection
  /** match the EARLIEST right row with right.ts >= left.ts */
  case object Forward extends AsofDirection
  /** match whichever of the Backward/Forward candidates is closer in time;
    * equal distance prefers Backward (pandas `merge_asof` tie rule)
    */
  case object Nearest extends AsofDirection

  /** As-of join (pandas `merge_asof` semantics, left-outer): every left row,
    * plus the payload of the single right row nearest in time on the chosen
    * side. Ties on (key, ts) between left and right are INCLUSIVE (a right
    * row at exactly left.ts matches). Multiple right rows sharing
    * (key, rightTs) are resolved by last-wins in (ts, input) order — pre-
    * aggregate the right side if that ambiguity matters.
    *
    * @param on           equi-join key columns (same names both sides);
    *                     empty means a global as-of (single-task sort — warned)
    * @param rightPayload (right column, output name) pairs to carry over;
    *                     unmatched left rows get nulls
    * @param tolerance    max |left.ts - right.ts| as an interval/duration
    *                     column; farther matches are nulled out
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[(String, String)],
           direction: AsofDirection = Backward,
           tolerance: Option[Column] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    if (on.isEmpty)
      log.warn("asof with no `on` keys: the merge runs as ONE unpartitioned " +
        "window (a single-task global sort) — pass join keys at scale")

    val rStructCols = (rightTs +: rightPayload.map(_._1)).distinct
    val lStructType = left.select(left.columns.map(col): _*).schema
    val rStructType = right.select(rStructCols.map(col): _*).schema

    // right rows sort inside the frame at equal ts (inclusive match):
    // Backward looks at preceding rows, so right must sort BEFORE left;
    // Forward looks at following rows, so right must sort AFTER left.
    // Nearest sorts right BEFORE left: the equal-ts right is then caught by
    // its backward arm at distance zero, which no forward match can beat.
    val (lRank, rRank) = direction match {
      case Forward => (0, 1)
      case _       => (1, 0)
    }
    val lSide = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(lRank).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)
    val rSide = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rRank).as("__side"),
        lit(null).cast(lStructType).as("__l"),
        struct(rStructCols.map(col): _*).as("__r")): _*)

    val base = if (on.nonEmpty) Window.partitionBy(on.map(col): _*) else Window.partitionBy()
    val ordered = base.orderBy(col("__ts"), col("__side"))
    def backPick = last(col("__r"), ignoreNulls = true)
      .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def fwdPick = first(col("__r"), ignoreNulls = true)
      .over(ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val union = lSide.unionByName(rSide)
    val matched = direction match {
      case Backward => union.withColumn("__m", backPick)
      case Forward  => union.withColumn("__m", fwdPick)
      case Nearest  =>
        // both arms ride the SAME sort/partition: one Exchange + Sort, two
        // Window nodes — not two shuffles
        val both = union.withColumn("__mb", backPick).withColumn("__mf", fwdPick)
        val gapB = col("__ts") - col("__mb")(rightTs)
        val gapF = col("__mf")(rightTs) - col("__ts")
        val okB = col("__mb").isNotNull && tolerance.map(gapB <= _).getOrElse(lit(true))
        val okF = col("__mf").isNotNull && tolerance.map(gapF <= _).getOrElse(lit(true))
        both.withColumn("__m",
            when(okB && okF, when(gapF < gapB, col("__mf")).otherwise(col("__mb")))
              .when(okB, col("__mb"))
              .when(okF, col("__mf")))
          .drop("__mb", "__mf")
    }
    val sided = matched.where(col("__side") === lRank)

    val withinTol = (direction, tolerance) match {
      case (Nearest, _) | (_, None) => sided // Nearest applied it per arm
      case (_, Some(tol)) =>
        val gap = direction match {
          case Forward => col("__m")(rightTs) - col("__ts")
          case _       => col("__ts") - col("__m")(rightTs)
        }
        sided.withColumn("__m", when(col("__m").isNotNull && gap <= tol, col("__m")))
    }

    withinTol.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map { case (rc, out) => col(s"__m.$rc").as(out) }: _*)
  }

  /** Point-in-interval join: every (point row, interval row) pair with
    * lo <= p <= hi (or < hi when `hiExclusive`). Intervals are exploded to
    * the fixed-width bins they overlap and points probe their single bin,
    * so the physical plan is an equi-join on (keys, bin) — shuffle volume
    * is O(points + intervals × avg_bins_per_interval), never a nested loop.
    *
    * `binWidth` tunes the explosion factor: pick it near the typical
    * interval length so most intervals land in 1–2 bins. Column names must
    * be disjoint between the two frames (rename/select beforehand).
    *
    * @param on optional extra equi-join keys (same names both sides)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double, on: Seq[String] = Nil,
                hiExclusive: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet).diff(on.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint apart from `on`: ${overlap.mkString(", ")}")

    val pts = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val ivs = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val contains =
      col(loCol) <= col(pointCol) &&
        (if (hiExclusive) col(pointCol) < col(hiCol) else col(pointCol) <= col(hiCol))
    pts.join(ivs, (on :+ "__bin").toSeq).where(contains).drop("__bin")
  }
}
