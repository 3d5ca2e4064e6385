package minietl.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * First line of defense is AQE: `spark.sql.adaptive.skewJoin.enabled`
  * splits oversized sort-merge join partitions at runtime, and hash
  * aggregation already does map-side partial aggregation, so a hot GROUP BY
  * key rarely hurts. Salting is for the cases AQE cannot rewrite — a
  * shuffled hash join keyed on one pathological value, or aggregations
  * whose per-key state grows with the group (collect_list-shaped) — and for
  * engines/plans where runtime re-planning is off.
  *
  * Both helpers are semantics-preserving: results equal the unsalted
  * operation for any input.
  */
object Skew {

  /** Deterministic salt in [0, factor) derived from the row's non-key
    * content where possible; falls back to a spread over the partition id
    * for key-only frames.
    */
  private def salt(df: DataFrame, keys: Seq[String], factor: Int): Column = {
    val nonKey = df.columns.filterNot(keys.contains)
    if (nonKey.nonEmpty) pmod(xxhash64(nonKey.map(col): _*), lit(factor)).cast("int")
    else pmod(spark_partition_id(), lit(factor)).cast("int")
  }

  /** Inner/left equi-join where the LEFT side's hot keys would overload
    * single shuffle partitions: the left side gets a salt column, the right
    * side is replicated once per salt value, and the join runs on
    * (keys, salt) — spreading each hot key over `factor` partitions. The
    * right side must be the smaller input (it is multiplied by `factor`).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    val l = left.withColumn("__salt", salt(left, keys, factor))
    val r = right.withColumn("__salt",
      explode(transform(sequence(lit(0), lit(factor - 1)), _.cast("int"))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), then
    * combine partials on keys. Supports the decomposable aggregate set
    * (sum/count/min/max/mean); mean decomposes into sum+count exactly like
    * the reference's StatefulAggTransformer
    * (mini_etl/components/transformers.py:443-447,505-512). Output column
    * naming matches [[Ops.groupAgg]] (`col_fn`).
    */
  def saltedGroupAgg(keys: Seq[String], aggs: Map[String, Seq[String]], factor: Int)
      : Ops.Op = df => {
    val flat = for { (c, fns) <- aggs.toSeq.sortBy(_._1); fn <- fns.map(_.toLowerCase) }
      yield (c, fn)
    val unsupported = flat.collect {
      case (_, fn) if !Set("sum", "count", "min", "max", "mean", "avg")(fn) => fn }
    require(unsupported.isEmpty, s"non-decomposable aggregates: ${unsupported.mkString(", ")}")

    // phase 1: per (keys, salt) partials; mean carried as (sum, count).
    // Dedupe on canonical (column, partial) string pairs BEFORE building
    // Columns — mean+avg on the same column share one msum/mcount partial,
    // and Column equality cannot be relied on to collapse alias duplicates.
    val partialSpecs = flat.map {
      case (c, fn @ ("sum" | "count" | "min" | "max")) => (c, fn)
      case (c, _) => (c, "mean")
    }.distinct
    val partialCols = partialSpecs.flatMap {
      case (c, "sum") => Seq(sum(col(c)).as(s"__p_${c}_sum"))
      case (c, "count") => Seq(count(col(c)).as(s"__p_${c}_count"))
      case (c, "min") => Seq(min(col(c)).as(s"__p_${c}_min"))
      case (c, "max") => Seq(max(col(c)).as(s"__p_${c}_max"))
      case (c, _) => Seq(sum(col(c)).as(s"__p_${c}_msum"), count(col(c)).as(s"__p_${c}_mcount"))
    }
    val partial = df.withColumn("__salt", salt(df, keys, factor))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)

    // phase 2: combine partials per key
    val finalCols = flat.map {
      case (c, "sum") => sum(col(s"__p_${c}_sum")).as(s"${c}_sum")
      case (c, "count") => sum(col(s"__p_${c}_count")).as(s"${c}_count")
      case (c, "min") => min(col(s"__p_${c}_min")).as(s"${c}_min")
      case (c, "max") => max(col(s"__p_${c}_max")).as(s"${c}_max")
      case (c, fn) =>
        (sum(col(s"__p_${c}_msum")) / sum(col(s"__p_${c}_mcount"))).as(s"${c}_$fn")
    }
    if (keys.isEmpty) partial.agg(finalCols.head, finalCols.tail: _*)
    else partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }
}
