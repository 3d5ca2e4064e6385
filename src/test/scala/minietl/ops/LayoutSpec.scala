package minietl.ops

import minietl.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the Morton (z-order) layout key: interleave/de-interleave
  * round-trip, masking, SQL-twin parity, curve locality — plus the payoff
  * the key exists for: a z-clustered parquet write whose row-group stats
  * prune on EITHER dimension of a two-dimension layout.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache): 60 seeded draws per property.
    */
  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    (1 to 60).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  /** Reference de-interleave: bit i of x from z bit 2i, y from 2i+1. */
  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until bits).foreach { i =>
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  private def sparkZ(x: Long, y: Long, bits: Int): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zOrderKey(col("x"), col("y"), bits).as("z"))
      .as[Long].head()

  test("de-interleaving recovers x and y masked to bits (property)") {
    val gen = for {
      bits <- Gen.choose(1, 31)
      x <- Gen.choose(0L, Int.MaxValue.toLong)
      y <- Gen.choose(0L, Int.MaxValue.toLong)
    } yield (bits, x, y)
    // one Spark job over all draws (per-draw jobs would dominate runtime)
    val draws = (1 to 60).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val rows = draws.toDF("bits", "x", "y")
    val got = (1 to 31).foldLeft(rows.withColumn("z", lit(0L))) { (df, b) =>
      df.withColumn("z", when(col("bits") === b,
        Layout.zOrderKey(col("x"), col("y"), b)).otherwise(col("z")))
    }.select("bits", "x", "y", "z").as[(Int, Long, Long, Long)].collect()
    got.foreach { case (bits, x, y, z) =>
      val mask = (1L << bits) - 1
      assert(deinterleave(z, bits) === (x & mask, y & mask),
        s"bits=$bits x=$x y=$y z=$z")
      assert(z >= 0L && z < (1L << (2 * bits)))
    }
  }

  test("zOrderSqlTwin computes the identical key in Spark SQL (property)") {
    val gen = for {
      bits <- Gen.choose(1, 20)
      x <- Gen.choose(0L, (1L << 20) - 1)
      y <- Gen.choose(0L, (1L << 20) - 1)
    } yield (bits, x, y)
    forAll(gen) { case (bits, x, y) =>
      val twin = spark.sql(
        s"SELECT ${Layout.zOrderSqlTwin(x.toString, y.toString, bits)} AS z")
        .as[Long].head()
      val mask = (1L << bits) - 1
      assert(deinterleave(twin, bits) === (x & mask, y & mask))
    }
    // and the Column form agrees with the SQL form on one spot check
    assert(sparkZ(13L, 27L, 5) === spark.sql(
      s"SELECT ${Layout.zOrderSqlTwin("13", "27", 5)} AS z").as[Long].head())
  }

  test("the curve walks the canonical Morton order on a 2x2 grid") {
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).map {
      case (x, y) => deinterleave(sparkZ(x, y, 1), 1) -> sparkZ(x, y, 1)
    }
    assert(keys.map(_._2) === Seq(0L, 1L, 2L, 3L))
  }

  test("locality: quadrants of a 4x4 grid occupy contiguous key ranges") {
    val grid = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val keyed = grid.map { case (x, y) => ((x, y), sparkZ(x, y, 2)) }.toMap
    // each 2x2 quadrant spans exactly 4 consecutive keys
    val quads = grid.groupBy { case (x, y) => (x / 2, y / 2) }
    quads.values.foreach { cells =>
      val ks = cells.map(keyed).sorted
      assert(ks.max - ks.min === 3, s"quadrant keys not contiguous: $ks")
    }
  }

  test("bits bounds are enforced") {
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(col("x"), col("y"), 0)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(col("x"), col("y"), 32)
    }
  }

  /** Rows the parquet scan emitted AFTER row-group statistics pruning
    * (pushed filters skip whole row groups; survivors are counted by the
    * scan's numOutputRows before the post-scan filter).
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-clustered parquet prunes row groups on EITHER dimension") {
    // full 64x64 grid; z-cluster into 16 files (one row group each, well
    // under the default row-group size), each spanning one (x,y) quarter
    val dir = java.nio.file.Files.createTempDirectory("minietl-zorder").toString
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), expr("id DIV 64").as("y"))
      .withColumn("z", Layout.zOrderKey(col("x"), col("y"), 6))
    grid.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val total = scannedRows(table)
    assert(total === 4096L)
    // a predicate on x ALONE and a predicate on y ALONE must both skip the
    // majority of row groups — the two-dimension pruning a single-column
    // sort cannot deliver (x-sorted data would scan everything for the y
    // filter). Exact counts depend on sampled range boundaries; half is a
    // conservative bound (the ideal layout scans 1/4).
    val xScan = scannedRows(table.filter(col("x") < 8))
    val yScan = scannedRows(table.filter(col("y") < 8))
    assert(xScan <= total / 2, s"x-filter scanned $xScan of $total rows")
    assert(yScan <= total / 2, s"y-filter scanned $yScan of $total rows")
    // sanity: the filters themselves return the right row counts
    assert(table.filter(col("x") < 8).count() === 8 * 64)
    assert(table.filter(col("y") < 8).count() === 8 * 64)
  }
}
