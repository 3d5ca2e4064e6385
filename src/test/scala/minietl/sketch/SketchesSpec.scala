package minietl.sketch

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("kmvDistinct degrades to the exact count below k") {
    val df = (1 to 50).map(i => s"v$i").toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(row.getAs[Long]("n_kept") === 50L)
    assert(row.getAs[Double]("estimate") === 50.0)
  }

  test("kmvDistinct estimates within ~3/sqrt(k) at 10x k distinct values") {
    val n = 2560
    val df = (1 to n).map(i => s"value_$i").toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(row.getAs[Long]("n_kept") === 256L)
    val est = row.getAs[Double]("estimate")
    // standard error of KMV is ~1/sqrt(k-2) ≈ 6.3%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.19, s"estimate $est too far from $n")
  }

  test("kmvDistinct ignores duplicates and nulls") {
    val df = ((1 to 100).map(i => s"x${i % 10}") :+ null).toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 64).head()
    assert(row.getAs[Long]("n_kept") === 10L)
    assert(row.getAs[Double]("estimate") === 10.0)
  }

  test("countMinSketch cell counts sum to depth x token count") {
    val toks = Seq("a", "b", "a", "c", "a", "b").toDF("t")
    val sketch = Sketches.countMinSketch(toks, "t", depth = 4, width = 16)
    assert(sketch.agg(sum("n")).head().getLong(0) === 4L * 6)
    assert(sketch.select("lane").distinct().count() === 4)
    assert(sketch.where(col("bucket") < 0 || col("bucket") >= 16).count() === 0)
  }

  test("countMinTopK estimates dominate exact counts and find the heavy hitter") {
    val toks = (Seq.fill(500)("heavy") ++ (1 to 300).map(i => s"rare_$i")).toDF("t")
    val out = Sketches.countMinTopK(toks, "t", depth = 4, width = 64, k = 5)
      .orderBy(col("exact_n").desc, col("token")).collect()
    assert(out.head.getAs[String]("token") === "heavy")
    assert(out.head.getAs[Long]("exact_n") === 500L)
    // CMS never underestimates
    out.foreach(r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"), r.toString))
    // with 300 rare tokens over 4x64 cells the heavy estimate stays close
    assert(out.head.getAs[Long]("cms_n") <= 500L + 300L)
  }

  test("logHistQuantiles is exact in the sub-8 integer range") {
    // scale 1, values 0..7 → bucket == x; p50 of 8 values: rank ceil(4) = 4,
    // first bucket with cum >= 4 is 3 → lower-bound estimate 3.0
    val df = (0 to 7).map(_.toDouble).toDF("v")
    val out = Sketches.logHistQuantiles(df, Nil, "v",
      Seq((50, 100), (100, 100)), scale = 1L).orderBy("q_num").collect()
    assert(out.map(r => (r.getAs[Int]("q_num"), r.getAs[Double]("est"))).toSeq
      === Seq((50, 3.0), (100, 7.0)))
  }

  test("logHistQuantiles brackets the exact quantile within one 12.5% bucket") {
    val vals = (1 to 2000).map(i => (i * i).toDouble / 7.0) // skewed spread
    val df = vals.toDF("v")
    val exactP95 = vals.sorted.apply(math.ceil(0.95 * vals.size).toInt - 1)
    val est = Sketches.logHistQuantiles(df, Nil, "v", Seq((95, 100)))
      .collect()(0).getAs[Double]("est")
    // the rank-th value lies inside the chosen bucket: [est, est * 1.125)
    assert(est <= exactP95, s"est $est > exact $exactP95")
    assert(exactP95 < est * 1.125 + 2.0 / 1000, s"exact $exactP95 outside bucket of $est")
  }

  test("logHistQuantiles partitions by keys") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 1000.0), ("b", 2000.0))
      .toDF("k", "v")
    val out = Sketches.logHistQuantiles(df, Seq("k"), "v", Seq((100, 100)))
      .orderBy("k").collect()
    // max estimates land in the right per-key octave (lower bound <= max < lb*1.125)
    val a = out(0).getAs[Double]("est"); val b = out(1).getAs[Double]("est")
    assert(a <= 30.0 && 30.0 < a * 1.125)
    assert(b <= 2000.0 && 2000.0 < b * 1.125)
  }

  test("logHistQuantiles rejects malformed quantiles") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(df, Nil, "v", Seq((101, 100)))
    }
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(df, Nil, "v", Nil)
    }
  }
}
