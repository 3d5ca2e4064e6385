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
}
