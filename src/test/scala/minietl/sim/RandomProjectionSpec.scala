package minietl.sim

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RandomProjectionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("sign matrix is deterministic, ±1, and seed-sensitive") {
    val m1 = RandomProjection.signMatrix(7, 16, 4)
    val m2 = RandomProjection.signMatrix(7, 16, 4)
    val m3 = RandomProjection.signMatrix(8, 16, 4)
    assert(m1 === m2)
    assert(m1 !== m3)
    assert(m1.flatten.forall(s => s == 1 || s == -1))
    // both signs actually occur (a degenerate all-ones matrix would still
    // "project" but collapse all distances onto one axis direction)
    assert(m1.flatten.toSet === Set(1, -1))
  }

  test("projection matches the hand-computed fold") {
    val v = Vector.tabulate(16)(i => (i + 1) * 0.5)
    val m = RandomProjection.signMatrix(7, 16, 4)
    val scale = 1.0 / math.sqrt(4.0)
    val expected = m.map { row =>
      var acc = 0.0
      (0 until 16).foreach(i => acc += v(i) * row(i))
      acc * scale
    }
    val df = Seq((1L, v.map(_.toFloat))).toDF("vec_id", "embedding")
    val got = RandomProjection.projectFrame(df, "vec_id", "embedding", 7, 16, 4)
      .collect()(0).getAs[scala.collection.Seq[Double]]("y")
    // float→double cast then identical op order: exact equality expected
    val vf = v.map(x => x.toFloat.toDouble)
    val expectedF = m.map { row =>
      var acc = 0.0
      (0 until 16).foreach(i => acc += vf(i) * row(i))
      acc * scale
    }
    assert(got.toVector === expectedF)
  }

  test("JL property: pairwise distances are preserved in expectation") {
    val rnd = new scala.util.Random(3)
    val vecs = Vector.tabulate(30)(i =>
      (i.toLong, Vector.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = RandomProjection.projectFrame(df, "vec_id", "embedding", 7, 64, 16)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("y").toVector).toMap
    def d2(a: Vector[Double], b: Vector[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      orig = d2(va.map(_.toDouble), vb.map(_.toDouble)) if orig > 0
    } yield d2(proj(ia), proj(ib)) / orig
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1; with dimOut=16 the mean over 435 pairs concentrates
    assert(mean > 0.7 && mean < 1.3, s"mean distance ratio $mean")
  }

  test("components equal the array projection element-wise") {
    val df = Seq((1L, Vector.tabulate(8)(i => (i * 0.25).toFloat)))
      .toDF("vec_id", "embedding")
    val arr = df.select(RandomProjection.project(col("embedding"), 5, 8, 3).as("y"))
      .collect()(0).getAs[scala.collection.Seq[Double]](0)
    val comps = df.select(
        RandomProjection.components(col("embedding"), 5, 8, 3): _*)
      .collect()(0)
    assert((0 until 3).map(comps.getDouble).toVector === arr.toVector)
  }
}
