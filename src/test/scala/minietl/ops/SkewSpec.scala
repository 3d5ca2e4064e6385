package minietl.ops

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 10k rows, 95% on one hot key
  private def skewed = (1 to 10000).map { i =>
    val k = if (i % 20 == 0) s"k${i % 7}" else "hot"
    (k, i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  private def dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "tag")

  test("saltedJoin equals the plain join (inner)") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "id", "tag").as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "id", "tag").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 9642) // 9500 hot + 71 k1 + 71 k3
  }

  test("saltedJoin equals the plain join (left), unmatched keys survive") {
    val plain = skewed.join(dim, Seq("k"), "left")
      .select("k", "id", "tag").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 4, joinType = "left")
      .select("k", "id", "tag").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin spreads the hot key across salt values before joining") {
    val salts = skewed.withColumn("__salt",
        pmod(xxhash64(col("id"), col("v")), lit(8)).cast("int"))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    assert(salts >= 6) // hot key occupies most of the 8 salt buckets
  }

  test("saltedGroupAgg matches groupAgg for decomposable aggregates") {
    val plain = skewed.transform(Ops.groupAgg(Seq("k"),
        Map("v" -> Seq("sum", "mean", "min", "max"), "id" -> Seq("count"))))
      .orderBy("k").collect()
    val salted = skewed.transform(Skew.saltedGroupAgg(Seq("k"),
        Map("v" -> Seq("sum", "mean", "min", "max"), "id" -> Seq("count")), factor = 8))
      .select(plain.head.schema.fieldNames.map(col): _*)
      .orderBy("k").collect()
    // groupAgg sorts agg columns by name: k, id_count, v_sum, v_mean, v_min, v_max
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) === s.getString(0))
      assert(p.getLong(1) === s.getLong(1))                     // id_count
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)  // v_sum
      assert(math.abs(p.getDouble(3) - s.getDouble(3)) < 1e-9)  // v_mean
      assert(p.getDouble(4) === s.getDouble(4))                 // v_min
      assert(p.getDouble(5) === s.getDouble(5))                 // v_max
    }
  }

  test("saltedGroupAgg with both mean and avg on one column shares one partial") {
    val out = skewed.transform(Skew.saltedGroupAgg(Seq("k"),
        Map("v" -> Seq("mean", "avg", "sum")), factor = 4))
      .orderBy("k").collect()
    val plain = skewed.groupBy("k")
      .agg(avg("v").as("m"), sum("v").as("s")).orderBy("k").collect()
    out.zip(plain).foreach { case (o, p) =>
      val mean = o.getDouble(o.fieldIndex("v_mean"))
      val av = o.getDouble(o.fieldIndex("v_avg"))
      assert(mean === av)
      assert(math.abs(mean - p.getDouble(1)) < 1e-9)
      assert(math.abs(o.getDouble(o.fieldIndex("v_sum")) - p.getDouble(2)) < 1e-6)
    }
  }

  test("saltedGroupAgg rejects non-decomposable aggregates") {
    intercept[IllegalArgumentException] {
      skewed.transform(Skew.saltedGroupAgg(Seq("k"), Map("v" -> Seq("median")), 4))
    }
  }

  test("global (keyless) salted aggregation works") {
    val out = skewed.transform(Skew.saltedGroupAgg(Nil, Map("v" -> Seq("sum")), 4))
      .as[Double].collect()(0)
    assert(math.abs(out - (1 to 10000).map(_ * 0.5).sum) < 1e-6)
  }
}
