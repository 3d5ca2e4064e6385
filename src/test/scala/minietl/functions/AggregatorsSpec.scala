package minietl.functions

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("geometric mean matches exp(avg(ln)) and ignores nulls/non-positives") {
    val df = Seq(("a", 2.0), ("a", 8.0), ("a", -1.0), ("b", 5.0))
      .toDF("k", "v")
      .union(Seq(("b", null.asInstanceOf[java.lang.Double])).toDF("k", "v"))
    val out = df.groupBy("k").agg(Aggregators.geoMean(col("v")).as("gm"))
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(math.abs(out(0)._2 - 4.0) < 1e-12) // gm(2, 8) = 4, -1 ignored
    assert(math.abs(out(1)._2 - 5.0) < 1e-12) // exp(ln 5) accumulates one ulp
    // empty (all-invalid) group → null
    val empty = Seq(("z", -3.0)).toDF("k", "v")
      .groupBy("k").agg(Aggregators.geoMean(col("v")).as("gm")).collect()(0)
    assert(empty.isNullAt(1))
  }

  test("geometric mean is partition-order independent") {
    val vals = (1 to 1000).map(i => ("g", i.toDouble))
    val a = vals.toDF("k", "v").repartition(1)
      .groupBy("k").agg(Aggregators.geoMean(col("v"))).collect()(0).getDouble(1)
    val b = vals.reverse.toDF("k", "v").repartition(7)
      .groupBy("k").agg(Aggregators.geoMean(col("v"))).collect()(0).getDouble(1)
    assert(math.abs(a - b) < 1e-9)
  }

  test("bottom-k sample is deterministic, bounded, and drawn from the group") {
    val docs = (1 to 500).map(i => (s"src_${i % 3}", s"doc_$i")).toDF("src", "d")
    val s1 = docs.groupBy("src").agg(Aggregators.sampleK(col("d"), 5).as("sample"))
      .orderBy("src").as[(String, Seq[String])].collect()
    // re-shuffled input → identical samples (hash-determined, not order)
    val s2 = docs.orderBy(rand(123)).repartition(11)
      .groupBy("src").agg(Aggregators.sampleK(col("d"), 5).as("sample"))
      .orderBy("src").as[(String, Seq[String])].collect()
    assert(s1.map(_._2).toSeq === s2.map(_._2).toSeq)
    s1.foreach { case (src, sample) =>
      assert(sample.size === 5)
      assert(sample.forall { d =>
        d.startsWith("doc_") && (d.stripPrefix("doc_").toInt % 3) === src.stripPrefix("src_").toInt
      })
    }
  }

  test("bottom-k sample replays as ORDER BY md5 (the oracle's formulation)") {
    val docs = (1 to 200).map(i => (s"g${i % 2}", s"doc_$i")).toDF("k", "d")
    val viaAgg = docs.groupBy("k").agg(Aggregators.sampleK(col("d"), 5).as("s"))
      .orderBy("k").as[(String, Seq[String])].collect().map { case (k, s) => (k, s.toSet) }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(md5(col("d")))
    val viaWindow = docs.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .groupBy("k").agg(collect_set("d").as("s"))
      .orderBy("k").as[(String, Seq[String])].collect().map { case (k, s) => (k, s.toSet) }
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("small groups sample everything") {
    val out = Seq(("g", "x"), ("g", "y")).toDF("k", "d")
      .groupBy("k").agg(Aggregators.sampleK(col("d"), 10).as("s"))
      .as[(String, Seq[String])].collect()(0)
    assert(out._2.toSet === Set("x", "y"))
  }
}
