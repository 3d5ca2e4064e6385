package minietl.functions

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SqlFunctionsSpec extends AnyFunSuite with SparkTestBase {

  MinietlFunctions.register(spark)

  private def one(sql: String) = spark.sql(s"SELECT $sql AS v").collect()(0)

  test("vec_dot is callable from SQL") {
    assert(one("vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))").getDouble(0) === 32.0)
  }

  test("jaccard_sorted is callable from SQL") {
    assert(one("jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))").getDouble(0) === 0.5)
  }

  test("minhash_signature + minhash_estimate compose in SQL") {
    val est = one(
      """minhash_estimate(
        |  minhash_signature(array(1L, 2L, 3L), 64, 42L),
        |  minhash_signature(array(1L, 2L, 3L), 64, 42L))""".stripMargin).getDouble(0)
    assert(est === 1.0)
  }

  test("simhash64 and shingle_hashes are callable from SQL") {
    assert(one("simhash64(array(1L, 2L))").schema("v").dataType.typeName === "long")
    val n = one("size(shingle_hashes(split('a b c d', ' '), 3))").getInt(0)
    assert(n === 2)
  }

  test("slotHistogram: out-of-contract slot ids yield SQL NULL under codegen") {
    import org.apache.spark.sql.functions.{array, col, lit}
    // drive the expression through a real plan (whole-stage codegen), not
    // eval(): the r12 ADVICE defect was ev.value left as a null ArrayData
    // with isNull=false, which only manifests in generated code
    val df = spark.range(1).select(
      vec.slotHistogram(array(lit(0L), lit(99L)), 4).as("oob"),   // 99 >= dim
      vec.slotHistogram(array(lit(1L), lit(null).cast("long")), 4).as("withNull"),
      vec.slotHistogram(array(lit(1L), lit(1L), lit(3L)), 4).as("ok"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getSeq[Long](2) === Seq(0L, 2L, 0L, 1L))
    // downstream consumption of the null doesn't NPE (size() honors isNull
    // and propagates NULL under Spark 4 semantics)
    assert(df.select(org.apache.spark.sql.functions.size(col("oob")))
      .collect()(0).isNullAt(0))
  }

  test("winnowOrds: a null token hash yields SQL NULL under codegen") {
    import org.apache.spark.sql.functions.{array, lit}
    val df = spark.range(1).select(
      vec.winnowOrds(array(lit(1L), lit(null).cast("long"), lit(3L)), 2, 2).as("bad"),
      vec.winnowOrds(array(lit(5L), lit(2L), lit(9L)), 2, 2).as("ok"))
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(!r.isNullAt(1) && r.getSeq[Long](1).nonEmpty)
  }

  test("non-literal k is rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), id, 42L) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
