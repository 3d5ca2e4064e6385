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

  test("non-literal k is rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), id, 42L) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
