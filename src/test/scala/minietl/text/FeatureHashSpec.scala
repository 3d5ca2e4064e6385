package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeatureHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def vec(text: String, dim: Int): Seq[Long] =
    Seq(text).toDF("t")
      .select(FeatureHash.tfVector(col("t"), dim).as("v"))
      .collect()(0).getSeq[Long](0)

  test("tfVector has fixed dimension and conserves the token count") {
    val v = vec("spark scan row spark filter", 32)
    assert(v.length === 32)
    assert(v.sum === 5L)
  }

  test("identical tokens land in one slot; counts accumulate") {
    val v = vec("x x x", 16)
    assert(v.count(_ > 0L) === 1)
    assert(v.max === 3L)
  }

  test("vectorization is deterministic across rows and dims") {
    assert(vec("a b c", 64) === vec("a b c", 64))
    // same tokens, different dim → still conserves mass
    assert(vec("a b c", 8).sum === 3L)
  }

  test("nnz counts distinct occupied slots") {
    val df = Seq("x x y z").toDF("t")
    val n = df.select(FeatureHash.nnz(col("t"), 32).as("n")).collect()(0).getLong(0)
    // 3 distinct tokens, at most 3 slots (collisions possible but not for
    // these tokens at dim 32 under the fixed md5 contract)
    assert(n === 3L)
  }

  test("slot assignment matches the portable hash contract") {
    val slot = Seq("spark").toDF("t")
      .select(FeatureHash.slots(col("t"), 32).as("s"))
      .collect()(0).getSeq[Long](0).head
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("spark".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 32
    assert(slot === expected)
  }

  test("rejects non-positive dim") {
    intercept[IllegalArgumentException] { FeatureHash.tfVector(lit("a"), 0) }
  }
}
