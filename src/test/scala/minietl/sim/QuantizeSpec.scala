package minietl.sim

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),
    (3L, Array(2.0f, 1.0f, -0.5f))).toDF("vec_id", "embedding")

  test("codes are round(v*127/maxabs), in [-127, 127]") {
    val out = vecs.select(col("vec_id"),
      Quantize.int8Scale(col("embedding")).as("s"),
      Quantize.int8Codes(col("embedding")).as("c"))
      .orderBy("vec_id")
      .as[(Long, Double, Seq[Int])].collect().toSeq
    assert(out(0) === ((1L, 1.0, Seq(64, -127, 32)))) // round(31.75) = 32
    assert(out(1) === ((2L, 0.0, Seq(0, 0, 0))))      // zero vector: no div-by-0
    assert(out(2) === ((3L, 2.0, Seq(127, 64, -32)))) // round(63.5) = 64 half-up
  }

  test("dequantize reconstructs within scale/254 per element") {
    val err = vecs.filter(col("vec_id") =!= 2)
      .select(Quantize.int8Scale(col("embedding")).as("s"),
        zip_with(
          Quantize.dequantize(
            Quantize.int8Codes(col("embedding")),
            Quantize.int8Scale(col("embedding"))),
          col("embedding"),
          (d, o) => abs(d - o.cast("double"))).as("errs"))
      .select(max(array_max(col("errs") )/ col("s"))).as[Double].head()
    assert(err <= 1.0 / 254.0 + 1e-12) // half a quantization step
  }

  test("int8RerankTopK with full preK equals exact brute-force top-k") {
    val rng = new scala.util.Random(7)
    val corpus = (1L to 60L).map(i =>
      (i, Array.fill(8)(rng.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") <= 3)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .orderBy("q_id", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val quant = Quantize.int8RerankTopK(corpus, queries, k = 5, preK = 59)
      .orderBy("q_id", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(quant === exact) // preK = all candidates -> rerank IS brute force
    // narrow preK still recalls most of the exact top-5 (int8 error ~1%)
    val narrow = Quantize.int8RerankTopK(corpus, queries, k = 5, preK = 10)
      .as[(Long, Long, Double, Long)].collect().map(t => (t._1, t._2)).toSet
    val hits = exact.map(t => (t._1, t._2)).count(narrow.contains)
    assert(hits >= 12, s"recall too low: $hits/15")
    assertThrows[IllegalArgumentException](
      Quantize.int8RerankTopK(corpus, queries, k = 5, preK = 4))
  }

  test("int8Dot is the exact integer dot of the codes") {
    val d = vecs.filter(col("vec_id") === 1)
      .select(Quantize.int8Dot(
        Quantize.int8Codes(col("embedding")),
        Quantize.int8Codes(col("embedding")))).as[Long].head()
    assert(d === (64L * 64 + 127L * 127 + 32L * 32))
  }
}
