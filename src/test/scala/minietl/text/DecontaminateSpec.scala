package minietl.text

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("drops training docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words live here today"),
      (3L, "a quick brown fox jumps too")).toDF("id", "text")
    val bench = Seq((100L, "quick brown fox jumps around")).toDF("id", "text")
    // 4-grams: docs 1 and 3 share "quick brown fox jumps" with the benchmark
    val out = Decontaminate.decontaminate(train, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }

  test("short documents carry no grams and always survive") {
    val train = Seq((1L, "tiny doc"), (2L, "quick brown fox jumps here")).toDF("id", "text")
    val bench = Seq((9L, "quick brown fox jumps")).toDF("id", "text")
    val out = Decontaminate.decontaminate(train, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }

  test("disjoint vocabularies keep everything") {
    val train = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val bench = Seq((9L, "one two three four five")).toDF("id", "text")
    assert(Decontaminate.decontaminate(train, bench, "id", "text", n = 3).count() === 1)
  }

  test("bloom path returns the exact path's result") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words live here today"),
      (3L, "a quick brown fox jumps too"),
      (4L, "short one")).toDF("id", "text")
    val bench = Seq((100L, "quick brown fox jumps around")).toDF("id", "text")
    val exact = Decontaminate.decontaminate(train, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().sorted.toSeq
    val bloom = Decontaminate.decontaminateBloom(train, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(bloom === exact)
    assert(bloom === Seq(2L, 4L))
  }

  test("bloom path with an undersized sketch stays exact (fps only cost verify work)") {
    val train = (1L to 200L).map(i => (i, s"alpha token$i beta token$i gamma")).toDF("id", "text")
    val bench = Seq((0L, "alpha token7 beta token7 gamma")).toDF("id", "text")
    // estimatedGrams=1 forces a tiny, saturated filter: many false positives,
    // but the string verify join must still keep the result exact
    val out = Decontaminate.decontaminateBloom(train, bench, "id", "text", n = 3,
      estimatedGrams = 1L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out === (1L to 200L).filterNot(_ == 7L))
  }

  test("bloom path with an empty benchmark keeps everything") {
    val train = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
    val bench = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Decontaminate.decontaminateBloom(train, bench, "id", "text", n = 3).count() === 1)
  }

  test("contaminationFraction scores exact matched/total shingle ratios") {
    // bench grams (n=2): {"a b", "b c"}
    val bench = Seq((0L, "a b c")).toDF("id", "text")
    val train = Seq(
      (1L, "a b c d"),   // distinct grams: a b, b c, c d → 2/3 matched
      (2L, "x y z"),     // x y, y z → 0/2
      (3L, "a b a b")    // distinct: a b, b a → 1/2
    ).toDF("id", "text")
    val out = Decontaminate.contaminationFraction(train, bench, "id", "text", n = 2)
      .orderBy("id")
      .select("id", "n_grams", "n_matched", "permille")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 2L, 666L), (2L, 2L, 0L, 0L), (3L, 2L, 1L, 500L)))
  }

  test("contaminationFraction omits documents shorter than the shingle width") {
    val bench = Seq((0L, "a b")).toDF("id", "text")
    val train = Seq((1L, "solo"), (2L, "a b")).toDF("id", "text")
    val out = Decontaminate.contaminationFraction(train, bench, "id", "text", n = 2)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }
}
