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
}
