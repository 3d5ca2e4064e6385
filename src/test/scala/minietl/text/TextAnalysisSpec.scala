package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.sql("SELECT 1").select(c.as("v")).collect()(0)

  test("token and char counting") {
    assert(one(TextAnalysis.tokenCount(lit("a b c"))).getLong(0) === 3L)
    assert(one(TextAnalysis.charCount(lit("abcd"))).getLong(0) === 4L)
    // regex tokens: word pieces + single punctuation marks
    assert(one(TextAnalysis.regexTokenCount(lit("Hello, world!"))).getLong(0) === 4L)
  }

  test("uniqueTokenRatio flags repetition") {
    assert(one(TextAnalysis.uniqueTokenRatio(lit("a a a a"))).getDouble(0) === 0.25)
    assert(one(TextAnalysis.uniqueTokenRatio(lit("a b c d"))).getDouble(0) === 1.0)
  }

  test("punctRatio and avgWordLen") {
    assert(one(TextAnalysis.punctRatio(lit("ab!"))).getDouble(0) === 0.3333)
    // "ab cd": 5 chars - 1 space = 4 letter chars / 2 tokens
    assert(one(TextAnalysis.avgWordLen(lit("ab cd"))).getDouble(0) === 2.0)
  }

  test("stopwordRatio uses the english list, lowercased") {
    assert(one(TextAnalysis.stopwordRatio(lit("The cat in a hat"))).getDouble(0) === 0.6)
  }

  test("langId: stopword voting with cjk override and und fallback") {
    val cases = Seq(
      "the cat is in the house and it is warm" -> "en",
      "el perro y la casa en un lugar de que se" -> "es",
      "le chat dans les rues de la ville pour une heure" -> "fr",
      "der hund und die katze ist nicht mit auf sich" -> "de",
      "你好 世界" -> "zh",
      "zzz qqq www" -> "und")
    cases.foreach { case (text, want) =>
      assert(one(TextAnalysis.langId(lit(text))).getString(0) === want, s"text=$text")
    }
  }

  test("qualityScore: deterministic, integer basis points, orders sanely") {
    val clean = one(TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over a lazy dog in the field"))).getLong(0)
    val soup = one(TextAnalysis.qualityScore(lit("!!! ??? *** !!!"))).getLong(0)
    assert(clean > soup)
    val again = one(TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over a lazy dog in the field"))).getLong(0)
    assert(clean === again)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val a = one(TextAnalysis.fingerprint(lit("alpha beta gamma"))).getLong(0)
    val a2 = one(TextAnalysis.fingerprint(lit("alpha beta gamma"))).getLong(0)
    val b = one(TextAnalysis.fingerprint(lit("gamma beta alpha"))).getLong(0)
    assert(a === a2)
    assert(a !== b)
    assert(a >= 0 && a < 2147483647L)
  }
}
