package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class QualityRulesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def eval(rule: org.apache.spark.sql.Column, texts: String*): Seq[Boolean] =
    texts.toDF("text").select(rule).as[Boolean].collect().toSeq

  test("wordCountOk bounds the whitespace token count") {
    assert(eval(QualityRules.wordCountOk(col("text"), 2, 3),
      "one", "one two", "one two three", "1 2 3 4") ===
      Seq(false, true, true, false))
  }

  test("meanWordLenOk accepts mean length in [3, 10]") {
    assert(eval(QualityRules.meanWordLenOk(col("text")),
      "abc defg", // means 3.5
      "a b c",    // mean 1
      "abcdefghijklmnop xyz") === // mean 9.5
      Seq(true, false, true))
  }

  test("symbolRatioOk counts #, ... and … against words") {
    assert(eval(QualityRules.symbolRatioOk(col("text")),
      ("w " * 20).trim,                 // 0 symbols, 20 words
      "# " + ("w " * 9).trim,           // 1 symbol, 10 words -> ok
      "# # " + ("w " * 8).trim,         // 2 symbols, 10 words -> fail
      "... " + ("w " * 9).trim,         // ellipsis counts once
      "… " + ("w " * 9).trim) ===
      Seq(true, true, false, true, true))
  }

  test("bulletLinesOk fails only when over 90% of lines are bullets") {
    val nineOfTen = (Seq.fill(9)("- b") :+ "plain").mkString("\n")
    val tenOfTen = Seq.fill(10)("* b").mkString("\n")
    assert(eval(QualityRules.bulletLinesOk(col("text")),
      nineOfTen, tenOfTen, "• dot\nplain") === Seq(true, false, true))
  }

  test("ellipsisLinesOk fails when over 30% of lines trail off") {
    val oneOfFour = Seq("a...", "b", "c", "d").mkString("\n")
    val twoOfFour = Seq("a...", "b…", "c", "d").mkString("\n")
    assert(eval(QualityRules.ellipsisLinesOk(col("text")),
      oneOfFour, twoOfFour) === Seq(true, false))
  }

  test("alphaWordsOk needs 80% of words to contain a letter") {
    assert(eval(QualityRules.alphaWordsOk(col("text")),
      "a b c d 4",    // 4/5
      "a b c 3 4") === // 3/5
      Seq(true, false))
  }

  test("stopwordsOk needs two distinct stop words, duplicates don't count") {
    assert(eval(QualityRules.stopwordsOk(col("text")),
      "the cat and dog", "the the the cat", "no stops here at all") ===
      Seq(true, false, false))
  }

  test("gopherKeep is the conjunction") {
    val good = "the quick brown fox and the lazy dog ran over the hill again"
    assert(eval(QualityRules.gopherKeep(col("text"), 5, 100), good) === Seq(true))
    assert(eval(QualityRules.gopherKeep(col("text"), 50, 100), good) === Seq(false))
  }
}
