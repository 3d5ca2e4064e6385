package minietl.text

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ParagraphDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minChars: Int = 0) =
    ParagraphDedup.dedupParagraphs(
      docs.toDF("doc_id", "text"), "text", "doc_id", delim = "\n",
      minChars = minChars)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("keeps the globally first occurrence of each paragraph, by (id, pos)") {
    val out = run(Seq(
      (1L, "alpha\nbeta"),
      (2L, "beta\ngamma"),
      (3L, "gamma\nalpha\ndelta")))
    assert(out === Seq(
      (1L, 2L, 2L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 3L, 1L, "delta")))
  }

  test("dedups repeats within one document and keeps the earliest position") {
    val out = run(Seq((1L, "x\ny\nx\nx\nz")))
    assert(out === Seq((1L, 5L, 3L, "x\ny\nz")))
  }

  test("a fully duplicated document survives as an empty husk row") {
    val out = run(Seq((1L, "a\nb"), (2L, "a\nb")))
    assert(out === Seq((1L, 2L, 2L, "a\nb"), (2L, 2L, 0L, "")))
  }

  test("minChars exempts short paragraphs from dedup") {
    // "" and "--" fall under minChars=3 and are kept everywhere
    val out = run(Seq(
      (1L, "--\nlong paragraph\n--"),
      (2L, "--\nlong paragraph")), minChars = 3)
    assert(out === Seq(
      (1L, 3L, 3L, "--\nlong paragraph\n--"),
      (2L, 2L, 1L, "--")))
  }

  test("delimiter is literal, not regex") {
    val out = ParagraphDedup.dedupParagraphs(
      Seq((1L, "a.b"), (2L, "a.b")).toDF("doc_id", "text"),
      "text", "doc_id", delim = ".")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // '.' splits into two paragraphs (not per-character regex '.')
    assert(out === Seq((1L, 2L, 2L, "a.b"), (2L, 2L, 0L, "")))
  }
}
