package minietl.text

import minietl.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // corpus: "aaab" x3, "aab" x2 — pair counts round 1:
  //   (a,a): 2*3 + 1*2 = 8; (a,b): 3 + 2 = 5  → merge (a,a) -> "aa"
  // round 2 (words: [aa,a,b]x3, [aa,b]x2):
  //   (aa,a): 3; (a,b): 3; (aa,b): 2 → tie 3 broken by pair ASC: (a,b)
  // round 3 (words: [aa,ab]x3, [aa,b]x2):
  //   (aa,ab): 3; (aa,b): 2 → merge (aa,ab) -> "aaab"
  private def docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("aab"))
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("train picks deterministic (count desc, pair asc) merges on a hand example") {
    val m = Bpe.train(docs, "text", numMerges = 3)
    assert(m.merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(m.vocabEncoding("aaab") === Seq("aaab"))
    assert(m.vocabEncoding("aab") === Seq("aa", "b"))
  }

  test("train stops early when no pair repeats instead of memorizing singletons") {
    val single = Seq((1L, "xy")).toDF("doc_id", "text")
    val m = Bpe.train(single, "text", numMerges = 10)
    assert(m.merges === Nil) // (x,y) occurs once — merging it is memorization
    assert(m.vocabEncoding("xy") === Seq("x", "y"))
  }

  test("encodeWord replays the training segmentation and handles unseen words") {
    val m = Bpe.train(docs, "text", numMerges = 3)
    // training words reproduce their training segmentation
    assert(Bpe.encodeWord("aaab", m) === m.vocabEncoding("aaab"))
    assert(Bpe.encodeWord("aab", m) === m.vocabEncoding("aab"))
    // unseen word: merges apply by rank — aaa -> [aa, a]; b alone stays
    assert(Bpe.encodeWord("aaa", m) === Seq("aa", "a"))
    assert(Bpe.encodeWord("ba", m) === Seq("b", "a"))
    assert(Bpe.encodeWord("", m) === Seq())
  }

  test("train refuses a vocabulary above maxVocab instead of collecting it") {
    val wide = (1 to 50).map(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(wide, "text", numMerges = 2, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("encodeStats aggregates tokens/subwords/distinct per doc, incl. unseen words") {
    val m = Bpe.train(docs, "text", numMerges = 3)
    // doc 10 mixes two training words and one unseen ("aaa" -> [aa, a])
    val serve = Seq((10L, "aaab aab aaa"), (11L, "aaab aaab")).toDF("doc_id", "text")
    val out = Bpe.encodeStats(serve, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    // doc 10: subwords = [aaab] ++ [aa, b] ++ [aa, a] → 5 total, distinct {aaab, aa, b, a} = 4
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 5L && out(0).getLong(3) === 4L)
    // doc 11: [aaab] [aaab] → 2 subwords, 1 distinct
    assert(out(1).getLong(1) === 2L && out(1).getLong(2) === 2L && out(1).getLong(3) === 1L)
  }

  test("encodeStats refuses a corpus-scale unseen-word set instead of collecting it") {
    val m = Bpe.train(docs, "text", numMerges = 3)
    val wide = (1 to 40).map(i => (i.toLong, s"unseen$i word$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeStats(wide, "doc_id", "text", m, maxUnseen = 10).collect()
    }
    assert(e.getMessage.contains("maxUnseen"))
  }

  test("supplementary-plane text segments by code point, never surrogate halves") {
    val e = "😀" // 😀 (U+1F600, outside the BMP)
    val docs = Seq((1L, s"$e$e a"), (2L, s"$e${e}a")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 1)
    // the (😀, 😀) pair occurs twice → it is the first merge, as WHOLE
    // code points (a per-char split would merge two surrogate halves)
    assert(m.merges === Seq((e, e)))
    assert(m.vocabEncoding(s"$e$e") === Seq(e + e))
    assert(Bpe.encodeWord(s"$e${e}b", m) === Seq(e + e, "b"))
    // every manifest symbol is a valid Unicode scalar sequence: a UTF-8
    // round-trip is lossless (unpaired surrogates would become U+FFFD and
    // break the DuckDB oracle replay)
    val sql = Bpe.manifestValuesSql(m, extraWords = Seq(s"$e${e}b"))
    assert(new String(sql.getBytes("UTF-8"), "UTF-8") === sql)
    assert(sql.contains(s"('$e$e', '$e$e')"))
  }

  test("manifestValuesSql renders every servable word with its segmentation") {
    val m = Bpe.train(docs, "text", numMerges = 3)
    val sql = Bpe.manifestValuesSql(m, extraWords = Seq("aaa", "aab"))
    assert(sql.contains("('aaab', 'aaab')"))
    assert(sql.contains("('aab', 'aa b')"))
    assert(sql.contains("('aaa', 'aa a')"))
    // no duplicate row for the extra word already in vocab
    assert(sql.split("'aab', 'aa b'").length === 2)
  }
}
