package minietl.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models" §A1.1 — the repetition-free format heuristics; the repetition
  * signals themselves live in [[TextAnalysis.dupNgramFraction]] et al.).
  *
  * Every rule is a pure scan-side `Column` over codegen'd built-ins plus
  * bounded per-row HOF work, and every ratio threshold is compared in
  * EXACT integer arithmetic (`10 * bullets <= 9 * lines`, never
  * `bullets / lines <= 0.9`), so any SQL engine replays the keep set
  * bit-for-bit — the same portability contract as
  * [[TextAnalysis.qualityScore]].
  *
  * Reference analog: none (the reference filters rows by column predicates
  * only, `mini_etl/components/transformers.py:60-74`); this is a
  * training-data-pipeline extension (SURVEY.md §7.5).
  */
object QualityRules {

  private def toks(text: Column): Column = split(text, " ")
  private def lines(text: Column): Column = split(text, "\n")
  private def nWords(text: Column): Column = size(toks(text)).cast("bigint")

  /** Occurrences of literal `sub` — exact, via length difference. */
  private def countOcc(text: Column, sub: String): Column =
    ((length(text) - length(replace(text, lit(sub), lit("")))) / sub.length)
      .cast("bigint")

  /** Sum of token lengths = chars that are not the separator (exact even
    * with repeated separators: empty tokens contribute 0).
    */
  private def sumTokenLen(text: Column): Column =
    length(replace(text, lit(" "), lit(""))).cast("bigint")

  /** Word count within [minWords, maxWords]. */
  def wordCountOk(text: Column, minWords: Long, maxWords: Long): Column =
    nWords(text).between(minWords, maxWords)

  /** Mean word length within [3, 10] characters: 3n <= sumLen <= 10n. */
  def meanWordLenOk(text: Column): Column = {
    val n = nWords(text)
    val s = sumTokenLen(text)
    s >= n * 3 && s <= n * 10
  }

  /** Hash-or-ellipsis symbols per word <= 0.1: 10 * symbols <= words. */
  def symbolRatioOk(text: Column): Column = {
    val sym = countOcc(text, "#") + countOcc(text, "...") + countOcc(text, "…")
    sym * 10 <= nWords(text)
  }

  /** At most 90% of lines start with a bullet: 10 * bullets <= 9 * lines. */
  def bulletLinesOk(text: Column): Column = {
    val bullets = size(filter(lines(text), l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("bigint")
    bullets * 10 <= size(lines(text)).cast("bigint") * 9
  }

  /** At most 30% of lines end with an ellipsis: 10 * ell <= 3 * lines. */
  def ellipsisLinesOk(text: Column): Column = {
    val ell = size(filter(lines(text), l =>
      l.endsWith("...") || l.endsWith("…"))).cast("bigint")
    ell * 10 <= size(lines(text)).cast("bigint") * 3
  }

  /** At least 80% of words contain an alphabetic char: 5 * alpha >= 4n. */
  def alphaWordsOk(text: Column): Column = {
    val alpha = size(filter(toks(text), t => t.rlike("\\p{L}"))).cast("bigint")
    alpha * 5 >= nWords(text) * 4
  }

  /** At least 2 distinct stop words present ([[TextAnalysis]]'s EN list). */
  def stopwordsOk(text: Column): Column = {
    val lowToks = toks(lower(text))
    val hits = TextAnalysis.enStopwords.map(w =>
      when(array_contains(lowToks, w), 1L).otherwise(0L))
    hits.reduce(_ + _) >= 2L
  }

  /** Conjunction of all rules — the Gopher keep decision. */
  def gopherKeep(text: Column, minWords: Long = 50, maxWords: Long = 100000): Column =
    wordCountOk(text, minWords, maxWords) && meanWordLenOk(text) &&
      symbolRatioOk(text) && bulletLinesOk(text) && ellipsisLinesOk(text) &&
      alphaWordsOk(text) && stopwordsOk(text)

  /** DuckDB replay of every rule over `textCol` in `table`, in lockstep
    * with the Column implementations above (same integer comparisons).
    */
  def oracleSql(table: String, idCol: String, textCol: String,
                minWords: Long, maxWords: Long): String = {
    val stopHits = TextAnalysis.enStopwords
      .map(w => s"CASE WHEN list_contains(toks_l, '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT $idCol AS id, $textCol AS t,
       |    string_split($textCol, ' ') AS toks,
       |    string_split(lower($textCol), ' ') AS toks_l,
       |    string_split($textCol, chr(10)) AS ls,
       |    CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n,
       |    CAST(length(replace($textCol, ' ', '')) AS BIGINT) AS sumlen
       |  FROM $table),
       |r AS (
       |  SELECT id,
       |    n BETWEEN $minWords AND $maxWords AS word_count_ok,
       |    (sumlen >= n * 3 AND sumlen <= n * 10) AS word_len_ok,
       |    ((length(t) - length(replace(t, '#', '')))
       |      + (length(t) - length(replace(t, '...', ''))) // 3
       |      + (length(t) - length(replace(t, chr(8230), '')))) * 10 <= n AS symbol_ok,
       |    CAST(len(list_filter(ls, l -> starts_with(l, '- ')
       |      OR starts_with(l, '* ') OR starts_with(l, chr(8226) || ' '))) AS BIGINT) * 10
       |      <= CAST(len(ls) AS BIGINT) * 9 AS bullet_ok,
       |    CAST(len(list_filter(ls, l -> ends_with(l, '...')
       |      OR ends_with(l, chr(8230)))) AS BIGINT) * 10
       |      <= CAST(len(ls) AS BIGINT) * 3 AS ellipsis_ok,
       |    CAST(len(list_filter(toks, tk -> regexp_matches(tk, '\\p{L}'))) AS BIGINT) * 5
       |      >= n * 4 AS alpha_ok,
       |    ($stopHits) >= 2 AS stopword_ok
       |  FROM d)
       |SELECT id AS $idCol, word_count_ok, word_len_ok, symbol_ok, bullet_ok,
       |  ellipsis_ok, alpha_ok, stopword_ok,
       |  (word_count_ok AND word_len_ok AND symbol_ok AND bullet_ok
       |    AND ellipsis_ok AND alpha_ok AND stopword_ok) AS keep
       |FROM r""".stripMargin
  }
}
