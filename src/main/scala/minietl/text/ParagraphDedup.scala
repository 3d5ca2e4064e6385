package minietl.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact deduplication (the C4/Dolma recipe):
  * split every document on a literal delimiter, keep only the globally FIRST
  * occurrence of each distinct paragraph — ordered by (id, position), so the
  * survivor set is a pure function of the data — and reassemble documents
  * from their surviving paragraphs in original order.
  *
  * Reference analog: the reference dedupes whole rows only
  * (`mini_etl/components/transformers.py:537-547`); sub-document dedup is a
  * training-data-pipeline extension (SURVEY.md §7.5).
  *
  * Scale shape: explode is scan-side row growth (no shuffle); the keep-first
  * decision is ONE hash shuffle of (md5(paragraph), id, pos) — the paragraph
  * text itself rides the same shuffle for reassembly; re-assembly is a second
  * shuffle back on the document id. Both partition on high-cardinality keys.
  * A degenerate paragraph repeated billions of times at 100 TB lands on one
  * reducer but produces ONE window partition scanned linearly — unlike an
  * LSH bucket self-join there is no quadratic output, so no cap is needed;
  * AQE skew-split handles the shuffle imbalance.
  */
object ParagraphDedup {

  /** Documents whose every paragraph was already seen elsewhere keep an
    * empty `text_dedup` (and `n_kept = 0`) rather than vanishing: dropping
    * vs. keeping husk rows is a policy decision left to the caller.
    *
    * @param minChars paragraphs SHORTER than this are exempt from dedup and
    *                 always kept (boilerplate fragments like "" or "***" are
    *                 structure, not content — the Dolma heuristic). 0 (the
    *                 default) dedupes everything.
    */
  def dedupParagraphs(df: DataFrame, textCol: String, idCol: String,
                      delim: String = "\n", minChars: Int = 0): DataFrame = {
    require(delim.nonEmpty, "delimiter must be non-empty")
    val paras = df
      .select(col(idCol).as("_pd_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim), -1))
          .as(Seq("_pd_pos", "_pd_para")))
    // global first occurrence per distinct paragraph: min (id, pos) over the
    // md5 hash partition — one shuffle, linear scan per partition
    val firstInGroup = struct(col("_pd_id"), col("_pd_pos")) ===
      min(struct(col("_pd_id"), col("_pd_pos")))
        .over(Window.partitionBy(md5(col("_pd_para").cast("binary"))))
    val flagged = paras.withColumn("_pd_keep",
      length(col("_pd_para")) < lit(minChars) || firstInGroup)
    flagged
      .groupBy(col("_pd_id").as(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("_pd_keep"), 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("_pd_keep"),
              struct(col("_pd_pos"), col("_pd_para"))))),
            x => x.getField("_pd_para")),
          delim).as("text_dedup"))
  }

  /** DuckDB replay of [[dedupParagraphs]] over a text expression `textSql`
    * on table `table` — same split / global-keep-first / reassemble, so the
    * battery compares the full computation, not just row counts.
    */
  def oracleSql(table: String, idCol: String, textSql: String,
                delimSql: String, minChars: Int = 0): String =
    s"""WITH d AS (SELECT $idCol AS id, $textSql AS t FROM $table),
       |p AS (SELECT id, unnest(string_split(t, $delimSql)) AS para,
       |        generate_subscripts(string_split(t, $delimSql), 1) AS pos
       |      FROM d),
       |w AS (SELECT id, pos, para,
       |        (length(para) < $minChars OR
       |         row_number() OVER (PARTITION BY md5(para) ORDER BY id, pos) = 1) AS keep
       |      FROM p)
       |SELECT id AS $idCol,
       |  count(*) AS n_paras,
       |  count(CASE WHEN keep THEN 1 END) AS n_kept,
       |  coalesce(string_agg(CASE WHEN keep THEN para END, $delimSql ORDER BY pos), '') AS text_dedup
       |FROM w GROUP BY id""".stripMargin
}
