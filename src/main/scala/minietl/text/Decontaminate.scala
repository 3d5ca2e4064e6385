package minietl.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: drop every training document that shares at
  * least one n-token shingle with a benchmark/eval set, so test questions
  * cannot leak into the training corpus.
  *
  * Shape for 100 TB: the benchmark side is small by construction (eval
  * suites are thousands of documents, not billions), so its distinct gram
  * set is explicitly `broadcast()` — the training corpus is touched by ONE
  * scan-side hash-probe pass (explode grams → broadcast semi-join → distinct
  * tainted ids → broadcast anti-join back). No all-to-all shuffle of
  * training data at any point; the only aggregation is over tainted ids,
  * which is bounded by the training row count and in practice tiny.
  *
  * Grams are joined as strings, which keeps the result EXACT (hashing the
  * grams to 64-bit would shrink the broadcast at a ~n²/2⁶⁴ false-removal
  * risk; at benchmark scale the strings fit comfortably).
  */
object Decontaminate {

  /** Training rows of `train` that share no n-gram with `bench`.
    * Documents shorter than n tokens carry no grams and always survive.
    */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"decontamination shingle width must be >= 2, got $n")
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(TextAnalysis.ngrams(TextAnalysis.tokens(trim(col(textCol))), n))
          .as("__gram"))
    val benchGrams = grams(bench).select("__gram").distinct()
    val tainted = grams(train)
      .join(broadcast(benchGrams), "__gram")
      .select(idCol).distinct()
    // the bench gram set is small BY CONSTRUCTION, hence the explicit
    // broadcast above; the tainted-id set is only small in the typical case
    // (low contamination), so its join is left to AQE, which broadcasts
    // from runtime stats and falls back to a shuffle join when a heavily
    // contaminated corpus would blow the broadcast limit
    train.join(tainted, Seq(idCol), "left_anti")
  }
}
