package minietl.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) — the
  * train-once / serve-distributed split done the [[minietl.sim.Ivf]] way:
  * training produces a MODEL-SIZED artifact (an ordered merge table + the
  * final segmentation of every training word), serving is pure
  * joins/explodes over that artifact, and the exported manifest lets an
  * external SQL engine verify the serving path without re-running the
  * greedy loop.
  *
  * Training operates on the distinct-word COUNT table, not the corpus —
  * the classic BPE formulation: one distributed groupBy(word) collapses
  * the 100 TB token stream to vocabulary-sized (word, count) rows
  * (model-sized like IVF centroids, enforced by `maxVocab`), and the
  * greedy merge loop runs on the driver over that table. Every choice is
  * deterministic: the next merge is the (count DESC, pair ASC) maximum,
  * and merges apply left-to-right non-overlapping.
  *
  * Serving (encoding) never runs the greedy loop on data: training words
  * carry their final segmentation in the model; a document stream is
  * exploded to tokens and broadcast-joined against that segmentation
  * table. Words unseen in training are segmented on demand by replaying
  * the merge ranks (standard BPE inference: repeatedly merge the
  * lowest-rank adjacent pair) — over DISTINCT unseen words only, which is
  * again model-sized relative to the corpus.
  *
  * Reference scope note: the reference has no subword tokenizer
  * (mini_etl/components/transformers.py stops at whole-cell transforms);
  * this is part of the LLM-pipeline superset mandate.
  */
object Bpe {

  /** A trained tokenizer: `merges` in training order (rank = index) and the
    * final segmentation of every training word. Both are model-sized.
    */
  final case class BpeModel(
      merges: Seq[(String, String)],
      vocabEncoding: Map[String, Seq[String]]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** A word's initial symbol sequence: one symbol per Unicode CODE POINT,
    * not per Java char — `word.map(_.toString)` would split supplementary-
    * plane text (emoji, CJK extensions) into unpaired surrogate halves,
    * which are self-consistent inside the JVM but invalid UTF-8 the moment
    * [[manifestValuesSql]] space-joins them into SQL literals for the
    * external oracle.
    */
  private def codePointSyms(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** One merge pass: replace adjacent (l, r) by l+r, left-to-right,
    * non-overlapping.
    */
  private def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` BPE merges over the whitespace-token stream of
    * `textCol` (same tokenization as the rest of the text family). The
    * distributed part is ONE groupBy(word) count; the greedy loop runs on
    * the driver over the collected (word, count) table, which `maxVocab`
    * keeps model-sized — the call REFUSES a larger vocabulary rather than
    * silently materializing it. Training stops early when no pair occurs
    * twice (merging singleton pairs would just memorize words).
    */
  /** Total [[train]] invocations this JVM — lets tests assert the config
    * layer's train-once contract (a DAG materializing a `bpe_stats` input
    * twice must still train once) without scraping Spark job counts.
    */
  val trainInvocations = new java.util.concurrent.atomic.AtomicLong(0L)

  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 100000): BpeModel = {
    trainInvocations.incrementAndGet()
    require(numMerges >= 1, s"need at least one merge, got $numMerges")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
    val vocabRows = counts.limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"training vocabulary exceeds maxVocab=$maxVocab distinct words; " +
        "BPE training collects the word-count table to the driver (the " +
        "classic formulation) — raise maxVocab only if that table is " +
        "genuinely model-sized for your corpus")
    var words: Array[(Vector[String], Long)] = vocabRows
      .map(r => (codePointSyms(r.getString(0)), r.getLong(1)))
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var step = 0
    while (step < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      // (count DESC, pair ASC) — fully deterministic selection
      val best = pairCounts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          merges += ((l, r))
          words = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
          step += 1
        case _ => done = true
      }
    }
    BpeModel(merges.result(),
      words.map { case (syms, _) => (syms.mkString, syms) }.toMap)
  }

  /** Segment ONE word with the trained merge ranks (standard BPE
    * inference): start from characters, repeatedly merge the lowest-rank
    * adjacent pair until none is in the table. For training words this
    * reproduces the training segmentation; its purpose is words the
    * training corpus never saw.
    */
  def encodeWord(word: String, model: BpeModel): Seq[String] = {
    var syms = codePointSyms(word)
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) go = false
      else syms = mergeOnce(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  /** The model's segmentation table as a DataFrame (word, subwords ARRAY,
    * n_sub) — the broadcast side of every serving join. Unseen words are
    * NOT here; [[encodeDocs]] segments them on demand.
    */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession,
                 model: BpeModel): DataFrame = {
    import spark.implicits._
    model.vocabEncoding.toSeq.sortBy(_._1)
      .map { case (w, subs) => (w, subs) }
      .toDF("word", "subwords")
  }

  /** Distributed serving: explode `textCol` to words, broadcast-join the
    * model's segmentation table, and aggregate per document:
    * (doc_id, n_tokens, n_subwords, n_distinct_subwords). Corpus words
    * missing from the model (a serving corpus differing from training) are
    * segmented once per DISTINCT word via [[encodeWord]] and unioned into
    * the join side — still model-sized work, and the 100 TB side is never
    * anything but explode → broadcast join → partial/final aggregate.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  model: BpeModel, maxUnseen: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
    val vocab = vocabFrame(spark, model)
    import spark.implicits._
    // distinct UNSEEN words only — model-sized like the training vocab, and
    // ENFORCED (limit+require, the train() guard): a serving corpus whose
    // unseen-word set is corpus-scale would otherwise silently materialize
    // on the driver
    val unseenRows = toks.select("word").distinct()
      .join(vocab.select("word"), Seq("word"), "left_anti")
      .limit(maxUnseen + 1)
      .as[String].collect()
    require(unseenRows.length <= maxUnseen,
      s"serving corpus has more than maxUnseen=$maxUnseen distinct words " +
        "absent from the trained vocabulary; that set is segmented on the " +
        "driver and must stay model-sized — retrain on (a sample of) this " +
        "corpus or raise maxUnseen if it is genuinely model-sized")
    val unseen = unseenRows.sorted.map(w => (w, encodeWord(w, model))).toSeq
    val joinSide = broadcast(
      (if (unseen.isEmpty) vocab
       else vocab.unionByName(unseen.toDF("word", "subwords")))
        .select(col("word"), col("subwords"), size(col("subwords")).as("n_sub")))
    val joined = toks.join(joinSide, "word")
    val perDoc = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
    val distinctSubs = joined
      .select(col("doc_id"), explode(col("subwords")).as("sub"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sub")).as("n_distinct_subwords"))
    perDoc.join(distinctSubs, "doc_id")
  }

  /** The serving manifest as DuckDB SQL literals: (word, space-joined
    * segmentation) VALUES rows for every word the serving path can emit
    * (training vocab + the provided unseen words). The IVF pattern: the
    * oracle replays the AGGREGATION from the learned artifact, proving the
    * distributed serving path honest without re-running the greedy loop.
    */
  def manifestValuesSql(model: BpeModel, extraWords: Seq[String] = Nil): String = {
    def esc(s: String) = s.replace("'", "''")
    val rows =
      (model.vocabEncoding.toSeq.map { case (w, subs) => (w, subs) } ++
        extraWords.filterNot(model.vocabEncoding.contains)
          .map(w => (w, encodeWord(w, model))))
        .sortBy(_._1)
        .map { case (w, subs) => s"('${esc(w)}', '${esc(subs.mkString(" "))}')" }
    rows.mkString(",\n    ")
  }
}
