package minietl.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import minietl.functions.PortableHash

/** Multinomial Naive Bayes over hashing-trick token features — the first
  * trained-model-in-the-loop classifier in the engine (the reference
  * pipeline filters with static rules only; corpus pipelines at scale
  * routinely score documents with a cheap supervised classifier for
  * language/quality routing, cf. the fastText filters in CCNet/RefinedWeb).
  *
  * Spark-first design, and why it holds at 100 TB:
  *   - TRAINING is two hash-partitioned aggregations (token-slot counts per
  *     label, then a per-label densify into a dim-length weight vector) —
  *     no driver-side vocabulary, no iteration, one shuffle keyed on
  *     (label, slot). The model is `n_labels` rows of `dim` doubles:
  *     model-sized by construction, independent of corpus size.
  *   - SERVING broadcasts that model and scores each document with one
  *     native-expression pass (`zip_with` + sequential `aggregate` fold) —
  *     zero shuffles beyond the per-document argmax's partial-aggregated
  *     groupBy, zero UDFs, whole-stage codegen throughout.
  *
  * Everything is engine-portable and therefore oracle-verifiable:
  *   - features use the [[PortableHash]] md5-60-bit slot contract (the hash
  *     IS the vocabulary — see [[FeatureHash]]);
  *   - smoothed weights are `ln((c+1)/(total+dim))` over exact integer
  *     counts, so both engines feed `ln` identical doubles;
  *   - the document score folds `logPrior + Σ tf[s]·w[s]` SEQUENTIALLY in
  *     slot order (Spark `aggregate`, DuckDB `list_reduce` — both strict
  *     left folds; FP addition is commutative per step, and the step ORDER
  *     is pinned, so the bits match);
  *   - argmax ties break on label ascending in both engines.
  */
object NaiveBayes {

  /** Train on `labelCol`/`textCol`: returns the model as a DataFrame of
    * `(label, log_prior: double, w: array<double> length dim)` — one row
    * per label, broadcastable by construction.
    */
  def train(df: DataFrame, labelCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val slotted = df.select(col(labelCol).as("label"),
      explode(FeatureHash.slots(col(textCol), dim)).as("slot"))
    val counts = slotted.groupBy("label", "slot").agg(count(lit(1)).as("c"))
    // densify: map lookup over the 0..dim-1 slot sequence (missing slot = 0)
    val perLabel = counts.groupBy("label").agg(
      map_from_entries(collect_list(struct(col("slot"), col("c")))).as("m"),
      sum("c").as("total"))
    val priors = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_all"))))
      .select(col("label"),
        log(col("n_docs").cast("double") / col("n_all").cast("double"))
          .as("log_prior"))
    // LEFT join from priors (ADVICE r14): priors cover every label seen in
    // the frame, per-label counts only labels with at least one token. An
    // inner join would silently erase a label whose documents are all
    // null/empty text — and every row of that label would then be dropped
    // by an agreement filter (pred can never equal a missing label). Under
    // the left join such a label keeps its prior and gets the uniform
    // smoothed weights ln(1/dim): total=0, every slot count 0.
    priors.join(perLabel, Seq("label"), "left")
      .select(col("label"), col("log_prior"),
        transform(sequence(lit(0), lit(dim - 1)), s =>
          log((coalesce(element_at(col("m"), s.cast("long")), lit(0L)) + lit(1.0))
            / (coalesce(col("total"), lit(0L)) + lit(dim.toDouble)))).as("w"))
  }

  /** Score every document against every label and keep the argmax:
    * `(idCol, pred: string, score: double)`. The model is COLLECTED
    * (n_labels rows — model-sized by construction, the same contract as
    * [[minietl.sim.Ivf]]'s centroid inlining) and each label's weight
    * vector is inlined as literals, so serving is ONE scan with ZERO
    * shuffles: per row, n_labels sequential folds and a lexicographic
    * `array_min` over `(-score, label, score)` structs — the earlier
    * crossJoin-then-groupBy formulation shuffled the whole corpus keyed on
    * the document id just to argmax n_labels rows it had itself produced.
    * Tie-break unchanged: score desc, then label asc.
    */
  def classify(df: DataFrame, model: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val labels = model.collect().map { r =>
      (r.getAs[String]("label"), r.getAs[Double]("log_prior"),
        r.getAs[scala.collection.Seq[Double]]("w").toVector)
    }.sortBy(_._1)
    require(labels.nonEmpty, "empty model — train() saw no rows")
    // `let` binds a subexpression to a lambda variable so it is evaluated
    // ONCE no matter how many times the body references it — CollapseProject
    // would otherwise inline the tf vector n_labels times and each score
    // fold twice (the HOF re-evaluation trap FeatureHash documents)
    def let(e: Column)(f: Column => Column): Column =
      element_at(transform(array(e), f), 1)
    val best = let(FeatureHash.tfVector(col(textCol), dim)) { tfv =>
      array_min(array(labels.map { case (label, prior, w) =>
        let(aggregate(zip_with(tfv, typedlit(w), (t, wt) => t * wt),
          lit(prior), (acc, x) => acc + x)) { s =>
          struct((-s).as("ns"), lit(label).as("pred"), s.as("sc"))
        }
      }: _*))
    }
    df.select(col(idCol), best.as("b"))
      .select(col(idCol), col("b.pred").as("pred"), col("b.sc").as("score"))
  }

  /** Full train-then-serve DuckDB replay over `table`: identical slot
    * hashing, identical smoothing arithmetic, and a `list_reduce` fold
    * seeded with the prior — the same sequential step order as
    * [[classify]]'s `aggregate`. `roundTo` rounds the reported score only
    * (the argmax compares unrounded doubles in both engines).
    */
  def oracleSql(table: String, labelCol: String, idCol: String,
      textSql: String, dim: Int, roundTo: Int = 4): String = {
    val slot = s"${PortableHash.sql("t")} % $dim"
    s"""WITH slotted AS (
       |  SELECT $labelCol AS label,
       |         unnest(list_transform(string_split($textSql, ' '), t -> $slot)) AS slot
       |  FROM $table),
       |counts AS (SELECT label, slot, count(*) AS c FROM slotted GROUP BY 1, 2),
       |priors AS (
       |  SELECT $labelCol AS label,
       |         ln(count(*) * 1.0 / (SELECT count(*) FROM $table)) AS log_prior
       |  FROM $table GROUP BY 1),
       |totals AS (
       |  SELECT p.label, coalesce(sum(c.c), 0) AS total
       |  FROM priors p LEFT JOIN counts c ON c.label = p.label GROUP BY 1),
       |wflat AS (
       |  SELECT t.label, s.s AS slot,
       |         ln((coalesce(c.c, 0) + 1.0) / (t.total + $dim.0)) AS wt
       |  FROM totals t
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS s) s
       |  LEFT JOIN counts c ON c.label = t.label AND c.slot = s.s),
       |model AS (
       |  SELECT w.label, p.log_prior, list(w.wt ORDER BY w.slot) AS w
       |  FROM wflat w JOIN priors p ON p.label = w.label
       |  GROUP BY w.label, p.log_prior),
       |feats AS (
       |  SELECT $idCol, ${FeatureHash.oracleExpr(textSql, dim)} AS tf
       |  FROM $table),
       |scored AS (
       |  SELECT f.$idCol, m.label,
       |         list_reduce(
       |           list_prepend(m.log_prior,
       |             list_transform(range(0, $dim), s -> f.tf[s + 1] * m.w[s + 1])),
       |           (acc, x) -> acc + x) AS score
       |  FROM feats f CROSS JOIN model m),
       |best AS (
       |  SELECT $idCol, label AS pred, score,
       |         row_number() OVER (PARTITION BY $idCol
       |                            ORDER BY score DESC, label) AS rn
       |  FROM scored)
       |SELECT $idCol, pred, round(score, $roundTo) AS score
       |FROM best WHERE rn = 1""".stripMargin
  }
}
