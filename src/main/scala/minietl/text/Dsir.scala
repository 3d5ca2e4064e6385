package minietl.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import minietl.functions.PortableHash

/** DSIR-style data selection: score every raw document by the hashed-n-gram
  * importance log-ratio between a TARGET domain and the RAW corpus, then
  * keep the top-k (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", 2023 — the hashed-feature log-likelihood-ratio
  * estimator; we take the deterministic top-k variant instead of
  * Gumbel-noised resampling so the selection is exactly replayable, which
  * is also what makes it oracle-verifiable).
  *
  * Why this shape survives 100 TB:
  *   - both feature distributions are ONE hash-partitioned count aggregation
  *     each (target is a filter over the same scan — Catalyst shares it);
  *     the learned artifact is a single dim-length log-ratio vector, i.e.
  *     model-sized and broadcast to every scorer;
  *   - scoring is a native-expression pass per document (no shuffle), and
  *     top-k is TakeOrdered (per-partition heaps + driver merge of k rows,
  *     never a global sort of the corpus);
  *   - the hash IS the vocabulary ([[FeatureHash]]) — no driver dictionary.
  *
  * Float determinism mirrors [[NaiveBayes]]: integer counts → identical
  * smoothed `ln` inputs; the per-document score folds `Σ tf[s]·ratio[s]`
  * sequentially in slot order in both engines.
  *
  * SIZING `dim` (measured, r15 nb_dsir_dim probe at 1M docs — table in
  * PLANS.md): DSIR selection is strongly dim-sensitive — the top-k overlap
  * vs dim=1024 is only ~20-36% at dims 64/256, because narrow hashed
  * features drown the log-ratio in collision noise, while 1024 costs only
  * ~2x the wall. Spend the dim here (config default 1024; the YAML stage
  * warns below 512). NaiveBayes routing over the same features is
  * dim-INsensitive (99.98% identical predictions 64→1024) — 64 suffices
  * there.
  */
object Dsir {

  /** The learned log-ratio vector: one row, `r: array<double>` of length
    * dim, where `r[s] = ln p_target(s) - ln p_raw(s)` under +1 smoothing.
    * `targetFilter` defines the target domain over the same corpus.
    */
  def logRatio(df: DataFrame, textCol: String, targetFilter: Column,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    def dist(src: DataFrame): DataFrame = {
      val cnt = src
        .select(explode(FeatureHash.slots(col(textCol), dim)).as("slot"))
        .groupBy("slot").agg(count(lit(1)).as("c"))
      cnt.groupBy()
        .agg(map_from_entries(collect_list(struct(col("slot"), col("c")))).as("m"),
          sum("c").as("total"))
        .select(transform(sequence(lit(0), lit(dim - 1)), s =>
          log((coalesce(element_at(col("m"), s.cast("long")), lit(0L)) + lit(1.0))
            / (col("total") + lit(dim.toDouble)))).as("logp"))
    }
    dist(df.where(targetFilter)).as("t")
      .crossJoin(dist(df).as("r"))
      .select(zip_with(col("t.logp"), col("r.logp"), (a, b) => a - b).as("r"))
  }

  /** Score each document with the log-ratio vector and keep the top-k by
    * (score desc, id asc): `(idCol, score, rank)`. The ratio frame is ONE
    * row — collected and inlined as a literal (the same model-sized
    * inlining as [[NaiveBayes.classify]] / Ivf centroids), so scoring is a
    * single scan with zero joins; top-k is TakeOrdered — never a full sort.
    */
  def select(df: DataFrame, ratio: DataFrame, idCol: String, textCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rv = ratio.collect() match {
      case Array(row) => row.getAs[scala.collection.Seq[Double]]("r").toVector
      case other => throw new IllegalArgumentException(
        s"ratio must be exactly one row (got ${other.length}) — use logRatio()")
    }
    val scored = df.select(col(idCol),
      aggregate(
        zip_with(FeatureHash.tfVector(col(textCol), dim), typedlit(rv),
          (t, w) => t * w),
        lit(0.0), (acc, x) => acc + x).as("score"))
    val top = scored.orderBy(col("score").desc, col(idCol)).limit(k)
    // rank within the k survivors: k rows, a window here is driver-cheap
    top.select(col(idCol), col("score"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col(idCol))).as("rank"))
  }

  /** Full DuckDB replay: both distributions, the log-ratio vector, the
    * sequential score fold, and the same (score desc, id asc) top-k.
    * `targetSql` is the SQL twin of the Scala `targetFilter`.
    */
  def oracleSql(table: String, idCol: String, textSql: String,
      targetSql: String, dim: Int, k: Int, roundTo: Int = 4): String = {
    val slot = s"${PortableHash.sql("t")} % $dim"
    def dist(name: String, where: String): String =
      s"""${name}_cnt AS (
         |  SELECT unnest(list_transform(string_split($textSql, ' '), t -> $slot)) AS slot
         |  FROM $table $where),
         |${name}_c AS (SELECT slot, count(*) AS c FROM ${name}_cnt GROUP BY 1),
         |${name}_t AS (SELECT sum(c) AS total FROM ${name}_c),
         |$name AS (
         |  SELECT list(ln((coalesce(c.c, 0) + 1.0) / (t.total + $dim.0))
         |              ORDER BY s.s) AS logp
         |  FROM (SELECT unnest(range(0, $dim)) AS s) s
         |  LEFT JOIN ${name}_c c ON c.slot = s.s
         |  CROSS JOIN ${name}_t t)""".stripMargin
    s"""WITH ${dist("tgt", s"WHERE $targetSql")},
       |${dist("raw", "")},
       |ratio AS (
       |  SELECT list_transform(range(0, $dim),
       |           s -> tgt.logp[s + 1] - raw.logp[s + 1]) AS r
       |  FROM tgt CROSS JOIN raw),
       |feats AS (
       |  SELECT $idCol, ${FeatureHash.oracleExpr(textSql, dim)} AS tf
       |  FROM $table),
       |scored AS (
       |  SELECT f.$idCol,
       |         list_reduce(
       |           list_prepend(0.0,
       |             list_transform(range(0, $dim), s -> f.tf[s + 1] * r.r[s + 1])),
       |           (acc, x) -> acc + x) AS score
       |  FROM feats f CROSS JOIN ratio r),
       |top AS (
       |  SELECT $idCol, score,
       |         row_number() OVER (ORDER BY score DESC, $idCol) AS rank
       |  FROM scored)
       |SELECT $idCol, round(score, $roundTo) + 0.0 AS score, rank
       |FROM top WHERE rank <= $k""".stripMargin
  }
}
