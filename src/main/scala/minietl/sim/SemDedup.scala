package minietl.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication", 2023):
  * cluster the embedding space with k-means, compare pairs ONLY inside a
  * cluster, connect pairs above a cosine threshold, and keep one canonical
  * representative (minimum id) per connected component.
  *
  * This is the published recipe's load-bearing idea re-expressed on the
  * engine's existing primitives: [[Ivf.train]]/[[Ivf.assignList]] bound the
  * quadratic — pairwise cosine runs within clusters of ~n/nlist rows, never
  * across the corpus — and [[minietl.dedup.Dedup.connectedComponents]]
  * makes the "keep one per duplicate set" decision transitive (A≈B, B≈C
  * drops both B and C even when A·C < τ), with its driver union-find fast
  * path / distributed star-contraction split. At 100 TB you raise nlist so
  * clusters stay executor-sized; the join key (cluster id) is the shuffle
  * key, so skew maps directly onto cluster balance — the same census-based
  * control the LSH paths use.
  *
  * Determinism contract: assignment ties go to the lower centroid index
  * (lexicographic struct min, [[Ivf.assignList]]); the cosine is rounded to
  * 4dp BEFORE the τ comparison with both engines folding the same double
  * sequence, so edge sets — and therefore components — can never diverge
  * at a near-tie.
  */
object SemDedup {

  /** One row per embedding: `(id, cluster, comp, keep)` — comp is the
    * minimum id reachable through within-cluster cosine-≥-τ edges (own id
    * if isolated), keep = 1 iff the row is its component's canonical.
    *
    * `maxClusterSize` is the hot-cluster census cap (VERDICT r14 Next #2)
    * — the same [[minietl.dedup.Dedup.DefaultMaxBucket]] contract every
    * banded path carries: a cluster with n members contributes n(n-1)/2
    * pair-join output rows, so ONE degenerate cluster (k-means collapses
    * on a near-constant embedding region — the exact failure mode the
    * first dHash corpus hit with 86% of images in one band bucket) turns
    * the bounded quadratic into an unbounded one regardless of nlist.
    * Rows of an over-cap cluster are excluded from PAIRING only: they
    * stay in the output as isolated keep=1 rows (a dedup stage must never
    * drop data it cannot compare), a documented recall trade the oracle
    * replays with the identical census. The census is a window over the
    * cluster id — the same key the pair join shuffles on, so the guard
    * adds no extra shuffle.
    */
  def semDedup(corpus: DataFrame, model: Ivf.Model, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxClusterSize: Int = minietl.dedup.Dedup.DefaultMaxBucket): DataFrame = {
    // the prepared frame feeds BOTH sides of the pair join plus the final
    // labeling join — persist it (released by the caller's RunCaches scope)
    // so the cast/norm/argmin scan runs once, not three times
    val a = corpus
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(minietl.functions.vec.dot(col("v"), col("v"))))
      .withColumn("cluster", Ivf.assignList(col("v"), model).cast("bigint"))
      .persist()
    minietl.pipeline.RunCaches.register(a)
    val paired = minietl.dedup.Dedup.dropOversizedBuckets(
      a, Seq("cluster"), maxClusterSize, "semdedup")
    val pairs = paired.as("x").join(paired.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.id") < col("y.id"))
      .withColumn("cos",
        round(minietl.functions.vec.dot(col("x.v"), col("y.v"))
          / (col("x.norm") * col("y.norm")), 4))
      .where(col("cos") >= tau)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val comp = minietl.dedup.Dedup.connectedComponents(pairs)
    a.select("id", "cluster").join(comp, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("comp"), col("id")).as("comp"),
        when(coalesce(col("comp"), col("id")) === col("id"), lit(1L))
          .otherwise(lit(0L)).as("keep"))
  }

  /** DuckDB replay of the SERVING path for a trained model (training is
    * spec-covered, same contract as [[Ivf.topKOracleSql]]): centroid
    * literals → argmin assignment with low-index ties → hot-cluster census
    * (same cap as the engine — over-cap clusters pair nothing, their rows
    * stay isolated) → within-cluster pairwise 4dp cosine → recursive
    * reachability CTE → min reachable id.
    */
  def oracleSql(model: Ivf.Model, tau: Double, table: String = "embeddings",
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxClusterSize: Int = minietl.dedup.Dedup.DefaultMaxBucket): String = {
    def vecLit(c: Vector[Double]): String =
      c.map(_.toString).mkString("CAST([", ",", "] AS DOUBLE[])")
    val scoreSelects = model.centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      s"  SELECT id, v, $i AS idx, ${c2.toString} - 2.0 * list_inner_product(v, ${vecLit(c)}) AS score FROM e"
    }.mkString("\n  UNION ALL\n")
    s"""WITH RECURSIVE e AS (
       |  SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |scores AS (
       |$scoreSelects
       |),
       |assign AS (
       |  SELECT id, v, idx AS cluster FROM (
       |    SELECT id, v, idx,
       |      row_number() OVER (PARTITION BY id ORDER BY score ASC, idx ASC) AS rn
       |    FROM scores) WHERE rn = 1),
       |big AS (SELECT cluster FROM assign GROUP BY cluster
       |        HAVING count(*) > $maxClusterSize),
       |paired AS (SELECT a.* FROM assign a ANTI JOIN big USING (cluster)),
       |pairs AS (
       |  SELECT x.id AS id_a, y.id AS id_b
       |  FROM paired x JOIN paired y
       |    ON x.cluster = y.cluster AND x.id < y.id
       |  WHERE round(list_cosine_similarity(x.v, y.v), 4) >= $tau),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT e2.a AS id, reach.r FROM edges e2 JOIN reach ON e2.b = reach.id),
       |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
       |SELECT a.id, CAST(a.cluster AS BIGINT) AS cluster,
       |  coalesce(c.comp, a.id) AS comp,
       |  CAST(CASE WHEN coalesce(c.comp, a.id) = a.id THEN 1 ELSE 0 END
       |    AS BIGINT) AS keep
       |FROM assign a LEFT JOIN comp c ON c.id = a.id
       |ORDER BY a.id""".stripMargin
  }
}
