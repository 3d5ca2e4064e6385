package minietl.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - brute-force exact top-k: one scan of the corpus per query batch, with
  *    the (small) query set broadcast — the correctness baseline;
  *  - LSH-bucketed ANN: a random-hyperplane bit signature computed scan-side
  *    buckets the corpus; queries probe only their own bucket, turning an
  *    O(corpus) scan per query into O(corpus / 2^bits) — the scale path.
  *
  * All vector math is double-precision higher-order-function expressions
  * (zip_with / aggregate) over the float arrays: stays in codegen, no UDF.
  */
object Similarity {

  /** Double-precision dot product of two float arrays (sequential fold —
    * deterministic, matches a scalar loop).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product of two already-double arrays (see [[prepared]]): a native
    * codegen expression ([[minietl.functions.DotProductDouble]]) — inside a
    * pairwise join the interpreted higher-order-function fold is the
    * dominant cost, a generated tight loop is not.
    */
  def dotD(a: Column, b: Column): Column = minietl.functions.vec.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-row similarity prep: cast the float vector to double ONCE and
    * precompute its norm. Every pairwise comparison after a join then costs a
    * single fused dot product instead of three (dot + both norms) plus
    * 2×dim element casts — the dominant per-pair cost in any all-pairs or
    * bucketed similarity plan. Arithmetic is bit-identical to [[cosine]]
    * (same cast, same fold order, same sqrt).
    */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        transform(col(vecCol), x => x.cast("double")).as(vecAs))
      .withColumn(normAs, sqrt(dotD(col(vecAs), col(vecAs))))

  /** L2-normalize once up front: downstream cosine becomes a plain dot
    * product — at 100 TB you normalize at ingest, not per comparison.
    */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Exact brute-force top-k cosine neighbors.
    *
    * `queries` is expected to be small (it is broadcast); the corpus is
    * scanned exactly once. Ranking uses the 4dp-rounded cosine with the
    * neighbor id as tie-break so results are reproducible across partition
    * orders and engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = prepared(queries, idCol, vecCol, "q_id", "q_vec", "q_norm")
    val c = prepared(corpus, idCol, vecCol, "n_id", "n_vec", "n_norm")
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(dotD(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** `bits` fixed pseudo-random hyperplanes, deterministic in `seed`; each
    * plane is a +-1 vector derived from splitmix64, which is enough for
    * bucketing (what matters is that both sides hash identically).
    */
  private def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(bits, dim)(if ((next() & 1L) == 0L) 1.0 else -1.0)
  }

  /** Random-hyperplane signature (int bucket id in [0, 2^bits)). */
  def lshSignature(vec: Column, bits: Int, dim: Int, seed: Long = 42L): Column =
    lshSignatureD(transform(vec, x => x.cast("double")), bits, dim, seed)

  /** Signature over an already-double vector (see [[prepared]]). */
  private def lshSignatureD(vec: Column, bits: Int, dim: Int, seed: Long): Column = {
    val planes = hyperplanes(bits, dim, seed)
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(vec, typedlit(p.toSeq), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _).cast("int")
  }

  /** ANN top-k via LSH buckets: candidates come only from the query's
    * bucket; exact cosine ranks them. Recall is tunable by `bits` (fewer
    * bits = bigger buckets = higher recall, more work). The returned plan
    * shuffles corpus and queries once each on the bucket id — a co-located
    * equi-join, no crossJoin anywhere.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    val c = prepared(corpus, idCol, vecCol, "n_id", "n_vec", "n_norm")
      .withColumn("bucket", lshSignatureD(col("n_vec"), bits, dim, seed))
    val q = prepared(queries, idCol, vecCol, "q_id", "q_vec", "q_norm")
      .withColumn("bucket", lshSignatureD(col("q_vec"), bits, dim, seed))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        round(dotD(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * LSH signature (near-identical vectors land in the same bucket with
    * high probability; increase recall by lowering `bits`).
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, bits: Int, dim: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         seed: Long = 42L): DataFrame = {
    val sig = prepared(df, idCol, vecCol, "id", "vec", "nrm")
      .withColumn("bucket", lshSignatureD(col("vec"), bits, dim, seed))
    val a = sig.as("a")
    val b = sig.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos",
        round(dotD(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Embedding-level dedup: keep one representative per cosine-near-dup
    * cluster (transitive, via connected components over the bucketed pair
    * list); rows in no cluster pass through.
    */
  def cosineDedup(df: DataFrame, threshold: Double, bits: Int, dim: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  seed: Long = 42L): DataFrame =
    minietl.dedup.Dedup.dropClusterDuplicates(df,
      cosineNearDupPairs(df, threshold, bits, dim, idCol, vecCol, seed), idCol)

  /** Exact all-pairs near-dup (no bucketing) — correctness oracle for small
    * corpora and tests; O(n^2), do not use at scale.
    */
  def cosineNearDupPairsExact(df: DataFrame, threshold: Double,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = prepared(df, idCol, vecCol, "id_a", "va", "na_")
    val b = prepared(df, idCol, vecCol, "id_b", "vb", "nb_")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dotD(col("va"), col("vb")) / (col("na_") * col("nb_")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
