package minietl.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns: 4× smaller
  * vectors (and integer SIMD dot products downstream) at ~1% cosine error —
  * the standard first compression step for a 100 TB embedding store.
  *
  * Element-wise scan work only, no shuffle. Arithmetic is pinned for
  * cross-engine replay: float→double casts are exact, `x * 127.0 / scale`
  * is two exactly-rounded IEEE ops, and `round` is half-away-from-zero in
  * both Spark (HALF_UP) and DuckDB.
  *
  * Reference analog: none — training-data-pipeline extension
  * (SURVEY.md §7.5).
  */
object Quantize {

  /** max |v_i| as double — the per-vector scale (0.0 for all-zero vectors). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes in [-127, 127]: round(v_i * 127 / scale). All-zero vectors
    * (scale 0) quantize to all zeros rather than dividing by zero.
    */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0))
        .otherwise(round(x.cast("double") * lit(127.0) / s).cast("int")))
  }

  /** Reconstruction: code_i * scale / 127 (exactly the decode any consumer
    * applies; pair with [[int8Codes]]'s scale).
    */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale / lit(127.0))

  /** Integer dot product of two code arrays — a 64-bit exact sum, the cheap
    * pre-ranking score for quantized ANN (rescale by
    * `scaleA * scaleB / (127*127)` to approximate the real dot). A native
    * codegen expression ([[minietl.functions.DotProductInt]]): inside the
    * all-pairs pre-rank join this runs per PAIR, where an interpreted
    * higher-order fold would dominate the query.
    */
  def int8Dot(a: Column, b: Column): Column =
    minietl.functions.vec.dotInt(a, b)

  /** Two-stage quantized top-k cosine: the all-pairs stage ranks by the
    * INT8 approximate cosine (integer dots — per-vector scales cancel in
    * the ratio), keeps `preK` candidates per query, and only those pay the
    * full-precision cosine for the final top-`k`.
    *
    * Scale shape: same broadcast-queries corpus scan as
    * [[Similarity.bruteForceTopK]], but the scan-side pair work reads 1
    * byte/element instead of 8 and multiplies integers — the memory-bound
    * stage gets ~4-8× lighter, which is the whole point of quantizing a
    * 100 TB embedding store. The pre-rank frame carries ONLY
    * (q_id, n_id, acos) through its ranking exchange — shuffling the code
    * and float arrays per PAIR is what the 1000× probe caught (50M
    * ~KB-sized rows through one window partition per query: 23.6× wall
    * time for 10× data at 5M vectors; still 70 s slimmed-but-unsplit);
    * the preK × |queries| survivors broadcast back onto one more corpus
    * scan to fetch full-precision vectors for the exact stage. At 100 TB
    * the codes column would be a persisted table and both scans read it,
    * not recompute it. Both stages use exactly-rounded arithmetic with
    * total tie orders (approx cosine 6dp, id tie-break), so the result
    * replays bit-for-bit in any engine.
    */
  def int8RerankTopK(corpus: DataFrame, queries: DataFrame, k: Int, preK: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(preK >= k, s"preK ($preK) must be >= k ($k)")
    def prep(df: DataFrame, idAs: String, pfx: String): DataFrame =
      df.select(col(idCol).as(idAs),
          transform(col(vecCol), x => x.cast("double")).as(s"${pfx}_vec"),
          int8Codes(col(vecCol)).as(s"${pfx}_codes"))
        .withColumn(s"${pfx}_norm",
          sqrt(minietl.functions.vec.dot(col(s"${pfx}_vec"), col(s"${pfx}_vec"))))
        .withColumn(s"${pfx}_cnorm",
          sqrt(int8Dot(col(s"${pfx}_codes"), col(s"${pfx}_codes")).cast("double")))
    val q = prep(queries, "q_id", "q")
    val c = prep(corpus, "n_id", "n")
    val pre = c.select(col("n_id"), col("n_codes"), col("n_cnorm"))
      .join(broadcast(q.select(col("q_id"), col("q_codes"), col("q_cnorm"))),
        col("q_id") =!= col("n_id"))
      .withColumn("acos",
        round(int8Dot(col("q_codes"), col("n_codes")).cast("double") /
          (col("q_cnorm") * col("n_cnorm")), 6))
      .select(col("q_id"), col("n_id"), col("acos"))
    val candidates = Similarity
      .topKPerQuery(pre, preK, Seq(col("acos").desc, col("n_id").asc))
      .drop("rank", "acos")
    val fetched = c.select(col("n_id"), col("n_vec"), col("n_norm"))
      .join(broadcast(candidates), "n_id")
      .join(broadcast(q.select(col("q_id"), col("q_vec"), col("q_norm"))), "q_id")
    val wFin = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    fetched
      .withColumn("cos",
        round(minietl.functions.vec.dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm")), 4))
      .withColumn("rank", row_number().over(wFin).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
