package minietl.sim

import org.apache.spark.sql.Column
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
    * `scaleA * scaleB / (127*127)` to approximate the real dot).
    */
  def int8Dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("bigint") * y.cast("bigint")),
      lit(0L), (acc, v) => acc + v)
}
