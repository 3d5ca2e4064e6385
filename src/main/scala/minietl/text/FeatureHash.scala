package minietl.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import minietl.functions.PortableHash

/** Hashing-trick document featurization: a fixed-dimension term-frequency
  * vector where slot(token) = portableHash(token) mod dim. The standard
  * bridge from raw text to a fixed-width feature space with NO vocabulary
  * pass — at 100 TB there is no driver-side dictionary to build, broadcast,
  * or keep consistent across runs; the hash IS the vocabulary.
  *
  * The hash is the engine-portable md5-60-bit contract
  * ([[minietl.functions.PortableHash]]), so the whole vectorization replays
  * bit-for-bit in any SQL engine (see [[oracleExpr]]).
  *
  * Cost note: the slot array is hashed ONCE per token; the dense vector is
  * then a single O(tokens + dim) native-expression pass
  * ([[minietl.functions.SlotHistogram]]). Dense output is still
  * dim × 8 bytes per row — for dims in the tens of thousands prefer a
  * sparse layout (explode the slots and aggregate) so row width stays
  * bounded.
  */
object FeatureHash {

  /** Slot index per token, hashed once: array<bigint> in [0, dim). */
  def slots(text: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    transform(TextAnalysis.tokens(text), t => PortableHash.md5Hash60(t) % dim)
  }

  /** Dense term-frequency vector (array<bigint>, length dim): element s =
    * number of tokens hashing to slot s. One native-expression pass over
    * the slot array — O(tokens + dim) per document. The earlier
    * `transform(sequence(...), s -> size(filter(slots, ...)))` column
    * formulation re-evaluated the CAPTURED slots array (md5 per token)
    * once per slot after CollapseProject inlined it — O(dim × tokens) md5
    * calls per document, the same HOF re-evaluation trap
    * [[minietl.functions.WinnowOrds]] documents (exposed when the r12
    * Bench switched from count() to full-output checksums: 7.9 s warm at
    * sf0.1/dim=32 under count-pruning-immune timing, ~0.6 s with this).
    */
  def tfVector(text: Column, dim: Int): Column =
    minietl.functions.vec.slotHistogram(slots(text, dim), dim)

  /** Number of non-empty slots (distinct hashed terms — a cheap lexical
    * diversity signal under the same portable contract).
    */
  def nnz(text: Column, dim: Int): Column =
    size(array_distinct(slots(text, dim))).cast("bigint")

  /** DuckDB twin of [[tfVector]] over SQL fragment `textSql`. */
  def oracleExpr(textSql: String, dim: Int): String =
    s"""list_transform(range(0, $dim), s -> CAST(len(list_filter(
       |  list_transform(string_split($textSql, ' '),
       |                 t -> ${PortableHash.sql("t")} % $dim),
       |  h -> h = s)) AS BIGINT))""".stripMargin

  /** DuckDB twin of [[nnz]]. */
  def nnzOracleExpr(textSql: String, dim: Int): String =
    s"""CAST(len(list_distinct(list_transform(string_split($textSql, ' '),
       |  t -> ${PortableHash.sql("t")} % $dim))) AS BIGINT)""".stripMargin
}
