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
  * Cost note: the slot array is hashed ONCE per token; building the dense
  * vector is then an O(dim × tokens) comparison fold inside codegen. That is
  * the right trade for dim ≤ a few hundred (the common hashing-trick sizes
  * here). For dims in the tens of thousands, explode the slots and pivot —
  * the dense per-row fold stops being scan-cheap.
  */
object FeatureHash {

  /** Slot index per token, hashed once: array<bigint> in [0, dim). */
  def slots(text: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    transform(TextAnalysis.tokens(text), t => PortableHash.md5Hash60(t) % dim)
  }

  /** Dense term-frequency vector (array<bigint>, length dim): element s =
    * number of tokens hashing to slot s.
    */
  def tfVector(text: Column, dim: Int): Column = {
    val sl = slots(text, dim)
    transform(sequence(lit(0), lit(dim - 1)),
      s => size(filter(sl, h => h === s)).cast("bigint"))
  }

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
