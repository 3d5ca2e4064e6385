package minietl.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with DETERMINISTIC ±1 signs —
  * the embedding-space dimension reducer that precedes LSH / IVF / k-means
  * at scale (Achlioptas 2003: a ±1 sign matrix satisfies the JL lemma with
  * the same guarantees as Gaussian entries and none of the float-generation
  * ambiguity). `y[j] = (Σ_i v[i]·s(j,i)) / √dimOut`, where
  * `s(j,i) = +1 iff md5-60("rp<seed>:<j>:<i>") is even` — the engine's
  * portable hash contract ([[minietl.functions.PortableHash]]), so ANY
  * engine regenerates the identical matrix from (seed, dims) alone: no
  * stored model, no RNG state, no broadcast.
  *
  * Scale design: the sign matrix is dimOut × dimIn literals INLINED into
  * the plan (model-sized by construction: 8×64 here); projection is one
  * scan-local native-expression pass — zero shuffles, zero UDFs. At 100 TB
  * you project at ingest and run every downstream similarity operator on
  * the narrow vectors.
  *
  * Float determinism: each output component folds `v[i]·(±1)` SEQUENTIALLY
  * in i order (Spark `aggregate`, DuckDB `list_reduce` — both strict left
  * folds), then one multiply by the same `1/√dimOut` literal — bit-identical
  * everywhere.
  */
object RandomProjection {

  /** The ±1 sign for output row j, input column i, under `seed`. */
  def sign(seed: Int, j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp$seed:$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.take(15), 16) % 2 == 0) 1 else -1
  }

  /** The full sign matrix (dimOut rows of dimIn ±1 entries). */
  def signMatrix(seed: Int, dimIn: Int, dimOut: Int): Vector[Vector[Int]] =
    Vector.tabulate(dimOut)(j => Vector.tabulate(dimIn)(i => sign(seed, j, i)))

  /** Projected vector as an array<double> column of length dimOut. */
  def project(vecCol: Column, seed: Int, dimIn: Int, dimOut: Int): Column = {
    require(dimIn > 0 && dimOut > 0, s"dims must be positive: $dimIn -> $dimOut")
    val m = signMatrix(seed, dimIn, dimOut)
    val scale = 1.0 / math.sqrt(dimOut.toDouble)
    val v = transform(vecCol, x => x.cast("double"))
    array(m.map { row =>
      aggregate(
        zip_with(v, typedlit(row.map(_.toDouble)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x) * lit(scale)
    }: _*)
  }

  /** The dimOut component columns individually — for sinks that want flat
    * columns. Preferred over `element_at(project(...), k)` in a projection:
    * CollapseProject inlines the captured array expression once PER
    * EXTRACTION, re-running all dimOut folds for each component (the HOF
    * re-evaluation trap [[minietl.functions.WinnowOrds]] documents); these
    * are dimOut independent folds, evaluated once each.
    */
  def components(vecCol: Column, seed: Int, dimIn: Int, dimOut: Int): Seq[Column] = {
    require(dimIn > 0 && dimOut > 0, s"dims must be positive: $dimIn -> $dimOut")
    val m = signMatrix(seed, dimIn, dimOut)
    val scale = 1.0 / math.sqrt(dimOut.toDouble)
    val v = transform(vecCol, x => x.cast("double"))
    m.map { row =>
      aggregate(
        zip_with(v, typedlit(row.map(_.toDouble)), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x) * lit(scale)
    }
  }

  /** Frame helper: `(idCol, y: array<double>[dimOut])`. */
  def projectFrame(df: DataFrame, idCol: String, vecCol: String, seed: Int,
      dimIn: Int, dimOut: Int): DataFrame =
    df.select(col(idCol), project(col(vecCol), seed, dimIn, dimOut).as("y"))

  /** DuckDB twin: regenerates the SAME sign matrix as literals (the hash
    * is not re-derived SQL-side — the matrix is deterministic in (seed,
    * dims), so inlining is exact, the same move as the trained-centroid
    * oracles) and replays the sequential fold and the √dimOut scale.
    * Returns one SQL expression per output component over fragment
    * `vecSql` (a DOUBLE[] expression).
    */
  def componentOracleExprs(vecSql: String, seed: Int, dimIn: Int,
      dimOut: Int): Seq[String] = {
    val m = signMatrix(seed, dimIn, dimOut)
    val scale = (1.0 / math.sqrt(dimOut.toDouble)).toString
    m.map { row =>
      val signs = row.map(_.toDouble.toString).mkString("CAST([", ",", "] AS DOUBLE[])")
      s"""(list_reduce(list_prepend(0.0,
         |  list_transform(range(0, $dimIn),
         |    i -> ($vecSql)[i + 1] * ($signs)[i + 1])),
         |  (acc, x) -> acc + x) * $scale)""".stripMargin
    }
  }
}
