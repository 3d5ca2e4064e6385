package minietl.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional scan pruning.
  *
  * A table sorted by one column prunes min/max (parquet row-group / file)
  * statistics on THAT column only; a 100 TB fact table queried by two
  * independent dimensions wants a Z-ORDER (Morton) layout instead — sort by
  * the bit-interleaving of both dimensions and every written chunk spans a
  * narrow range of EACH, so either predicate prunes. This is the same idea
  * Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; here it is a plain
  * deterministic integer expression, so writing a z-clustered table is just
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z").write...`.
  *
  * The key is pure 64-bit integer arithmetic (shifts, masks, adds) —
  * order-independent and engine-portable, with [[zOrderSqlTwin]] emitting
  * the identical computation as SQL for replay/verification.
  */
object Layout {

  /** Morton key interleaving the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. `bits <= 31` keeps the key inside a positive BIGINT. Values are
    * masked to `bits` (callers quantize wider domains first).
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zOrderKey bits out of [1,31]: $bits")
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The identical computation as engine-neutral SQL over integer column
    * fragments `x` and `y` (same contract as PortableHash.sql).
    */
  def zOrderSqlTwin(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
}
