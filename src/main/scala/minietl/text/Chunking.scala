package minietl.text

import minietl.ops.Ops
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation for training pipelines: split long documents
  * into (possibly overlapping) token-window chunks, and lay documents out
  * into fixed-capacity training sequences.
  *
  * Both operators are pure narrow transformations (explode / window over a
  * shard): no driver-side state, nothing global, linear in the corpus.
  */
object Chunking {

  /** Sliding token-window chunks: windows start at 0, stride, 2·stride, …
    * up to the FIRST start whose window reaches the document end; each holds
    * up to `chunkSize` whitespace tokens (only the final window can be
    * shorter). Every token is covered, consecutive windows overlap by
    * `chunkSize - stride` tokens, and no window is a subset of the previous
    * one — start generation stops once the prior window already covered the
    * end, so a 64-token doc at chunkSize=64/stride=48 yields ONE chunk, not
    * a second fully-contained duplicate (duplicated training text).
    *
    * Output: (id, chunk_idx, chunk, n_tokens). Row explosion is
    * size/stride per doc — a scan-side flatMap, no shuffle. A NULL text
    * yields NO chunks (the row is dropped — there is nothing to cover);
    * filter nulls first if they should surface differently.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize=$chunkSize], got $stride")
    val toks = Ops.freshName(df, "__toks")
    val start = Ops.freshName(df, "__start")
    val piece: Column = slice(col(toks), col(start) + 1, lit(chunkSize))
    // last start = the smallest stride multiple whose window reaches the end
    // (0 when the doc fits in one window): stride * ceil((len-chunkSize)/stride)
    val lastStart = when(size(col(toks)) > chunkSize,
      lit(stride) * floor((size(col(toks)) - lit(chunkSize) + lit(stride) - 1) / stride))
      .otherwise(lit(0)).cast("int")
    df.where(col(textCol).isNotNull)
      .withColumn(toks, split(trim(col(textCol)), " "))
      .withColumn(start, explode(sequence(lit(0), lastStart, lit(stride))))
      .select(col(idCol),
        (col(start) / stride).cast("bigint").as("chunk_idx"),
        array_join(piece, " ").as("chunk"),
        size(piece).cast("bigint").as("n_tokens"))
  }

  /** Sequence-packing manifest: documents are concatenated in `idCol` order
    * within each shard and cut into fixed `capacity`-token training
    * sequences; each document's row says which sequence it starts in
    * (`seq_idx`) and at which token offset (`offset`). Documents may span a
    * sequence boundary — that is the standard packed-pretraining layout
    * (the attention mask, not the layout, separates documents).
    *
    * The running total is a window sum PER SHARD: shards (e.g. a hash
    * bucket or an ingest partition) bound the window's sort to one
    * partition's worth of rows, so the plan stays distributed at any corpus
    * size. An empty `shardCols` packs globally — fine for tests, a
    * single-task sort at scale — so it is rejected unless explicitly
    * allowed.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Long, shardCols: Seq[String],
                    allowGlobal: Boolean = false): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(shardCols.nonEmpty || allowGlobal,
      "global packing is a single-task window; pass shardCols (e.g. a hash " +
        "bucket) or set allowGlobal=true to accept that")
    // explicit ROWS frame: the default RANGE frame makes tied idCol values
    // peers, so duplicate ids would include each other's token counts in
    // the running sum and produce overlapping offsets
    val w = (if (shardCols.nonEmpty) Window.partitionBy(shardCols.map(col): _*)
             else Window.partitionBy()).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Ops.freshName(df, "__n")
    val cum = Ops.freshName(df, "__cum")
    df.withColumn(n, size(split(trim(col(textCol)), " ")).cast("bigint"))
      .withColumn(cum, sum(col(n)).over(w) - col(n))
      .select(
        (col(idCol) +: shardCols.map(col)) ++ Seq(
          col(n).as("n_tokens"),
          expr(s"`$cum` DIV $capacity").as("seq_idx"),
          (col(cum) % capacity).as("offset")): _*)
  }
}
