package minietl.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import minietl.io.{Readers, Writers}
import minietl.ops.Ops
import minietl.schema.{SchemaValidator, TableSchema}

/** Fluent sugar over [[Pipeline]] (reference: mini_etl/core/pipeline.py:281-374
  * `PipelineBuilder` — from_csv/from_json/from_sql, filter/rename/select/drop/
  * transform, to_csv/to_parquet/to_sql, build).
  */
final class PipelineBuilder(name: String = "pipeline") {
  private var p = new Pipeline(name)

  // ------------------------------------------------------------- sources
  def fromCsv(path: String, options: Map[String, String] = Map.empty): PipelineBuilder =
    { p = p.setSource(s => Readers.csv(s, path, options = options)); this }
  def fromJson(path: String, lines: Boolean = true): PipelineBuilder =
    { p = p.setSource(s => Readers.json(s, path, lines = lines)); this }
  def fromParquet(path: String, columns: Seq[String] = Nil): PipelineBuilder =
    { p = p.setSource(s => Readers.parquet(s, path, columns)); this }
  def fromJdbc(url: String, table: Option[String] = None, query: Option[String] = None,
               options: Map[String, String] = Map.empty): PipelineBuilder =
    { p = p.setSource(s => Readers.jdbc(s, url, table, query, options)); this }
  def fromDataFrame(df: DataFrame): PipelineBuilder =
    { p = p.setSource(_ => df); this }
  def fromSource(f: SparkSession => DataFrame): PipelineBuilder =
    { p = p.setSource(f); this }

  // -------------------------------------------------------- transformers
  def filter(condition: String): PipelineBuilder = add(Ops.filterExpr(condition))
  def filter(condition: Column): PipelineBuilder = add(Ops.filter(condition))
  def rename(columns: Map[String, String]): PipelineBuilder = add(Ops.rename(columns))
  def select(columns: Seq[String], ignoreMissing: Boolean = true): PipelineBuilder =
    add(Ops.select(columns, ignoreMissing))
  def drop(columns: Seq[String]): PipelineBuilder = add(Ops.drop(columns))
  def cast(columns: Map[String, String]): PipelineBuilder = add(Ops.castCoerce(columns))
  def fillna(value: Any, columns: Seq[String] = Nil): PipelineBuilder =
    add(Ops.fillna(value, columns))
  def expression(e: String): PipelineBuilder = add(Ops.expression(e))
  def groupAgg(groupBy: Seq[String], agg: Map[String, Seq[String]]): PipelineBuilder =
    add(Ops.groupAgg(groupBy, agg))
  def dedupe(subset: Seq[String] = Nil, keep: Ops.Keep = Ops.Keep.Any): PipelineBuilder =
    add(Ops.dedupe(subset, keep))
  def sort(by: Seq[String], ascending: Seq[Boolean] = Nil): PipelineBuilder =
    add(Ops.sort(by, ascending))
  def transform(f: DataFrame => DataFrame): PipelineBuilder = add(f)
  def add(f: DataFrame => DataFrame): PipelineBuilder = { p = p.addTransformer(f); this }

  // ------------------------------------------ training-data pipeline stages
  def hashSample(key: String, fraction: Double): PipelineBuilder =
    add(Ops.hashSample(key, fraction))
  def stratifiedSample(key: String, strata: String, fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): PipelineBuilder =
    add(Ops.stratifiedHashSample(key, strata, fractions, defaultFraction))
  def piiRedact(column: String): PipelineBuilder = add(Ops.piiRedact(column))
  def qualityFilter(column: String, minScore: Long): PipelineBuilder =
    add(Ops.qualityFilter(column, minScore))
  def exactDedup(contentCol: String, keyCol: String): PipelineBuilder =
    add(df => minietl.dedup.Dedup.exact(df, contentCol, keyCol))

  def withSchema(schema: TableSchema): PipelineBuilder =
    { p = p.withValidator(new SchemaValidator(schema)); this }
  def withErrorMode(m: ErrorMode): PipelineBuilder = { p = p.withErrorMode(m); this }
  def withOnComplete(f: RunStats => Unit): PipelineBuilder = { p = p.withOnComplete(f); this }

  // --------------------------------------------------------------- sinks
  def toCsv(path: String, mode: String = "overwrite"): PipelineBuilder =
    { p = p.setSink(df => Writers.csv(df, path, mode)); this }
  def toJson(path: String, mode: String = "overwrite"): PipelineBuilder =
    { p = p.setSink(df => Writers.json(df, path, mode)); this }
  def toParquet(path: String, mode: String = "overwrite",
                partitionBy: Seq[String] = Nil): PipelineBuilder =
    { p = p.setSink(df => Writers.parquet(df, path, mode, partitionBy = partitionBy)); this }
  def toJdbc(url: String, table: String, ifExists: String = "append"): PipelineBuilder =
    { p = p.setSink(df => Writers.jdbc(df, url, table, ifExists)); this }
  def toNoop(): PipelineBuilder = { p = p.setSink(df => { Writers.noop(df); () }); this }
  def toSink(f: DataFrame => Unit): PipelineBuilder = { p = p.setSink(f); this }

  def build(): Pipeline = p
}
