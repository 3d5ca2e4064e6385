package minietl.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import minietl.ops.Ops

/** Optional declared-or-inferred schema with validate-and-coerce semantics
  * (reference: mini_etl/core/schema.py). A `TableSchema` is a Spark
  * `StructType` plus per-column defaults; `strict` makes extra columns an
  * error (schema.py:38-52, 209-214).
  */
final case class ColumnSpec(
    name: String,
    dtype: String,              // reference type alias or Spark DDL type
    nullable: Boolean = true,
    default: Option[Any] = None) {
  def dataType: DataType = CatalystSqlParserShim.parse(Ops.sparkTypeName(dtype))
  def field: StructField = StructField(name, dataType, nullable)
}

/** Small indirection so the parser import stays in one place. */
private[schema] object CatalystSqlParserShim {
  def parse(ddl: String): DataType =
    org.apache.spark.sql.types.DataType.fromDDL(ddl)
}

final case class TableSchema(columns: Seq[ColumnSpec], strict: Boolean = false) {
  def structType: StructType = StructType(columns.map(_.field))
  def columnNames: Seq[String] = columns.map(_.name)
}

object TableSchema {
  /** Schema.from_dataframe (schema.py:81-92): infer from observed data.
    * Nullability comes from Spark's own schema (observed-NaN inference in the
    * reference is an artifact of pandas having no nullable dtypes).
    */
  def fromDataFrame(df: DataFrame): TableSchema =
    TableSchema(df.schema.fields.toSeq.map(f => ColumnSpec(f.name, f.dataType.sql, f.nullable)))
}

sealed trait OnError
object OnError { case object Raise extends OnError; case object Warn extends OnError; case object Ignore extends OnError }

final case class ValidationIssue(column: String, problem: String)

/** SchemaValidator (schema.py:124-176, 184-251): check missing required
  * columns, nulls in non-nullable columns, dtype compatibility; with
  * `coerce=true`, cast columns (null-on-failure, like the reference's
  * errors="coerce") and add absent columns filled with the default.
  *
  * `validate` runs the structural checks driver-side on the schema only; the
  * null-check is a single aggregated pass (one job, no per-column scans), not
  * a per-row assertion — at 100 TB a row-by-row validator would dominate the
  * query itself.
  */
final class SchemaValidator(schema: TableSchema, coerce: Boolean = true, onError: OnError = OnError.Raise) {

  def structuralIssues(df: DataFrame): Seq[ValidationIssue] = {
    val present = df.columns.toSet
    val missing = schema.columns.filterNot(c => present.contains(c.name))
      .filterNot(c => coerce && (c.default.nonEmpty || c.nullable))
      .map(c => ValidationIssue(c.name, "missing required column"))
    val extra =
      if (schema.strict) df.columns.filterNot(schema.columnNames.contains(_)).toSeq
        .map(c => ValidationIssue(c, "unexpected column (strict)"))
      else Nil
    missing ++ extra
  }

  /** One aggregated job counting nulls in declared non-nullable columns. */
  def nullViolations(df: DataFrame): Map[String, Long] = {
    val nonNullable = schema.columns.filter(c => !c.nullable && df.columns.contains(c.name))
    if (nonNullable.isEmpty) Map.empty
    else {
      val aggs = nonNullable.map(c => sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(c.name))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      nonNullable.map(_.name).zipWithIndex
        .map { case (n, i) => n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
        .filter(_._2 > 0).toMap
    }
  }

  private def report(issues: Seq[String]): Unit = if (issues.nonEmpty) onError match {
    case OnError.Raise => throw new IllegalStateException("schema validation failed: " + issues.mkString("; "))
    case OnError.Warn => issues.foreach(i => System.err.println(s"[schema] WARN: $i"))
    case OnError.Ignore => ()
  }

  /** Validate and (optionally) coerce: cast mismatched dtypes with try_cast,
    * add missing columns as default/null, project to declared order
    * (schema.py:218-251).
    */
  def apply(df: DataFrame, checkNulls: Boolean = false): DataFrame = {
    report(structuralIssues(df).map(i => s"${i.column}: ${i.problem}"))
    if (checkNulls) report(nullViolations(df).map { case (c, n) => s"$c: $n nulls in non-nullable column" }.toSeq)
    if (!coerce) df
    else {
      val present = df.columns.toSet
      val cols = schema.columns.map { c =>
        if (present.contains(c.name)) {
          val cur = df.schema(c.name).dataType
          if (cur == c.dataType) col(c.name) else col(c.name).try_cast(c.dataType).as(c.name)
        } else c.default match {
          case Some(v) => lit(v).try_cast(c.dataType).as(c.name)
          case None => lit(null).cast(c.dataType).as(c.name)
        }
      }
      val extras =
        if (schema.strict) Nil
        else df.columns.filterNot(schema.columnNames.contains(_)).map(col).toSeq
      df.select(cols ++ extras: _*)
    }
  }
}
