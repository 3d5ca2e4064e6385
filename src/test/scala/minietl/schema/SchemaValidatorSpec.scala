package minietl.schema

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

class SchemaValidatorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = TableSchema(Seq(
    ColumnSpec("id", "int64", nullable = false),
    ColumnSpec("name", "string"),
    ColumnSpec("active", "boolean", default = Some(true)),
    ColumnSpec("score", "float64", default = None)))

  test("coerce adds missing columns with default or null, casts, keeps order") {
    val out = new SchemaValidator(schema)(Seq((1, "a"), (2, "b")).toDF("id", "name"))
    assert(out.columns.toSeq === Seq("id", "name", "active", "score"))
    assert(out.schema("id").dataType === LongType)
    assert(out.filter(col("active") && col("score").isNull).count() === 2)
  }

  test("coerce nulls unparseable values (errors='coerce' semantics)") {
    val out = new SchemaValidator(TableSchema(Seq(ColumnSpec("id", "int64"))))(
      Seq("1", "x").toDF("id"))
    assert(out.as[Option[Long]].collect().toSet === Set(Some(1L), None))
  }

  test("strict schema raises on unexpected columns") {
    val strict = TableSchema(Seq(ColumnSpec("id", "int64")), strict = true)
    intercept[IllegalStateException] {
      new SchemaValidator(strict)(Seq((1, "x")).toDF("id", "extra"))
    }
  }

  test("missing required (non-defaulted, non-nullable) column raises") {
    val req = TableSchema(Seq(ColumnSpec("must", "int64", nullable = false)))
    intercept[IllegalStateException] {
      new SchemaValidator(req)(Seq(1).toDF("other"))
    }
  }

  test("nullViolations counts nulls in non-nullable columns in one pass") {
    val v = new SchemaValidator(schema)
    val df = Seq(Some(1L), None, None).toDF("id")
    assert(v.nullViolations(df) === Map("id" -> 2L))
    assert(v.nullViolations(Seq(1L, 2L).toDF("id")) === Map.empty)
  }

  test("fromDataFrame round-trips the observed schema") {
    val df = Seq((1L, "a", 1.5)).toDF("id", "s", "d")
    val ts = TableSchema.fromDataFrame(df)
    assert(ts.structType === df.schema)
  }

  test("non-strict keeps extra columns after declared ones") {
    val out = new SchemaValidator(schema)(
      Seq((1, "a", "keepme")).toDF("id", "name", "extra"))
    assert(out.columns.toSeq === Seq("id", "name", "active", "score", "extra"))
  }
}
