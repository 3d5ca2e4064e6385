package minietl.ops

import minietl.SparkTestBase
import minietl.schema.{ColumnSpec, SchemaValidator, TableSchema}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the coerce-cast semantics (SURVEY §7.6 hard part:
  * null-on-failure must hold under Spark 4's default ANSI mode for ANY
  * input, not just the fixtures).
  */
class CoercePropertiesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in the
    * offline cache): 40 seeded draws per property.
    */
  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    (1 to 40).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val anyStringGen: Gen[String] = Gen.oneOf(
    Gen.numStr,
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
    Gen.double.map(_.toString),
    Gen.const(""),
    Gen.const("NaN"),
    Gen.const("  42  "),
    Gen.const("1e309"))

  test("castCoerce to int64 never throws; parseable longs round-trip") {
    forAll(Gen.listOfN(20, anyStringGen)) { (xs: List[String]) =>
      val out = xs.toDF("x").transform(Ops.castCoerce(Map("x" -> "int64")))
        .as[Option[Long]].collect()
      assert(out.length === xs.length)
      xs.zip(out).foreach { case (s, v) =>
        val expected = scala.util.Try(s.trim.toLong).toOption
        if (expected.isDefined) assert(v === expected, s"input '$s'")
      }
    }
  }

  test("castCoerce to float64 never throws; parseable doubles round-trip") {
    forAll(Gen.listOfN(20, anyStringGen)) { (xs: List[String]) =>
      val out = xs.toDF("x").transform(Ops.castCoerce(Map("x" -> "float64")))
        .as[Option[Double]].collect()
      assert(out.length === xs.length)
      xs.zip(out).foreach { case (s, v) =>
        scala.util.Try(s.trim.toDouble).toOption match {
          case Some(d) if !d.isNaN && !d.isInfinite =>
            assert(v.exists(got => got == d || math.abs(got - d) < math.ulp(d) * 4), s"input '$s'")
          case _ => () // NaN/Inf/garbage: engine-specific, must only not throw
        }
      }
    }
  }

  test("schema coercion preserves row count and declared column order for any frame") {
    val schema = TableSchema(Seq(
      ColumnSpec("a", "int64"), ColumnSpec("b", "string"),
      ColumnSpec("c", "float64", default = Some(0.5))))
    forAll(Gen.listOfN(10, Gen.zip(anyStringGen, Gen.chooseNum(-1000, 1000)))) {
      (rows: List[(String, Int)]) =>
        val df = rows.toDF("a", "b") // a: string → bigint coerce, b: int → string coerce
        val out = new SchemaValidator(schema)(df)
        assert(out.columns.toSeq === Seq("a", "b", "c"))
        assert(out.count() === rows.length)
        assert(out.schema("a").dataType.typeName === "long")
        assert(out.schema("b").dataType.typeName === "string")
    }
  }

  test("expression dialect translation is total over generated arithmetic") {
    val num = Gen.chooseNum(0, 999).map(_.toString)
    val ident = Gen.oneOf("a", "b", "c")
    val op = Gen.oneOf("+", "-", "*", "/", "//", "%", "**")
    val exprGen = for {
      l <- Gen.oneOf(num, ident); o <- op; r <- Gen.oneOf(num, ident)
      o2 <- op; r2 <- Gen.oneOf(num, ident)
    } yield s"$l $o $r $o2 $r2"
    forAll(exprGen) { (e: String) =>
      val sql = ExpressionDialect.translate(e)
      // must be accepted by Spark's parser given columns a, b, c
      val out = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
        .selectExpr(s"($sql) AS r")
      assert(out.columns.toSeq === Seq("r"))
    }
  }
}
