package minietl.ops

import minietl.SparkTestBase
import minietl.schema.{ColumnSpec, SchemaValidator, TableSchema}
import org.apache.spark.sql.functions.{col, unix_timestamp}
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

  // ---- full §1.2 dtype matrix (VERDICT r10 Next #7) -----------------------

  private val intWidths = Seq(
    ("int8", Byte.MinValue.toLong, Byte.MaxValue.toLong),
    ("int16", Short.MinValue.toLong, Short.MaxValue.toLong),
    ("int32", Int.MinValue.toLong, Int.MaxValue.toLong),
    ("int64", Long.MinValue, Long.MaxValue))

  test("castCoerce integer widths from STRING: in-range round-trips, overflow and garbage null") {
    val longGen = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-40000L, 40000L), // exercises the int8/int16 boundaries
      Gen.choose(-200L, 200L))
    forAll(Gen.listOfN(15, longGen)) { (xs: List[Long]) =>
      intWidths.foreach { case (alias, lo, hi) =>
        val out = (xs.map(_.toString) :+ "garbage" :+ "" :+ "1.5e2")
          .toDF("x").transform(Ops.castCoerce(Map("x" -> alias)))
          .select(col("x").cast("long")).as[Option[Long]].collect()
        xs.zip(out).foreach { case (v, got) =>
          if (v >= lo && v <= hi) assert(got === Some(v), s"$alias in-range $v")
          else assert(got === None, s"$alias overflow $v must coerce to null, not wrap")
        }
        assert(out.takeRight(3).forall(_.isEmpty), s"$alias garbage must null")
      }
    }
  }

  test("castCoerce integer NARROWING from a numeric column: overflow nulls, never wraps") {
    forAll(Gen.listOfN(15, Gen.oneOf(
        Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(-40000L, 40000L)))) {
      (xs: List[Long]) =>
        intWidths.foreach { case (alias, lo, hi) =>
          val out = xs.toDF("x").transform(Ops.castCoerce(Map("x" -> alias)))
            .select(col("x").cast("long")).as[Option[Long]].collect()
          xs.zip(out).foreach { case (v, got) =>
            if (v >= lo && v <= hi) assert(got === Some(v), s"$alias $v")
            else assert(got === None, s"$alias overflow $v must coerce to null")
          }
        }
    }
  }

  test("castCoerce to float32 never throws; in-range parseables round-trip at float precision") {
    forAll(Gen.listOfN(20, anyStringGen)) { (xs: List[String]) =>
      val out = xs.toDF("x").transform(Ops.castCoerce(Map("x" -> "float32")))
        .as[Option[Float]].collect()
      assert(out.length === xs.length)
      xs.zip(out).foreach { case (s, v) =>
        scala.util.Try(s.trim.toFloat).toOption match {
          case Some(f) if !f.isNaN && !f.isInfinite =>
            assert(v.exists(got => got == f || math.abs(got - f) <= math.ulp(f) * 4),
              s"input '$s'")
          case _ => () // NaN/Inf/garbage: must only not throw
        }
      }
    }
  }

  test("castCoerce bool matrix: accepted literal sets, everything else nulls") {
    val trues = Seq("true", "TRUE", "t", "y", "yes", "1", "  true  ")
    val falses = Seq("false", "False", "f", "n", "no", "0")
    val garbage = Seq("2", "maybe", "", "truthy", "-1")
    val out = (trues ++ falses ++ garbage).toDF("x")
      .transform(Ops.castCoerce(Map("x" -> "bool")))
      .as[Option[Boolean]].collect()
    val (t, rest) = out.splitAt(trues.size)
    val (f, g) = rest.splitAt(falses.size)
    assert(t.forall(_ === Some(true)), s"true literals: ${trues.zip(t)}")
    assert(f.forall(_ === Some(false)), s"false literals: ${falses.zip(f)}")
    assert(g.forall(_.isEmpty), s"garbage must null: ${garbage.zip(g)}")
  }

  test("castCoerce datetime: ISO strings round-trip to the second, garbage nulls, never throws") {
    val epochGen = Gen.choose(0L, 4102444800L) // 1970..2100
    forAll(Gen.listOfN(12, epochGen)) { (secs: List[Long]) =>
      val iso = secs.map(s => java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(s)))
      val out = (iso :+ "2024-13-45" :+ "not a date" :+ "")
        .toDF("x").transform(Ops.castCoerce(Map("x" -> "datetime")))
        .select(unix_timestamp(col("x"))).as[Option[Long]].collect()
      secs.zip(out).foreach { case (s, got) =>
        assert(got === Some(s), s"ISO ${java.time.Instant.ofEpochSecond(s)}")
      }
      assert(out.takeRight(3).forall(_.isEmpty), "garbage datetimes must null")
    }
  }

  test("castCoerce string round-trip: int64 → string → int64 is identity") {
    forAll(Gen.listOfN(20, Gen.choose(Long.MinValue, Long.MaxValue))) { (xs: List[Long]) =>
      val out = xs.toDF("x")
        .transform(Ops.castCoerce(Map("x" -> "string")))
        .transform(Ops.castCoerce(Map("x" -> "int64")))
        .as[Option[Long]].collect()
      assert(out.toSeq === xs.map(Option(_)))
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
