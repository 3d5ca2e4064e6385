package graft

import minietl.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Enforces the driver-output-type contract from SparkEntry's header: every
  * registered query's FINAL columns must be DOUBLE / BIGINT / INT / STRING /
  * BOOL / DATE / TIMESTAMP. DECIMAL outputs hash-mismatch in the driver
  * (pandas reads them as Python Decimal, the DuckDB oracle's .df() renders
  * float64 — `Decimal('8784.30') != 8784.3`); ARRAY / MAP / STRUCT outputs
  * crash the driver's pandas row sort (`unhashable type: numpy.ndarray`).
  * Decimals and arrays remain welcome INTERNALLY for exactness.
  *
  * Schemas are resolved lazily against sf0.001 — batch queries never
  * execute; the three streaming queries drain their one AvailableNow batch.
  */
class EntryContractSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def violation(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case _: ArrayType | _: MapType | _: StructType => true
    case FloatType => true // float32 renders differently from float64
    case _ => false
  }

  test("every registered query emits only driver-safe output column types") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      schema.fields.collect {
        case f if violation(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"driver-unsafe output columns (see SparkEntry header contract):\n  ${bad.mkString("\n  ")}")
  }

  test("q_ivf_ann oracle lookup fails fast before training and resolves after") {
    // Direct lookup before the query trained must throw the actionable
    // sequencing error (unless an earlier suite in this JVM already ran the
    // query, in which case it must resolve); iteration must never throw.
    try {
      val pre = SparkEntry.oracleSql.get("q_ivf_ann")
      assert(pre.exists(_.nonEmpty)) // already trained earlier in this JVM
    } catch {
      case e: IllegalStateException =>
        assert(e.getMessage.contains("before the q_ivf_ann query ran"))
        assert(!SparkEntry.oracleSql.iterator.exists(_._1 == "q_ivf_ann"))
    }
    SparkEntry.queries("q_ivf_ann")(spark, sfDir).collect()
    assert(SparkEntry.oracleSql("q_ivf_ann").nonEmpty)
  }
}
