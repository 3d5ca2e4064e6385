package minietl.io

import java.nio.file.Files

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC writer/reader round-trip against embedded Derby (ships with Spark —
  * no external database needed).
  */
class JdbcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("minietl-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def sample = Seq((1L, "ann", 10.5), (2L, "bob", 20.5), (3L, "cat", 30.5))
    .toDF("id", "name", "score")

  test("write append, read back by table") {
    Writers.jdbc(sample, url, "people", ifExists = "append")
    val back = Readers.jdbc(spark, url, table = Some("people"))
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq === Seq("id", "name", "score"))
    // Derby stores StringType as CLOB, which cannot anchor a pushed-down
    // string comparison — filter on the numeric key instead
    assert(back.filter(col("id") === 2L).select("score").as[Double].collect()(0) === 20.5)
  }

  test("append accumulates; overwrite replaces") {
    Writers.jdbc(sample, url, "accum", ifExists = "append")
    Writers.jdbc(sample, url, "accum", ifExists = "append")
    assert(Readers.jdbc(spark, url, table = Some("accum")).count() === 6)
    Writers.jdbc(sample, url, "accum", ifExists = "replace")
    assert(Readers.jdbc(spark, url, table = Some("accum")).count() === 3)
  }

  test("read with a pushed-down SQL query") {
    Writers.jdbc(sample, url, "q", ifExists = "append")
    val big = Readers.jdbc(spark, url,
      // Spark's writer leaves the Derby table name unquoted (→ uppercased)
      // but quotes the column names (→ case-sensitive lowercase)
      query = Some("""SELECT "id", "score" FROM q WHERE "score" > 15"""))
    assert(big.count() === 2)
    assert(big.columns.map(_.toLowerCase).sorted.toSeq === Seq("id", "score"))
  }

  test("partitioned read splits the scan by a numeric column") {
    Writers.jdbc(sample, url, "parts", ifExists = "append")
    val df = Readers.jdbc(spark, url, table = Some("parts"), options = Map(
      "partitionColumn" -> "id", "lowerBound" -> "1", "upperBound" -> "4",
      "numPartitions" -> "3"))
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 3)
  }

  test("fail mode errors when the table exists") {
    Writers.jdbc(sample, url, "exists_t", ifExists = "append")
    intercept[Exception] {
      Writers.jdbc(sample, url, "exists_t", ifExists = "fail")
    }
  }
}
