package graft

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Covers the TIMESTAMP_NTZ branch of SparkEntry.normalizeTs against a real
  * parquet fixture (ADVICE r6: the branch had no coverage and silently
  * assumed a UTC session).
  */
class NormalizeTsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ntzFixture: String = {
    val dir = java.nio.file.Files.createTempDirectory("ntz-events").toString
    // TIMESTAMP(MICROS, naive) parquet: the wall clocks below are the
    // instants the battery oracle would see for a UTC session
    Seq("2024-03-10 01:30:00", "2024-03-10 03:30:00", "2024-11-03 01:30:00")
      .toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("NTZ ts normalizes to the same UTC instants as the naive wall clock") {
    val raw = spark.read.parquet(ntzFixture)
    assert(raw.schema("ts").dataType === TimestampNTZType)
    val norm = SparkEntry.normalizeTs(raw)
    assert(norm.schema("ts").dataType === TimestampType)
    // session zone is UTC, so epoch seconds equal the naive wall clock
    // interpreted as UTC — including the two US-DST-boundary wall clocks,
    // which would shift by an hour under an America/* session zone
    val got = norm.select(unix_timestamp(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === Seq(1710034200L, 1710041400L, 1730597400L))
  }

  test("NTZ normalization fails fast under a non-UTC session zone") {
    val dir = ntzFixture
    val prev = spark.conf.get("spark.sql.session.timeZone")
    assert(prev === "UTC") // battery invariant from the session builders
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.normalizeTs(spark.read.parquet(dir))
      }
      assert(e.getMessage.contains("spark.sql.session.timeZone=UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
