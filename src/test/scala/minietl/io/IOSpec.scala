package minietl.io

import java.nio.file.Files

import minietl.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IOSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("minietl-io").toString

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "name", "score")

  test("csv writer/reader round-trip with header") {
    val dir = s"${tmp()}/out"
    Writers.csv(sample, dir)
    // schema-less read falls back to inferSchema — a second full scan at
    // scale, so it must warn (like the other scale-trap fallbacks)
    val (back, warns) = minietl.LogCapture.warnings("minietl.io.Readers$") {
      Readers.csv(spark, dir)
    }
    assert(warns.exists(_.contains("inferSchema")))
    assert(back.count() === 3)
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    assert(back.filter(col("name") === "b").select("score").as[Double].collect()(0) === 2.5)
    // an explicit schema is the scale path: no inference, no warning
    val (_, quiet) = minietl.LogCapture.warnings("minietl.io.Readers$") {
      Readers.csv(spark, dir, schema = Some(back.schema)).count()
    }
    assert(quiet.isEmpty)
  }

  test("jsonl writer/reader round-trip") {
    val dir = s"${tmp()}/out"
    Writers.json(sample, dir)
    val back = Readers.json(spark, dir)
    assert(back.count() === 3)
    assert(back.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("parquet round-trip with column pruning and hive partitioning") {
    val dir = s"${tmp()}/out"
    Writers.parquet(sample, dir, partitionBy = Seq("name"))
    val pruned = Readers.parquet(spark, dir, columns = Seq("id", "name"))
    assert(pruned.columns.toSeq === Seq("id", "name"))
    assert(pruned.count() === 3)
    // partition dirs exist hive-style
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("name="))
    assert(sub.toSet === Set("name=a", "name=b", "name=c"))
  }

  test("maxRecordsPerFile splits parquet output into bounded files") {
    val dir = s"${tmp()}/out_split"
    import spark.implicits._
    Writers.parquet((1 to 100).toDF("n").coalesce(1), dir, maxRecordsPerFile = 30L)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts === 4, s"expected ceil(100/30)=4 files, got $parts") // 30+30+30+10
    assert(Readers.parquet(spark, dir).count() === 100)
  }

  test("orc round-trip with column pruning and hive partitioning") {
    val dir = s"${tmp()}/out_orc"
    Writers.orc(sample, dir, partitionBy = Seq("name"))
    val pruned = Readers.orc(spark, dir, columns = Seq("id", "name"))
    assert(pruned.columns.toSeq === Seq("id", "name"))
    assert(pruned.count() === 3)
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("name="))
    assert(sub.toSet === Set("name=a", "name=b", "name=c"))
  }

  test("scan plans prove partition pruning, predicate pushdown, and schema pruning") {
    val dir = s"${tmp()}/out"
    Writers.parquet(sample, dir, partitionBy = Seq("name"))
    // partition-column filter + narrow projection + data-column predicate
    val q = Readers.parquet(spark, dir)
      .where(col("name") === "b" && col("score") > 1.0)
      .select("id")
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // partition pruning: the name=b filter must be a PartitionFilter, not a
    // post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") && scan.contains("name"),
      s"partition filter missing from scan:\n$scan")
    // predicate pushdown: the score predicate reaches the parquet reader
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(score"),
      s"pushed filter missing from scan:\n$scan")
    // schema pruning: only id+score are read (name comes from the partition
    // path; the projection needs id, the residual filter needs score)
    assert(scan.contains("ReadSchema") && !scan.contains("name:string"),
      s"read schema not pruned:\n$scan")
    assert(q.as[Long].collect().toSeq === Seq(2L))
  }

  test("append mode accumulates rows; overwrite replaces") {
    val dir = s"${tmp()}/out"
    Writers.parquet(sample, dir)
    Writers.parquet(sample, dir, mode = "append")
    assert(Readers.parquet(spark, dir).count() === 6)
    Writers.parquet(sample, dir, mode = "overwrite")
    assert(Readers.parquet(spark, dir).count() === 3)
  }

  test("saveMode maps the reference's mode strings") {
    assert(Writers.saveMode("w") === SaveMode.Overwrite)
    assert(Writers.saveMode("replace") === SaveMode.Overwrite)
    assert(Writers.saveMode("a") === SaveMode.Append)
    assert(Writers.saveMode("fail") === SaveMode.ErrorIfExists)
    assert(Writers.saveMode("ignore") === SaveMode.Ignore)
    intercept[IllegalArgumentException](Writers.saveMode("bogus"))
  }

  test("multi fans one frame out to several sinks without recompute") {
    val d1 = s"${tmp()}/a"
    val d2 = s"${tmp()}/b"
    Writers.multi(sample, Seq(df => Writers.parquet(df, d1), df => Writers.csv(df, d2)))
    assert(Readers.parquet(spark, d1).count() === 3)
    assert(Readers.csv(spark, d2).count() === 3)
  }

  test("noop consumes and counts") {
    assert(Writers.noop(sample) === 3L)
  }

  test("inMemory source builds a frame from rows") {
    val df = Readers.inMemory(spark, sample.collect().toSeq, sample.schema)
    assert(df.count() === 3)
  }

  test("malformed records: PERMISSIVE nulls them, DROPMALFORMED skips them") {
    // the reader-level mapping of the reference's per-chunk error skip
    // (SURVEY §7.6): bad RECORDS are isolated, not arbitrary failing batches
    val dir = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,score\n1,10.5\n2,not_a_number\n3,30.5\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
    val permissive = Readers.csv(spark, s"$dir/in.csv", schema = Some(schema),
      options = Map("mode" -> "PERMISSIVE"))
    assert(permissive.count() === 3)
    assert(permissive.filter(col("score").isNull).select("id").as[Long].collect().toSeq === Seq(2L))
    val dropped = Readers.csv(spark, s"$dir/in.csv", schema = Some(schema),
      options = Map("mode" -> "DROPMALFORMED"))
    // read BOTH columns: CSV column pruning would otherwise never parse the
    // malformed field, so the row would not register as malformed
    val rows = dropped.select("id", "score").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq === Seq(1L, 3L))
  }

  test("jdbc reader validates query XOR table") {
    intercept[IllegalArgumentException] {
      Readers.jdbc(spark, "jdbc:fake", table = Some("t"), query = Some("q"))
    }
    intercept[IllegalArgumentException] {
      Readers.jdbc(spark, "jdbc:fake")
    }
  }
}
