package minietl.pipeline

import java.nio.file.Files

import minietl.SparkTestBase
import minietl.io.{Readers, Writers}
import minietl.schema.{ColumnSpec, TableSchema}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("minietl-pipe").toString

  private def sample =
    (1 to 100).map(i => (i.toLong, ('A' + (i - 1) % 5).toChar.toString, 99L + i))
      .toDF("id", "category", "value")

  test("run executes source → transformers → sink and reports stats from the write action") {
    val dir = s"${tmp()}/out"
    var completed: Option[RunStats] = None
    val stats = new PipelineBuilder("t")
      .fromDataFrame(sample)
      .filter("value > 150")
      .select(Seq("id", "value"))
      .withOnComplete(s => completed = Some(s))
      .toParquet(dir)
      .build()
      .run(spark)
    assert(stats.rows === 49)
    assert(stats.errors === 0)
    assert(stats.rowsPerSecond > 0)
    assert(completed.contains(stats))
    assert(Readers.parquet(spark, dir).count() === 49)
  }

  test("builder covers the reference's fluent surface end-to-end over files") {
    val in = s"${tmp()}/in"
    val outDir = s"${tmp()}/out"
    Writers.csv(sample, in)
    val stats = new PipelineBuilder("files")
      .fromCsv(in)
      .cast(Map("value" -> "int64"))
      .expression("double_value = value * 2")
      .groupAgg(Seq("category"), Map("double_value" -> Seq("sum")))
      .sort(Seq("category"))
      .toCsv(outDir)
      .build()
      .run(spark)
    assert(stats.rows === 5)
    val back = Readers.csv(spark, outDir)
    assert(back.columns.toSeq === Seq("category", "double_value_sum"))
  }

  test("schema validator participates in the pipeline") {
    val schema = TableSchema(Seq(
      ColumnSpec("id", "int64"),
      ColumnSpec("value", "int64"),
      ColumnSpec("active", "boolean", default = Some(false))))
    val p = new PipelineBuilder("s").fromDataFrame(sample)
      .withSchema(schema).toNoop().build()
    val df = p.frame(spark)
    assert(df.columns.toSeq === Seq("id", "value", "active", "category"))
    assert(df.filter(col("active")).count() === 0)
  }

  test("errorMode Raise propagates; Log/Skip swallow and report") {
    val bad = new PipelineBuilder("bad")
      .fromSource(s => s.read.parquet("/nonexistent/path"))
      .toNoop()
    intercept[Exception](bad.build().run(spark))
    val logged = new PipelineBuilder("bad2")
      .fromSource(s => s.read.parquet("/nonexistent/path"))
      .withErrorMode(ErrorMode.Log)
      .toNoop()
      .build().run(spark)
    assert(logged.errors === 1 && logged.rows === 0)
  }

  test("pipeline without source or sink fails fast") {
    intercept[IllegalStateException](new Pipeline("empty").run(spark))
    intercept[IllegalStateException](
      new Pipeline("nosink").setSource(_ => sample).run(spark))
  }

  test("stage hooks fire in order with labels; errors carry their stage") {
    val seen = scala.collection.mutable.Buffer[(Int, String)]()
    new PipelineBuilder("hooks")
      .fromDataFrame(sample)
      .filter("value > 150")
      .rename(Map("category" -> "cat"))
      .select(Seq("id", "cat", "value"))
      .withOnStage(ctx => seen += (ctx.index -> ctx.label))
      .toNoop()
      .build().run(spark)
    assert(seen.toSeq === Seq(0 -> "filter", 1 -> "rename", 2 -> "select"))

    // a stage that fails to compose reports (index, label, error), then the
    // error-mode policy still applies: Log swallows into the stats
    seen.clear()
    var failed: Option[(Pipeline.StageContext, Throwable)] = None
    val stats = new PipelineBuilder("hooks2")
      .fromDataFrame(sample)
      .filter("value > 150")
      .select(Seq("no_such_column"), ignoreMissing = false)
      .withOnStage(ctx => seen += (ctx.index -> ctx.label))
      .withOnError((ctx, e) => failed = Some((ctx, e)))
      .withErrorMode(ErrorMode.Log)
      .toNoop()
      .build().run(spark)
    assert(stats.errors === 1)
    assert(seen.toSeq === Seq(0 -> "filter", 1 -> "select")) // both reached
    assert(failed.exists { case (ctx, _) => ctx.index === 1 && ctx.label === "select" })
    // and with Raise the same failure propagates after the callback
    failed = None
    intercept[Exception] {
      new PipelineBuilder("hooks3")
        .fromDataFrame(sample)
        .select(Seq("no_such_column"), ignoreMissing = false)
        .withOnError((ctx, e) => failed = Some((ctx, e)))
        .toNoop()
        .build().run(spark)
    }
    assert(failed.exists(_._1.index === 0))
  }

  test("exec-metrics listener delivers the sink action's QueryExecution") {
    val got = new java.util.concurrent.LinkedBlockingQueue[java.lang.Long](1)
    new PipelineBuilder("metrics")
      .fromDataFrame(sample)
      .filter("value > 150")
      .withOnExecMetrics((qe, durNs) => { qe.executedPlan; got.offer(durNs); () })
      .toNoop()
      .build().run(spark)
    // listener delivery is async on the listener bus
    val dur = got.poll(10, java.util.concurrent.TimeUnit.SECONDS)
    assert(dur != null && dur > 0)
  }

  test("copy preserves stages; clear resets") {
    val b = new Pipeline("c").setSource(_ => sample).setSink(df => { df.count(); () })
    assert(b.copy().run(spark).rows === 100)
    intercept[IllegalStateException](b.clear().run(spark))
  }
}
