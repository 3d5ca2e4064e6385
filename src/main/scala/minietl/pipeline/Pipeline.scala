package minietl.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import minietl.schema.SchemaValidator

/** Run statistics, mirroring the reference's stats dict
  * (reference: mini_etl/core/pipeline.py:146-153 — rows, errors, duration,
  * rows_per_second; "chunks" has no Spark analog and is omitted).
  */
final case class RunStats(
    rows: Long,
    durationSec: Double,
    rowsPerSecond: Double,
    errors: Long) {
  def asMap: Map[String, Any] = Map(
    "rows" -> rows, "duration" -> durationSec,
    "rows_per_second" -> rowsPerSecond, "errors" -> errors)
}

/** Error handling for `Pipeline.run` (reference: core/pipeline.py:44,180-191).
  * The reference's `skip` drops the failing CHUNK and continues — chunks do
  * not exist in Spark, so `Skip` here (like `Log`) swallows the failure and
  * reports it in `RunStats.errors`; record-level skipping belongs to the
  * reader (`mode=PERMISSIVE` / `badRecordsPath`), see SURVEY §7.6.
  */
sealed trait ErrorMode
object ErrorMode {
  case object Raise extends ErrorMode
  case object Log extends ErrorMode
  case object Skip extends ErrorMode
}

/** A linear source → transformers → sink pipeline over one DataFrame
  * (reference: mini_etl/core/pipeline.py:19-278). Lazy by construction:
  * nothing executes until the sink's write action pulls, exactly like the
  * reference's generator chain — except the "chunk stream" is a partitioned
  * DataFrame and the chain is one Catalyst plan (fused by codegen, optimized
  * globally).
  *
  * Row counting uses `Dataset.observe`: the count is collected as a metric
  * of the sink's own action — no second pass over the data, which matters
  * when the pipeline reads 100 TB.
  */
final class Pipeline private (
    name: String,
    source: Option[SparkSession => DataFrame],
    transformers: Vector[DataFrame => DataFrame],
    sink: Option[DataFrame => Unit],
    validator: Option[SchemaValidator],
    errorMode: ErrorMode,
    onComplete: Option[RunStats => Unit]) {

  def this(name: String = "pipeline") =
    this(name, None, Vector.empty, None, None, ErrorMode.Raise, None)

  private def copied(
      source: Option[SparkSession => DataFrame] = source,
      transformers: Vector[DataFrame => DataFrame] = transformers,
      sink: Option[DataFrame => Unit] = sink,
      validator: Option[SchemaValidator] = validator,
      errorMode: ErrorMode = errorMode,
      onComplete: Option[RunStats => Unit] = onComplete): Pipeline =
    new Pipeline(name, source, transformers, sink, validator, errorMode, onComplete)

  def setSource(f: SparkSession => DataFrame): Pipeline = copied(source = Some(f))
  def addTransformer(f: DataFrame => DataFrame): Pipeline = copied(transformers = transformers :+ f)
  def setSink(f: DataFrame => Unit): Pipeline = copied(sink = Some(f))
  def withValidator(v: SchemaValidator): Pipeline = copied(validator = Some(v))
  def withErrorMode(m: ErrorMode): Pipeline = copied(errorMode = m)
  def withOnComplete(f: RunStats => Unit): Pipeline = copied(onComplete = Some(f))

  /** Pipeline.copy (reference: core/pipeline.py:248-258). */
  def copy(): Pipeline = copied()

  /** Pipeline.clear (reference: core/pipeline.py:260-270). */
  def clear(): Pipeline = new Pipeline(name)

  /** The composed (lazy) frame, without running the sink — useful for tests
    * and for embedding a pipeline as a stage of a larger plan.
    */
  def frame(spark: SparkSession): DataFrame = {
    val src = source.getOrElse(throw new IllegalStateException("pipeline has no source"))(spark)
    val transformed = transformers.foldLeft(src)((df, t) => t(df))
    validator.fold(transformed)(v => v(transformed))
  }

  /** Execute: one write action; stats observed from that same action. */
  def run(spark: SparkSession): RunStats = {
    val out = sink.getOrElse(throw new IllegalStateException("pipeline has no sink"))
    val t0 = System.nanoTime()
    def finish(rows: Long, errors: Long): RunStats = {
      val dur = (System.nanoTime() - t0) / 1e9
      val stats = RunStats(rows, dur, if (dur > 0) rows / dur else 0.0, errors)
      onComplete.foreach(_(stats))
      stats
    }
    try {
      val obs = Observation(s"${name}_${java.util.UUID.randomUUID().toString.take(8)}")
      val observed = frame(spark).observe(obs, count(lit(1)).as("rows"))
      out(observed)
      finish(obs.get("rows").asInstanceOf[Long], errors = 0L)
    } catch {
      case e: Throwable => errorMode match {
        case ErrorMode.Raise => throw e
        case _ =>
          System.err.println(s"[pipeline:$name] error (${errorMode}): ${e.getMessage}")
          finish(rows = 0L, errors = 1L)
      }
    }
  }
}
