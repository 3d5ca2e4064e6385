package minietl.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import minietl.config.Config

/** Thin CLI over the config surface (reference: mini_etl/cli.py:15-256 —
  * run / validate / init / info; `ui` is a non-goal, the Spark UI exists).
  * Core logic lives in [[execute]] so it is testable without a process
  * boundary; `main` only owns the exit code.
  */
object Main {

  val usage: String =
    """usage: minietl <command> [args]
      |  run <config.yaml>       load, validate, build and execute a pipeline
      |  validate <config.yaml>  check a config; prints errors or 'valid'
      |  init <config.yaml>      write a sample config
      |  info                    list registered source/transformer/sink types
      |""".stripMargin

  /** Returns (exitCode, output). */
  def execute(args: Seq[String], spark: () => SparkSession): (Int, String) =
    args.toList match {
      case "run" :: path :: Nil =>
        val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
        if (Config.isStreamConfig(text)) {
          val cfg = Config.parseStream(text)
          val errs = Config.validateStream(cfg)
          if (errs.nonEmpty) (1, errs.mkString("invalid config:\n  ", "\n  ", ""))
          else {
            // run drains what is currently staged (AvailableNow semantics —
            // the one-shot run the reference Scheduler's cron maps to); a
            // long-lived interval-trigger deployment calls
            // Config.loadStream(...).start(spark) and manages the query
            Config.buildStream(cfg).runAvailableNow(spark())
            (0, s"stream '${cfg.name}' drained available input")
          }
        } else if (Config.isDagConfig(text)) {
          val cfg = Config.parseDag(text)
          val errs = Config.validateDag(cfg)
          if (errs.nonEmpty) (1, errs.mkString("invalid config:\n  ", "\n  ", ""))
          else {
            val counts = Config.buildDag(cfg).run(spark())
            (0, s"dag '${cfg.name}' complete: " +
              counts.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n rows" }.mkString(", "))
          }
        } else {
          val cfg = Config.parse(text)
          val errs = Config.validate(cfg)
          if (errs.nonEmpty) (1, errs.mkString("invalid config:\n  ", "\n  ", ""))
          else {
            val stats = Config.build(cfg).run(spark())
            (0, f"pipeline '${cfg.name}' complete: ${stats.rows} rows in " +
              f"${stats.durationSec}%.2fs (${stats.rowsPerSecond}%.0f rows/sec)")
          }
        }
      case "validate" :: path :: Nil =>
        val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
        val (errs, warns) =
          if (Config.isStreamConfig(text))
            (Config.validateStream(Config.parseStream(text)), Nil)
          else if (Config.isDagConfig(text))
            (Config.validateDag(Config.parseDag(text)), Nil)
          else {
            val cfg = Config.parse(text)
            (Config.validate(cfg), Config.warnings(cfg))
          }
        // warnings never fail validation — they print, the exit code stays 0
        val warnLines = warns.map("WARNING: " + _)
        if (errs.isEmpty) (0, ("valid" +: warnLines).mkString("\n"))
        else (1, (errs ++ warnLines).mkString("\n"))
      case "init" :: path :: Nil =>
        if (Files.exists(Paths.get(path))) (1, s"$path already exists")
        else {
          Files.write(Paths.get(path), Config.sample.getBytes("UTF-8"))
          (0, s"wrote sample config to $path")
        }
      case "info" :: Nil =>
        (0,
          """minietl-spark
            |  sources:      csv, json, jsonl, parquet, orc, excel, sql, api
            |  transformers: filter, rename, select, drop, cast, fillna,
            |                expression, aggregate|group, dedupe, sort,
            |                hash_sample, stratified_sample, temperature_sample,
            |                token_budget, top_p_select, pii_redact, quality_filter,
            |                gopher_filter, exact_dedup, paragraph_dedup,
            |                normalize_text, feature_hash, sigma_outlier_filter,
            |                mad_outlier_filter, winsorize, impute, lm_surprise,
            |                contamination_filter, semantic_decontaminate, bpe_stats,
            |                squeeze_repeats, dedup_lines
            |  sinks:        csv, json, jsonl, parquet, orc, excel, sql
            |  dag form:     a `dag:` root key declares multi-source graphs
            |                (transform/merge/branch nodes, many sinks)
            |  stream form:  a `stream:` root key declares an unbounded
            |                file-stream pipeline (watermark, window_agg/
            |                session_agg/dedup stages, trigger, checkpoint)
            |""".stripMargin)
      case _ => (2, usage)
    }

  def main(args: Array[String]): Unit = {
    val (code, out) = execute(args.toSeq, () => {
      val s = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    })
    println(out)
    if (code != 0) sys.exit(code)
  }
}
