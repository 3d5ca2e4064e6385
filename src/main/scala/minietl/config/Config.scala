package minietl.config

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import minietl.ops.Ops
import minietl.pipeline.{Pipeline, PipelineBuilder}
import minietl.schema.{ColumnSpec, TableSchema}

/** The YAML/JSON pipeline config surface (reference: mini_etl/core/config.py).
  *
  * Registered types mirror the reference registries:
  *  - sources: csv, json, jsonl, parquet, sql (config.py:72-73, 264-297)
  *  - transformers: filter, rename, select, drop, cast, fillna, expression,
  *    aggregate|group (config.py:81-87, 299-342)
  *  - sinks: csv, json, jsonl, parquet, sql (config.py:77-78, 344-378)
  * `excel` and `api` are declared unsupported here (offline build, SURVEY
  * §7.6) and fail validation with an explicit message rather than at run
  * time.
  *
  * Env-var interpolation `${VAR}` / `$VAR` in the raw text before parsing
  * (config.py:103,158-168).
  */
object Config {

  final case class ComponentConfig(typ: String, options: Map[String, Any])
  final case class PipelineConfig(
      name: String,
      source: ComponentConfig,
      transformers: Seq[ComponentConfig],
      sink: ComponentConfig,
      schema: Option[TableSchema] = None)

  private val sourceTypes = Set("csv", "json", "jsonl", "parquet", "sql", "api")
  private val sinkTypes = Set("csv", "json", "jsonl", "parquet", "sql")
  private val transformerTypes =
    Set("filter", "rename", "select", "drop", "cast", "fillna", "expression",
      "aggregate", "group", "dedupe", "sort",
      // training-data pipeline stages (beyond the reference's set)
      "hash_sample", "stratified_sample", "pii_redact", "quality_filter",
      "exact_dedup", "gopher_filter", "temperature_sample", "token_budget",
      "paragraph_dedup", "normalize_text", "feature_hash", "sigma_outlier_filter",
      "winsorize", "impute", "mad_outlier_filter", "top_p_select")
  private val declaredUnsupported = Set("excel")

  private val EnvBrace: Regex = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r
  private val EnvBare: Regex = """\$([A-Za-z_][A-Za-z0-9_]*)""".r

  /** `${VAR}` / `$VAR` replaced from the environment; unknown vars are left
    * verbatim (matching the reference's `os.path.expandvars` behavior).
    */
  def substituteEnv(text: String, env: Map[String, String] = sys.env): String = {
    val braced = EnvBrace.replaceAllIn(text,
      m => Regex.quoteReplacement(env.getOrElse(m.group(1), m.matched)))
    EnvBare.replaceAllIn(braced,
      m => Regex.quoteReplacement(env.getOrElse(m.group(1), m.matched)))
  }

  // ------------------------------------------------------------- parsing
  private def asScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> asScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(asScala).toList
    case other => other
  }

  private def component(m: Map[String, Any], what: String): ComponentConfig = {
    val typ = m.getOrElse("type",
      throw new IllegalArgumentException(s"$what is missing 'type'")).toString
    ComponentConfig(typ.toLowerCase, m - "type")
  }

  /** Parse YAML (JSON is a YAML subset) into the config model. */
  def parse(text: String, env: Map[String, String] = sys.env): PipelineConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val raw = asScala(yaml.load[Any](substituteEnv(text, env))) match {
      case m: Map[String, Any] @unchecked => m
      case other => throw new IllegalArgumentException(s"config root must be a mapping, got $other")
    }
    val name = raw.getOrElse("name", "pipeline").toString
    val source = component(raw.get("source") match {
      case Some(m: Map[String, Any] @unchecked) => m
      case _ => throw new IllegalArgumentException("config needs a 'source' mapping")
    }, "source")
    val sink = component(raw.get("sink") match {
      case Some(m: Map[String, Any] @unchecked) => m
      case _ => throw new IllegalArgumentException("config needs a 'sink' mapping")
    }, "sink")
    val transformers = raw.get("transformers") match {
      case Some(l: List[Any] @unchecked) =>
        l.map {
          case m: Map[String, Any] @unchecked => component(m, "transformer")
          case other => throw new IllegalArgumentException(s"transformer entry must be a mapping: $other")
        }
      case None => Nil
      case other => throw new IllegalArgumentException(s"'transformers' must be a list: $other")
    }
    val schema = raw.get("schema") match {
      case Some(m: Map[String, Any] @unchecked) =>
        val strict = m.get("strict").exists(_.toString.toBoolean)
        val cols = m.get("columns") match {
          case Some(l: List[Any] @unchecked) => l.map {
            case cm: Map[String, Any] @unchecked =>
              ColumnSpec(
                cm("name").toString, cm.getOrElse("dtype", "string").toString,
                cm.get("nullable").forall(_.toString.toBoolean),
                cm.get("default"))
            case other => throw new IllegalArgumentException(s"schema column must be a mapping: $other")
          }
          case _ => Nil
        }
        Some(TableSchema(cols, strict))
      case _ => None
    }
    PipelineConfig(name, source, transformers, sink, schema)
  }

  // ---------------------------------------------------------- validation
  /** Error list, not an exception — mirrors config.validate()
    * (config.py:63-88).
    */
  def validate(c: PipelineConfig): Seq[String] = {
    def checkPath(cc: ComponentConfig, what: String): Seq[String] = cc.typ match {
      case t if declaredUnsupported.contains(t) =>
        Seq(s"$what type '$t' is not supported in this build (offline; see SURVEY §7.6)")
      case "api" if what == "source" =>
        Seq(
          if (!cc.options.contains("url")) Some("source api needs url") else None,
          cc.options.get("auth").collect {
            case m: Map[String, Any] @unchecked
              if !Set("basic", "bearer").contains(
                m.getOrElse("type", "").toString.toLowerCase) =>
              "source api auth type must be basic or bearer"
          },
          cc.options.get("pagination").collect {
            case m: Map[String, Any] @unchecked
              if !Set("page", "offset").contains(
                m.getOrElse("type", "").toString.toLowerCase) =>
              "source api pagination type must be page or offset"
          },
        ).flatten
      case "sql" =>
        Seq(
          if (!cc.options.contains("connection_string")) Some(s"$what sql needs connection_string") else None,
          if (what == "source" && cc.options.contains("query") == cc.options.contains("table"))
            Some("source sql needs exactly one of query/table") else None,
          if (what == "sink" && !cc.options.contains("table")) Some("sink sql needs table") else None,
        ).flatten
      case t if (if (what == "source") sourceTypes else sinkTypes).contains(t) =>
        if (cc.options.contains("filepath") || cc.options.contains("path")) Nil
        else Seq(s"$what $t needs filepath")
      case t => Seq(s"unknown $what type '$t'")
    }
    val srcErrs = checkPath(c.source, "source")
    val sinkErrs = checkPath(c.sink, "sink")
    val tErrs = c.transformers.zipWithIndex.flatMap { case (t, i) =>
      if (!transformerTypes.contains(t.typ)) Seq(s"transformer[$i]: unknown type '${t.typ}'")
      else requiredTransformerKey(t.typ).filterNot(t.options.contains)
        .map(k => s"transformer[$i] ${t.typ}: missing '$k'") ++
        valueErrors(t.typ, t.options, s"transformer[$i] ${t.typ}")
    }
    srcErrs ++ sinkErrs ++ tErrs
  }

  /** Value-level checks so config mistakes surface in the pre-run error
    * list, not as a NumberFormatException/MatchError mid-build or a
    * deferred require() after the source has already been read.
    */
  private def valueErrors(typ: String, o: Map[String, Any], at: String): Seq[String] = {
    def numeric(key: String, min: Double, max: Double): Seq[String] = o.get(key) match {
      case None => Nil // absence is the required-key check's job
      case Some(v) => scala.util.Try(v.toString.toDouble).toOption match {
        case None => Seq(s"$at: '$key' must be numeric, got '$v'")
        // NaN fails every comparison, so `d < min || d > max` alone would
        // wave `.nan` through to a deferred require() mid-build
        case Some(d) if d.isNaN || d < min || d > max =>
          Seq(s"$at: '$key' out of [$min, $max]: $d")
        case _ => Nil
      }
    }
    typ match {
      case "hash_sample" => numeric("fraction", 0.0, 1.0)
      case "quality_filter" => numeric("min_score", 0.0, 100000.0)
      case "stratified_sample" =>
        (o.get("fractions") match {
          case None => Nil
          case Some(m: Map[String, Any] @unchecked) =>
            m.toSeq.sortBy(_._1).flatMap { case (k, v) =>
              scala.util.Try(v.toString.toDouble).toOption match {
                case None => Seq(s"$at: fraction for '$k' must be numeric, got '$v'")
                case Some(d) if d.isNaN || d < 0.0 || d > 1.0 =>
                  Seq(s"$at: fraction for '$k' out of [0, 1]: $d")
                case _ => Nil
              }
            }
          case Some(other) => Seq(s"$at: 'fractions' must be a mapping, got '$other'")
        }) ++ numeric("default_fraction", 0.0, 1.0)
      case "temperature_sample" =>
        numeric("target_fraction", 0.0, 1.0) ++
          numeric("alpha", Double.MinPositiveValue, 1.0)
      case "token_budget" => numeric("budget", 0.0, Double.MaxValue)
      case "gopher_filter" =>
        numeric("min_words", 0.0, Double.MaxValue) ++
          numeric("max_words", 0.0, Double.MaxValue)
      case "paragraph_dedup" => numeric("min_chars", 0.0, Int.MaxValue.toDouble)
      case "feature_hash" => numeric("dim", 1.0, 1048576.0)
      case "sigma_outlier_filter" => numeric("k", 1.0, 9.0)
      case "mad_outlier_filter" => numeric("k", 1.0, 9.0)
      case "top_p_select" => numeric("p_basis_points", 0.0, 10000.0)
      case "winsorize" => numeric("lo", 0.0, 1.0) ++ numeric("hi", 0.0, 1.0)
      case _ => Nil
    }
  }

  private def requiredTransformerKey(typ: String): Seq[String] = typ match {
    case "filter" => Seq("condition")
    case "rename" | "cast" => Seq("columns")
    case "select" | "drop" => Seq("columns")
    case "expression" => Seq("expression")
    case "aggregate" | "group" => Seq("aggregations")
    case "sort" => Seq("by")
    case "hash_sample" => Seq("key", "fraction")
    case "stratified_sample" => Seq("key", "strata", "fractions")
    case "pii_redact" => Seq("column")
    case "quality_filter" => Seq("column", "min_score")
    case "exact_dedup" => Seq("content", "key")
    case "gopher_filter" => Seq("column")
    case "temperature_sample" => Seq("key", "strata", "target_fraction")
    case "token_budget" => Seq("strata", "tokens", "budget", "key")
    case "paragraph_dedup" => Seq("text", "key")
    case "normalize_text" => Seq("column")
    case "feature_hash" => Seq("column", "out_column", "dim")
    case "sigma_outlier_filter" => Seq("group_by", "value")
    case "mad_outlier_filter" => Seq("group_by", "value")
    case "top_p_select" => Seq("strata", "mass", "p_basis_points", "tie_break")
    case "winsorize" => Seq("group_by", "value")
    case "impute" => Seq("group_by", "value", "strategy")
    case _ => Nil
  }

  // ------------------------------------------------------------ building
  private def str(o: Map[String, Any], k: String): String = o(k).toString
  private def path(o: Map[String, Any]): String =
    o.get("filepath").orElse(o.get("path")).map(_.toString)
      .getOrElse(throw new IllegalArgumentException("needs filepath"))
  private def strSeq(v: Any): Seq[String] = v match {
    case l: List[Any] @unchecked => l.map(_.toString)
    case s => Seq(s.toString)
  }
  private def strMap(v: Any): Map[String, String] = v match {
    case m: Map[String, Any] @unchecked => m.map { case (k, vv) => k -> vv.toString }
  }

  /** Config → runnable [[Pipeline]] (mirrors build_pipeline,
    * config.py:231-378). Fails on validation errors.
    */
  def build(c: PipelineConfig): Pipeline = {
    val errs = validate(c)
    require(errs.isEmpty, s"invalid config: ${errs.mkString("; ")}")
    val b = new PipelineBuilder(c.name)

    c.source.typ match {
      case "csv" => b.fromCsv(path(c.source.options),
        strMap(c.source.options.getOrElse("options", Map.empty[String, Any])))
      case "json" => b.fromJson(path(c.source.options), lines = false)
      case "jsonl" => b.fromJson(path(c.source.options), lines = true)
      case "parquet" => b.fromParquet(path(c.source.options),
        c.source.options.get("columns").map(strSeq).getOrElse(Nil))
      case "sql" => b.fromJdbc(str(c.source.options, "connection_string"),
        c.source.options.get("table").map(_.toString),
        c.source.options.get("query").map(_.toString))
      case "api" =>
        val o = c.source.options
        val pagination = o.get("pagination") match {
          case Some(m: Map[String, Any] @unchecked) =>
            m.getOrElse("type", "").toString.toLowerCase match {
              case "page" => minietl.io.ApiSource.Pagination.Page(
                pageParam = m.getOrElse("page_param", "page").toString,
                limitParam = m.getOrElse("limit_param", "limit").toString,
                limit = m.getOrElse("limit", 100).toString.toDouble.toInt,
                startPage = m.getOrElse("start_page", 1).toString.toDouble.toInt)
              case "offset" => minietl.io.ApiSource.Pagination.Offset(
                offsetParam = m.getOrElse("offset_param", "offset").toString,
                limitParam = m.getOrElse("limit_param", "limit").toString,
                limit = m.getOrElse("limit", 100).toString.toDouble.toInt)
            }
          case _ => minietl.io.ApiSource.Pagination.None_
        }
        val auth = o.get("auth") match {
          case Some(m: Map[String, Any] @unchecked) =>
            m.getOrElse("type", "").toString.toLowerCase match {
              case "basic" => minietl.io.ApiSource.Auth.Basic(
                str(m, "username"), str(m, "password"))
              case "bearer" => minietl.io.ApiSource.Auth.Bearer(str(m, "token"))
            }
          case _ => minietl.io.ApiSource.Auth.None_
        }
        b.fromSource(s => minietl.io.ApiSource.fetch(s,
          url = str(o, "url"),
          params = o.get("params").map(strMap).getOrElse(Map.empty),
          headers = o.get("headers").map(strMap).getOrElse(Map.empty),
          dataPath = o.get("data_path").map(_.toString).getOrElse(""),
          pagination = pagination,
          auth = auth,
          timeoutSec = o.get("timeout").map(_.toString.toDouble.toInt).getOrElse(30)))
    }

    c.transformers.foreach { t =>
      t.typ match {
        case "filter" => b.filter(str(t.options, "condition"))
        case "rename" => b.rename(strMap(t.options("columns")))
        case "select" => b.select(strSeq(t.options("columns")))
        case "drop" => b.drop(strSeq(t.options("columns")))
        case "cast" => b.cast(strMap(t.options("columns")))
        case "fillna" => b.fillna(t.options.getOrElse("value", 0),
          t.options.get("columns").map(strSeq).getOrElse(Nil))
        case "expression" => b.expression(str(t.options, "expression"))
        case "aggregate" | "group" =>
          val aggs = t.options("aggregations") match {
            case m: Map[String, Any] @unchecked => m.map { case (k, v) => k -> strSeq(v) }
          }
          b.groupAgg(t.options.get("group_by").map(strSeq).getOrElse(Nil), aggs)
        case "dedupe" => b.dedupe(t.options.get("subset").map(strSeq).getOrElse(Nil))
        case "sort" =>
          val by = strSeq(t.options("by"))
          val asc = t.options.get("ascending") match {
            case Some(l: List[Any] @unchecked) => l.map(_.toString.toBoolean)
            case Some(s) => Seq.fill(by.size)(s.toString.toBoolean)
            case None => Nil
          }
          b.sort(by, asc)
        case "hash_sample" =>
          b.hashSample(str(t.options, "key"), str(t.options, "fraction").toDouble)
        case "stratified_sample" =>
          val fractions = t.options("fractions") match {
            case m: Map[String, Any] @unchecked => m.map { case (k, v) => k -> v.toString.toDouble }
            case other => throw new IllegalArgumentException(
              s"stratified_sample 'fractions' must be a mapping, got '$other'")
          }
          b.stratifiedSample(str(t.options, "key"), str(t.options, "strata"), fractions,
            t.options.get("default_fraction").map(_.toString.toDouble).getOrElse(0.0))
        case "pii_redact" => b.piiRedact(str(t.options, "column"))
        case "quality_filter" =>
          // toDouble.toLong: YAML may well say 50000.0 for a score threshold
          b.qualityFilter(str(t.options, "column"), str(t.options, "min_score").toDouble.toLong)
        case "exact_dedup" =>
          b.exactDedup(str(t.options, "content"), str(t.options, "key"))
        case "gopher_filter" =>
          b.gopherFilter(str(t.options, "column"),
            t.options.get("min_words").map(_.toString.toDouble.toLong).getOrElse(50L),
            t.options.get("max_words").map(_.toString.toDouble.toLong).getOrElse(100000L))
        case "temperature_sample" =>
          b.temperatureSample(str(t.options, "key"), str(t.options, "strata"),
            str(t.options, "target_fraction").toDouble,
            t.options.get("alpha").map(_.toString.toDouble).getOrElse(0.5))
        case "token_budget" =>
          b.tokenBudget(str(t.options, "strata"), str(t.options, "tokens"),
            str(t.options, "budget").toDouble.toLong,
            str(t.options, "key"),
            t.options.get("seed").map(_.toString).getOrElse("0"))
        case "paragraph_dedup" =>
          b.paragraphDedup(str(t.options, "text"), str(t.options, "key"),
            t.options.get("delim").map(_.toString).getOrElse("\n"),
            t.options.get("min_chars").map(_.toString.toDouble.toInt).getOrElse(0))
        case "normalize_text" => b.normalizeText(str(t.options, "column"))
        case "feature_hash" =>
          b.featureHash(str(t.options, "column"), str(t.options, "out_column"),
            str(t.options, "dim").toDouble.toInt)
        case "sigma_outlier_filter" =>
          b.sigmaOutlierFilter(strSeq(t.options("group_by")),
            str(t.options, "value"),
            t.options.get("k").map(_.toString.toDouble.toInt).getOrElse(3))
        case "mad_outlier_filter" =>
          b.madOutlierFilter(strSeq(t.options("group_by")),
            str(t.options, "value"),
            t.options.get("k").map(_.toString.toDouble.toInt).getOrElse(3))
        case "top_p_select" =>
          b.topPSelect(str(t.options, "strata"), str(t.options, "mass"),
            str(t.options, "p_basis_points").toDouble.toInt,
            str(t.options, "tie_break"))
        case "winsorize" =>
          b.winsorize(strSeq(t.options("group_by")), str(t.options, "value"),
            t.options.get("lo").map(_.toString.toDouble).getOrElse(0.01),
            t.options.get("hi").map(_.toString.toDouble).getOrElse(0.99))
        case "impute" =>
          b.impute(strSeq(t.options("group_by")), str(t.options, "value"),
            str(t.options, "strategy"))
      }
    }

    c.schema.foreach(b.withSchema)

    val mode = c.sink.options.get("mode").map(_.toString).getOrElse("overwrite")
    c.sink.typ match {
      case "csv" => b.toCsv(path(c.sink.options), mode)
      case "json" | "jsonl" => b.toJson(path(c.sink.options), mode)
      case "parquet" => b.toParquet(path(c.sink.options), mode,
        c.sink.options.get("partition_cols").map(strSeq).getOrElse(Nil))
      case "sql" => b.toJdbc(str(c.sink.options, "connection_string"),
        str(c.sink.options, "table"),
        c.sink.options.get("if_exists").map(_.toString).getOrElse("append"))
    }

    b.build()
  }

  /** One-call load: YAML text → runnable pipeline. */
  def load(text: String, env: Map[String, String] = sys.env): Pipeline =
    build(parse(text, env))

  /** Sample config (reference: config.py:381-416 generate_sample_config). */
  val sample: String =
    """name: sample_pipeline
      |source:
      |  type: csv
      |  filepath: input.csv
      |transformers:
      |  - type: filter
      |    condition: "value > 100"
      |  - type: rename
      |    columns: {old_name: new_name}
      |  - type: cast
      |    columns: {value: float64}
      |sink:
      |  type: parquet
      |  filepath: output.parquet
      |  mode: overwrite
      |""".stripMargin
}
