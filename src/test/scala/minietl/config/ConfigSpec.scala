package minietl.config

import java.nio.file.Files

import minietl.SparkTestBase
import minietl.io.{Readers, Writers}
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("minietl-cfg").toString

  /** Recursive data-file count — digests/sinks use batch=<id> subdirs. */
  private def parquetFilesUnder(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  test("env-var substitution covers ${VAR} and $VAR, leaves unknown verbatim") {
    val env = Map("DATA_DIR" -> "/data", "N" -> "5")
    assert(Config.substituteEnv("path: ${DATA_DIR}/in.csv", env) === "path: /data/in.csv")
    assert(Config.substituteEnv("limit: $N rows", env) === "limit: 5 rows")
    assert(Config.substituteEnv("keep ${UNKNOWN_XYZ}", env) === "keep ${UNKNOWN_XYZ}")
  }

  test("parse builds the model from YAML") {
    val c = Config.parse(Config.sample)
    assert(c.name === "sample_pipeline")
    assert(c.source.typ === "csv")
    assert(c.transformers.map(_.typ) === Seq("filter", "rename", "cast"))
    assert(c.sink.typ === "parquet")
    assert(Config.validate(c) === Nil)
  }

  test("validate reports unknown types and missing keys as a list") {
    val bad = Config.parse(
      """name: bad
        |source: {type: teleport, filepath: x}
        |transformers:
        |  - {type: filter}
        |  - {type: frobnicate}
        |sink: {type: csv}
        |""".stripMargin)
    val errs = Config.validate(bad)
    assert(errs.exists(_.contains("unknown source type 'teleport'")))
    assert(errs.exists(_.contains("missing 'condition'")))
    assert(errs.exists(_.contains("unknown type 'frobnicate'")))
    assert(errs.exists(_.contains("sink csv needs filepath")))
  }

  test("excel validates as source and sink; api is a source, not a sink") {
    val c = Config.parse(
      """source: {type: excel, filepath: a.xlsx}
        |sink: {type: api, path: http://x}
        |""".stripMargin)
    val errs = Config.validate(c)
    assert(!errs.exists(_.contains("excel")))
    assert(errs.exists(_.contains("unknown sink type 'api'")))
  }

  test("sql source requires exactly one of query/table") {
    def cfg(extra: String) = Config.parse(
      s"""source: {type: sql, connection_string: "jdbc:h2:mem", $extra}
         |sink: {type: parquet, filepath: /tmp/x}
         |""".stripMargin)
    assert(Config.validate(cfg("query: 'SELECT 1', table: t")).nonEmpty)
    assert(Config.validate(cfg("table: t")) === Nil)
  }

  test("a sql source → transform → sql sink pipeline runs from YAML against live Derby") {
    // reference registers sql as both source and sink
    // (mini_etl/core/config.py:264-297,344-378); this drives the full YAML
    // path against an embedded Derby database, not just the Readers/Writers
    // layer that JdbcSpec covers.
    import spark.implicits._
    val dbDir = java.nio.file.Files.createTempDirectory("minietl-cfg-derby").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    minietl.io.Writers.jdbc(
      Seq((1L, "ann", 10.5), (2L, "bob", 20.5), (3L, "cat", 30.5), (4L, "dan", 40.5))
        .toDF("id", "name", "score"),
      url, "people_src", ifExists = "append")
    val yaml =
      s"""name: sql_roundtrip
         |source:
         |  type: sql
         |  connection_string: "$url"
         |  table: people_src
         |transformers:
         |  - type: filter
         |    condition: "score > 15"
         |  - type: rename
         |    columns: {score: points}
         |sink:
         |  type: sql
         |  connection_string: "$url"
         |  table: people_out
         |  if_exists: replace
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    val stats = Config.load(yaml).run(spark)
    assert(stats.rows === 3)
    val back = minietl.io.Readers.jdbc(spark, url, table = Some("people_out"))
    assert(back.columns.map(_.toLowerCase).sorted.toSeq === Seq("id", "name", "points"))
    assert(back.agg(org.apache.spark.sql.functions.sum("points")).as[Double].collect()(0) === 91.5)
    // if_exists: replace really replaces on a re-run, not accumulates
    assert(Config.load(yaml).run(spark).rows === 3)
    assert(minietl.io.Readers.jdbc(spark, url, table = Some("people_out")).count() === 3)
  }

  test("reader mode/schema/bad_records_path flow from YAML for malformed csv") {
    val dir = tmp()
    val in = s"$dir/in.csv"
    Files.writeString(java.nio.file.Paths.get(in),
      """id,name,score
        |1,ann,10.5
        |2,bob,oops
        |3,cat,30.5
        |4,dan,40.5,extra,fields
        |""".stripMargin)
    def yaml(extra: String) =
      s"""name: bad_rows
         |source:
         |  type: csv
         |  filepath: $in
         |  schema:
         |    - {name: id, dtype: int64}
         |    - {name: name, dtype: string}
         |    - {name: score, dtype: float}
         |$extra
         |sink: {type: parquet, filepath: $dir/out}
         |""".stripMargin

    // dropmalformed: unparseable score + wrong field count both drop
    val dropped = yaml("  mode: dropmalformed")
    assert(Config.validate(Config.parse(dropped)).isEmpty)
    assert(Config.load(dropped).run(spark).rows === 2)

    // bad_records_path: clean rows flow on, raw bad lines captured as JSONL
    val brp = s"$dir/bad"
    val captured = yaml(s"  bad_records_path: $brp")
    assert(Config.validate(Config.parse(captured)).isEmpty)
    assert(Config.load(captured).run(spark).rows === 2)
    val bad = spark.read.json(brp)
    assert(bad.count() === 2)
    import spark.implicits._
    val rawLines = bad.select("bad_record").as[String].collect().sorted
    assert(rawLines(0) === "2,bob,oops")
    assert(rawLines(1) === "4,dan,40.5,extra,fields")

    // a RE-RUN overwrites the capture (append would duplicate the same bad
    // lines on every run — the capture reflects the latest read)
    assert(Config.load(captured).run(spark).rows === 2)
    assert(spark.read.json(brp).count() === 2)

    // mode + bad_records_path is rejected up front (the capture read is
    // always PERMISSIVE; a user mode would be silently overridden)
    val conflicting = Config.validate(Config.parse(
      yaml(s"  mode: failfast\n  bad_records_path: $brp")))
    assert(conflicting.exists(_.contains("cannot be combined")), conflicting.toString)

    // validation rejects bad mode values, dtypes, and schema-less capture
    assert(Config.validate(Config.parse(yaml("  mode: lenient"))).nonEmpty)
    assert(Config.validate(Config.parse(
      s"""source: {type: csv, filepath: $in, bad_records_path: $brp}
         |sink: {type: parquet, filepath: $dir/out2}
         |""".stripMargin)).nonEmpty)
    assert(Config.validate(Config.parse(
      s"""source:
         |  type: csv
         |  filepath: $in
         |  schema: [{name: id, dtype: nonsense_type}]
         |sink: {type: parquet, filepath: $dir/out3}
         |""".stripMargin)).nonEmpty)
  }

  test("a stream: YAML drains a staged file stream and matches the batch twin") {
    val dir = tmp()
    val in = s"$dir/incoming"
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val events = Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(2), "view", -5.0),
      (ts(6), "click", 10.0), (ts(7), "view", 4.0), (ts(12), "click", 8.0))
      .toDF("ts", "event_type", "value")
    events.coalesce(1).write.parquet(in)
    val qname = "cfg_stream_win"
    val yaml =
      s"""name: cfg_stream
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: ts, dtype: timestamp}
         |      - {name: event_type, dtype: string}
         |      - {name: value, dtype: float64}
         |  watermark: {column: ts, delay: 0 seconds}
         |  stages:
         |    - {type: filter, condition: "value > 0"}
         |    - type: window_agg
         |      window: 5 minutes
         |      keys: [event_type]
         |      aggregations: {value: [sum, count]}
         |  sink:
         |    type: memory
         |    query_name: $qname
         |    checkpoint: $dir/chk
         |    output_mode: complete
         |    trigger: available_now
         |""".stripMargin
    assert(Config.isStreamConfig(yaml) && !Config.isDagConfig(yaml))
    val pipe = Config.loadStream(yaml)
    pipe.runAvailableNow(spark)
    import org.apache.spark.sql.functions._
    val got = spark.table(qname)
      .select(col("window.start").cast("string"), col("event_type"),
        col("value_sum"), col("value_count"))
      .as[(String, String, Double, Long)].collect().toSet
    // batch twin: same filter + 5-minute floor + agg over the same parquet
    val expected = spark.read.parquet(in)
      .where(col("value") > 0)
      .groupBy(from_unixtime(floor(unix_timestamp(col("ts")) / 300) * 300)
          .cast("timestamp").cast("string").as("w"), col("event_type"))
      .agg(sum("value").as("s"), count("value").as("n"))
      .as[(String, String, Double, Long)].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("a stream: YAML session_agg merges gapped sessions like the batch islands") {
    val dir = tmp()
    val in = s"$dir/sess_in"
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // user 1: 10:00+10:03 merge (gap 5m), 10:20 separate; user 2: one session
    Seq((ts(0), 1L, 1.0), (ts(3), 1L, 2.0), (ts(20), 1L, 5.0), (ts(1), 2L, 7.0))
      .toDF("ts", "user_id", "value").coalesce(1).write.parquet(in)
    val qname = "cfg_stream_sess"
    Config.loadStream(
      s"""name: cfg_sess
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: ts, dtype: timestamp}
         |      - {name: user_id, dtype: int64}
         |      - {name: value, dtype: float64}
         |  watermark: {column: ts, delay: 0 seconds}
         |  stages:
         |    - type: session_agg
         |      gap: 5 minutes
         |      keys: [user_id]
         |      aggregations: {value: [sum, count]}
         |  sink:
         |    type: memory
         |    query_name: $qname
         |    checkpoint: $dir/chk
         |    output_mode: complete
         |""".stripMargin).runAvailableNow(spark)
    import org.apache.spark.sql.functions._
    val got = spark.table(qname)
      .select(col("user_id"), col("session_window.start").cast("string"),
        col("value_sum"), col("value_count"))
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got === Set(
      (1L, "2026-01-01 10:00:00", 3.0, 2L),
      (1L, "2026-01-01 10:20:00", 5.0, 1L),
      (2L, "2026-01-01 10:01:00", 7.0, 1L)))
  }

  test("stream: YAML validation rejects unstreamable shapes up front") {
    def errsOf(y: String) = Config.validateStream(Config.parseStream(y))
    // missing schema, stateful stage without watermark, global sort, bad
    // trigger, memory sink without query_name
    val errs = errsOf(
      """stream:
        |  source: {type: parquet, path: /x}
        |  stages:
        |    - {type: window_agg, window: 5 minutes, keys: [k], aggregations: {v: [sum]}}
        |    - {type: sort, by: [k]}
        |    - {type: frobnicate}
        |  sink: {type: memory, trigger: whenever}
        |""".stripMargin)
    assert(errs.exists(_.contains("needs an explicit 'schema'")), errs.toString)
    assert(errs.exists(_.contains("requires a 'watermark' block")), errs.toString)
    assert(errs.exists(_.contains("'sort' is not streamable")), errs.toString)
    assert(errs.exists(_.contains("unknown type 'frobnicate'")), errs.toString)
    assert(errs.exists(_.contains("trigger must be available_now or an interval")), errs.toString)
    assert(errs.exists(_.contains("memory sink needs query_name")), errs.toString)
    // a durable sink without a checkpoint is rejected (re-runs would
    // re-ingest everything and duplicate output)
    assert(errsOf(
      """stream:
        |  source:
        |    type: csv
        |    path: /x
        |    schema: [{name: ts, dtype: timestamp}, {name: k, dtype: string}]
        |  watermark: {column: ts, delay: 1 minute}
        |  stages:
        |    - {type: dedup, keys: [k]}
        |  sink: {type: parquet, path: /y, trigger: 30s}
        |""".stripMargin).exists(_.contains("needs a 'checkpoint'")))
    // a good config has no errors (interval trigger accepted)
    assert(errsOf(
      """stream:
        |  source:
        |    type: csv
        |    path: /x
        |    schema: [{name: ts, dtype: timestamp}, {name: k, dtype: string}]
        |  watermark: {column: ts, delay: 1 minute}
        |  stages:
        |    - {type: dedup, keys: [k]}
        |  sink: {type: parquet, path: /y, checkpoint: /chk, trigger: 30s}
        |""".stripMargin) === Nil)
  }

  test("bpe_stats stage trains on the frame and joins subword stats from YAML") {
    val dir = tmp()
    val in = s"$dir/bpe_docs"
    Seq((1L, "aaab aab"), (2L, "aaab"), (3L, "")).toDF("doc_id", "text")
      .write.parquet(in)
    val yaml =
      s"""name: bpe_pipe
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: bpe_stats, key: doc_id, column: text, num_merges: 3}
         |sink: {type: parquet, filepath: $dir/out}
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    assert(Config.load(yaml).run(spark).rows === 3)
    val out = Readers.parquet(spark, s"$dir/out")
      .select("doc_id", "n_tokens", "n_subwords").orderBy("doc_id").collect()
    // merges (BpeSpec hand example): aaab -> [aaab], aab -> [aa, b]
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 3L)
    assert(out(1).getLong(1) === 1L && out(1).getLong(2) === 1L)
    assert(out(2).isNullAt(1)) // empty doc: left join keeps it with nulls
    // bad num_merges is a pre-run validation error
    assert(Config.validate(Config.parse(yaml.replace("num_merges: 3", "num_merges: 0")))
      .exists(_.contains("num_merges")))
  }

  test("bpe_stats trains ONCE per pipeline build even across recompiles and fan-out") {
    val dir = tmp()
    Seq((1L, "aaab aab"), (2L, "aaab")).toDF("doc_id", "text")
      .write.parquet(s"$dir/docs")
    val dag = Config.loadDag(
      s"""name: bpe_once
         |dag:
         |  sources:
         |    docs: {type: parquet, path: $dir/docs}
         |  nodes:
         |    - id: stats
         |      input: docs
         |      transform: {type: bpe_stats, key: doc_id, column: text, num_merges: 3}
         |  sinks:
         |    a: {input: stats, type: parquet, path: $dir/a}
         |    b: {input: stats, type: parquet, path: $dir/b}
         |""".stripMargin)
    val before = minietl.text.Bpe.trainInvocations.get()
    assert(dag.run(spark) === Map("a" -> 2L, "b" -> 2L))
    // re-materializing the node (a second compile of the same build) must
    // hit the memoized model, not re-run the word-count groupBy + greedy loop
    assert(dag.frame(spark, "stats").count() === 2L)
    assert(minietl.text.Bpe.trainInvocations.get() - before === 1L)
  }

  test("runAvailableNow overrides an interval trigger so one-shot runs terminate") {
    val dir = tmp()
    val in = s"$dir/iv_in"
    Seq((java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2026-01-01 10:01:00"), "a", 2.0))
      .toDF("ts", "event_type", "value").coalesce(1).write.parquet(in)
    val qname = "cfg_stream_interval"
    // trigger: 30s — without the AvailableNow override this would sit in
    // awaitTermination forever (the interval query never terminates)
    Config.loadStream(
      s"""name: cfg_interval
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: ts, dtype: timestamp}
         |      - {name: event_type, dtype: string}
         |      - {name: value, dtype: float64}
         |  watermark: {column: ts, delay: 0 seconds}
         |  stages:
         |    - type: window_agg
         |      window: 5 minutes
         |      keys: [event_type]
         |      aggregations: {value: [sum]}
         |  sink:
         |    type: memory
         |    query_name: $qname
         |    checkpoint: $dir/chk
         |    output_mode: complete
         |    trigger: 30s
         |""".stripMargin).runAvailableNow(spark)
    import org.apache.spark.sql.functions._
    assert(spark.table(qname).select(col("event_type"), col("value_sum"))
      .as[(String, Double)].collect().toSet === Set(("a", 3.0)))
  }

  test("dedup_history stage runs the self-maintaining ingest-dedup loop from YAML") {
    val dir = tmp()
    val in = s"$dir/docs_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val yaml =
      s"""name: ingest_dedup
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: doc_id, dtype: int64}
         |      - {name: text, dtype: string}
         |  stages:
         |    - type: dedup_history
         |      history: $dir/digest
         |      columns: [text]
         |      compact_after: true
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    assert(Config.validateStream(Config.parseStream(yaml)).isEmpty)
    // run 1: doc 2 and 3 duplicate WITHIN the staged input → one survivor;
    // null text and EMPTY text are DISTINCT fingerprints (the JSON
    // encoding is null-faithful — a separator join would collapse them)
    Seq((1L, "alpha"), (2L, "beta"), (3L, "beta"), (4L, null), (5L, ""))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    val round1 = Readers.parquet(spark, s"$dir/out").select("text")
      .as[String].collect().toSeq
    assert(round1.sortBy(s => if (s == null) "" else s).length === 4)
    assert(round1.count(_ == null) === 1 && round1.count(_ == "") === 1)
    // run 2: new files arrive; "alpha" is history (CROSS-run dup via the
    // digest), only "gamma" is admitted — and the digest grew by it
    Seq((6L, "alpha"), (7L, "gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    val round2 = Readers.parquet(spark, s"$dir/out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(round2.map(_._1).filter(_ >= 6L) === Seq(7L)) // only gamma's row is new
    assert(round2.map(_._2).contains("gamma") && round2.length === 5)
    // the derived __fp column is digest-internal, not sink output
    assert(!Readers.parquet(spark, s"$dir/out").columns.contains("__fp"))
    assert(spark.read.parquet(s"$dir/digest").select("__fp").distinct().count() === 5L)
    // compact_after collapsed the per-batch digest deltas to one file
    // (under the uniform batch=-1 partition of the idempotent layout)
    assert(parquetFilesUnder(s"$dir/digest") === 1)
    // structural validation: must be last, file-sink-only, one fingerprint spec
    assert(Config.validateStream(Config.parseStream(yaml.replace(
      "columns: [text]", "columns: [text]\n      key: text")))
      .exists(_.contains("exactly one")))
    val memSink = yaml
      .replace(s"type: parquet\n    path: $dir/out", "type: memory\n    query_name: x")
    assert(Config.validateStream(Config.parseStream(memSink))
      .exists(_.contains("file sink")))
  }

  test("media_hash_history stage runs the perceptual ingest loop from YAML") {
    val dir = tmp()
    val in = s"$dir/media_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    // contour-controlled WAVs (the PerceptualAudioSpec construction)
    def wav(bits: Set[Int]): Array[Byte] = {
      val n = minietl.multimodal.PerceptualAudio.Windows
      val samples = new Array[Short](n * 4)
      var amp = 100
      (0 until n).foreach { w =>
        if (w > 0 && bits(w - 1)) amp += 10
        (0 until 4).foreach(k => samples(w * 4 + k) = amp.toShort)
      }
      minietl.multimodal.Multimodal.pcm16Wav(samples, 8000)
    }
    val yaml =
      s"""name: media_dedup
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: media_id, dtype: int64}
         |      - {name: content, dtype: binary}
         |  stages:
         |    - type: media_hash_history
         |      history: $dir/digest
         |      id: media_id
         |      content: content
         |      kind: audio
         |      max_dist: 2
         |      compact_after: true
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    assert(Config.validateStream(Config.parseStream(yaml)).isEmpty)
    // drain 1: 2 is a byte-identical dup of 1 within the staged input;
    // 3 is far from everything; 4 is undecodable (must pass through)
    Seq((1L, wav(Set())), (2L, wav(Set())),
        (3L, wav(Set(10, 20, 30, 40, 50))), (4L, Array[Byte](1)))
      .toDF("media_id", "content")
      .coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    val r1 = Readers.parquet(spark, s"$dir/out").select("media_id")
      .as[Long].collect().toSet
    assert(r1 === Set(1L, 3L, 4L))
    // drain 2: 5 sits at Hamming distance 2 from admitted 1 -> dropped
    // VERIFIED against the digest's stored hash; 6 at distance >= 3 from
    // every admitted hash -> admitted
    Seq((5L, wav(Set(0, 1))), (6L, wav(Set(40, 41, 42))))
      .toDF("media_id", "content")
      .coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    val r2 = Readers.parquet(spark, s"$dir/out").select("media_id")
      .as[Long].collect().toSet
    assert(r2 === Set(1L, 3L, 4L, 6L))
    // digest carries (band, key, hash) rows — never payload bytes — and
    // compact_after collapsed it to the uniform batch=-1 layout
    val digest = spark.read.parquet(s"$dir/digest")
    assert(digest.columns.toSet === Set("band", "key", "hash", "batch"))
    assert(digest.count() === 4L * 3) // admitted decodable: 1, 3, 6
    // validation surface: kind, max_dist, and the shared structural rules
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("kind: audio", "kind: video")))
      .exists(_.contains("kind must be")))
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("max_dist: 2", "max_dist: 9")))
      .exists(_.contains("max_dist")))
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("      id: media_id\n", "")))
      .exists(_.contains("missing 'id'")))
  }

  test("media_hash_history replays a crashed batch exactly once from YAML " +
    "(VERDICT r16 Next #2)") {
    // The q_stream_dedup_history crash pattern, pinned at the surface
    // users invoke: batch 0 commits cleanly; a batch-1 attempt "crashes"
    // after its sink write but before the checkpoint commit, leaving (a)
    // a WRONG batchId-keyed sink dir (the attempt sank rows the verified
    // dedup would drop) and (b) a TORN digest delta carrying the new
    // row's own fingerprint. The restart must discard the torn delta
    // (else row 6 dedups against itself and is falsely dropped),
    // re-verify row 5 against the committed digest, and OVERWRITE the
    // fabricated sink dir — exactly-once without any appended duplicates.
    val dir = tmp()
    val in = s"$dir/media_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def wav(bits: Set[Int]): Array[Byte] = {
      val n = minietl.multimodal.PerceptualAudio.Windows
      val samples = new Array[Short](n * 4)
      var amp = 100
      (0 until n).foreach { w =>
        if (w > 0 && bits(w - 1)) amp += 10
        (0 until 4).foreach(k => samples(w * 4 + k) = amp.toShort)
      }
      minietl.multimodal.Multimodal.pcm16Wav(samples, 8000)
    }
    val yaml =
      s"""name: media_dedup_replay
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: media_id, dtype: int64}
         |      - {name: content, dtype: binary}
         |  stages:
         |    - type: media_hash_history
         |      history: $dir/digest
         |      id: media_id
         |      content: content
         |      kind: audio
         |      max_dist: 2
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    // batch 0: 1 admitted, 2 is a byte-identical dup, 3 far from both
    Seq((1L, wav(Set())), (2L, wav(Set())), (3L, wav(Set(10, 20, 30, 40, 50))))
      .toDF("media_id", "content")
      .coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    assert(Readers.parquet(spark, s"$dir/out").select("media_id")
      .as[Long].collect().toSet === Set(1L, 3L))
    // stage batch 1: 5 at Hamming distance 2 from admitted 1 (must drop,
    // verified against the stored hash), 6 new (must admit)
    val w5 = wav(Set(0, 1))
    val w6 = wav(Set(40, 41, 42))
    Seq((5L, w5), (6L, w6)).toDF("media_id", "content")
      .coalesce(1).write.mode("append").parquet(in)
    // fabricate the crashed attempt's leftovers BEFORE the restart:
    // (a) the sink dir the attempt wrote — wrongly including 5
    Seq((5L, w5), (6L, w6)).toDF("media_id", "content")
      .write.mode("overwrite")
      .parquet(minietl.streaming.Streaming.batchOutputPath(s"$dir/out", 1L))
    // (b) the torn digest delta with 6's OWN band rows
    val bands6 = minietl.multimodal.PerceptualAudio
      .energyHashFrame(Seq((6L, w6)).toDF("media_id", "content"),
        "media_id", "content")
      .selectExpr("explode(sequence(0, 3)) AS band", "ahash")
      .selectExpr("band", "shiftright(ahash, 14 * band) & 16383 AS key",
        "ahash AS hash")
    assert(bands6.count() === 4)
    bands6.write.mode("overwrite")
      .parquet(minietl.streaming.Streaming.batchOutputPath(s"$dir/digest", 1L))
    // restart: batch 1 replays under the same id
    Config.loadStream(yaml).runAvailableNow(spark)
    // exactly-once: 5 gone (including its fabricated sink row), 6 admitted
    // exactly once despite its torn fingerprint having been on disk
    val sunk = Readers.parquet(spark, s"$dir/out").select("media_id")
      .as[Long].collect().toSeq
    assert(sunk.sorted === Seq(1L, 3L, 6L))
    // digest = bands of exactly the admitted set
    val digest = spark.read.parquet(s"$dir/digest")
    assert(digest.count() === 3L * 4)
  }

  test("neardup_history stage runs the near-dup ingest loop from YAML") {
    val dir = tmp()
    val in = s"$dir/nd_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val yaml =
      s"""name: nd_ingest
         |stream:
         |  source:
         |    type: parquet
         |    path: $in
         |    schema:
         |      - {name: doc_id, dtype: int64}
         |      - {name: text, dtype: string}
         |  stages:
         |    - type: neardup_history
         |      history: $dir/bands
         |      id: doc_id
         |      column: text
         |      threshold: 0.6
         |      verify: true
         |      compact_after: true
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    assert(Config.validateStream(Config.parseStream(yaml)).isEmpty)
    // run 1: a near-dup pair within the batch → keep min id; one distinct
    Seq((1L, words("alpha", 20)), (2L, words("alpha", 19) + " changed"),
        (3L, words("gamma", 20)))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    assert(Readers.parquet(spark, s"$dir/out").select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // run 2: near-dup of an ADMITTED doc (cross-run, via the band digest)
    // is dropped; a fresh doc is admitted
    Seq((4L, words("alpha", 19) + " mutated"), (5L, words("delta", 20)))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Config.loadStream(yaml).runAvailableNow(spark)
    assert(Readers.parquet(spark, s"$dir/out").select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L, 5L))
    // verified-mode digest layout: 32 band rows per admitted doc + one
    // signature row per doc, each sub-digest compacted to one file
    assert(spark.read.parquet(s"$dir/bands/bands").count() === 96L)
    assert(spark.read.parquet(s"$dir/bands/sigs").count() === 3L)
    Seq("bands", "sigs").foreach { sub =>
      assert(parquetFilesUnder(s"$dir/bands/$sub") === 1, sub)
    }
    // validation: missing id / bad threshold are pre-run errors
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("      id: doc_id\n", ""))).exists(_.contains("'id'")))
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("threshold: 0.6", "threshold: 1.5"))).exists(_.contains("threshold")))
    // num_hashes must divide into bands — a drain-time require otherwise
    assert(Config.validateStream(Config.parseStream(yaml.replace(
      "threshold: 0.6", "threshold: 0.6\n      num_hashes: 100")))
      .exists(_.contains("multiple of bands")))
    // output_mode has no meaning for the foreachBatch loop — rejected, not
    // silently ignored
    assert(Config.validateStream(Config.parseStream(yaml.replace(
      s"checkpoint: $dir/chk", s"checkpoint: $dir/chk\n    output_mode: append")))
      .exists(_.contains("output_mode")))
  }

  test("dedup_history runs from a rate source — the streaming surface is not file-bound") {
    val dir = tmp()
    // rate generator → derive a 3-bucket fingerprint → the ingest-dedup
    // loop admits each bucket exactly once EVER, however many rows the
    // generator emits — timing-independent assertion for a wall-clock
    // source
    val yaml =
      s"""name: rate_ingest
         |stream:
         |  source:
         |    type: rate
         |    options: {rowsPerSecond: "200"}
         |  stages:
         |    - {type: expression, expression: "bucket = value % 3"}
         |    - type: dedup_history
         |      history: $dir/digest
         |      key: bucket
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    val cfg = Config.parseStream(yaml)
    assert(Config.validateStream(cfg).isEmpty)
    val q = Config.buildStream(cfg).startWith(spark,
      Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)))
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def sunkRows(): Long =
        // reading concurrently with the stream's writes: any transient
        // read failure (no files yet, in-flight batch dir) counts as 0
        try spark.read.parquet(s"$dir/out").count()
        catch { case _: Exception => 0L }
      while (sunkRows() < 3 && System.nanoTime() < deadline) Thread.sleep(200)
    } finally q.stop()
    val out = spark.read.parquet(s"$dir/out")
    val buckets = out.select("bucket").as[Long].collect().toSeq
    // exactly-once per fingerprint: every admitted bucket value is unique
    assert(buckets.distinct.size === buckets.size)
    assert(buckets.toSet.subsetOf(Set(0L, 1L, 2L)) && buckets.nonEmpty)
    assert(spark.read.parquet(s"$dir/digest").select("bucket")
      .as[Long].collect().toSet === buckets.toSet)
    // validation: generator sources take no path/schema
    assert(Config.validateStream(Config.parseStream(yaml.replace(
      "    options: {rowsPerSecond: \"200\"}",
      "    options: {rowsPerSecond: \"200\"}\n    path: /nope")))
      .exists(_.contains("no path")))
    assert(Config.validateStream(Config.parseStream(
      yaml.replace("type: rate", "type: socket")))
      .exists(_.contains("options.host")))
  }

  test("dedup_history runs from a socket source — push-based, no files anywhere") {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val dir = tmp()
    val yaml =
      s"""name: socket_ingest
         |stream:
         |  source:
         |    type: socket
         |    options: {host: "127.0.0.1", port: "${server.getLocalPort}"}
         |  stages:
         |    - type: dedup_history
         |      history: $dir/digest
         |      key: value
         |  sink:
         |    type: parquet
         |    path: $dir/out
         |    checkpoint: $dir/chk
         |""".stripMargin
    val cfg = Config.parseStream(yaml)
    assert(Config.validateStream(cfg).isEmpty)
    // the source CONNECTS to us: accept once and keep pushing duplicate
    // lines until told to stop (closing early would fail the query)
    @volatile var stop = false
    val writer = new Thread(() => {
      try {
        val s = server.accept()
        val out = new java.io.PrintWriter(s.getOutputStream, true)
        val words = Array("xx", "yy", "zz")
        var i = 0
        while (!stop) { out.println(words(i % 3)); i += 1; Thread.sleep(25) }
        s.close()
      } catch { case _: Exception => () }
    }, "socket-ingest-writer")
    writer.setDaemon(true)
    writer.start()
    val q = Config.buildStream(cfg).startWith(spark,
      Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)))
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def sunk(): Long =
        try spark.read.parquet(s"$dir/out").count()
        catch { case _: Exception => 0L }
      while (sunk() < 3 && System.nanoTime() < deadline) Thread.sleep(200)
    } finally { q.stop(); stop = true; server.close() }
    // exactly-once per line value, however many duplicates were pushed
    val vals = spark.read.parquet(s"$dir/out").select("value")
      .as[String].collect().toSeq
    assert(vals.distinct.size === vals.size)
    assert(vals.toSet.subsetOf(Set("xx", "yy", "zz")) && vals.nonEmpty)
  }

  test("semantic_decontaminate stage drops embedding-near-benchmark rows from YAML") {
    val dir = tmp()
    val in = s"$dir/vecs"
    val bench = s"$dir/bench"
    // rows 1 and 4 duplicate the benchmark vector; 2 and 3 are orthogonal
    Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(0f, 0f, 1f)), (4L, Seq(1f, 0f, 0f)))
      .toDF("vec_id", "embedding").write.parquet(in)
    Seq(Tuple1(Seq(1f, 0f, 0f))).toDF("embedding").write.parquet(bench)
    val yaml =
      s"""name: sem_decon
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - type: semantic_decontaminate
         |    key: vec_id
         |    column: embedding
         |    benchmark_filepath: $bench
         |    threshold: 0.95
         |    dim: 3
         |    bits_per_band: 2
         |    bands: 6
         |sink: {type: parquet, filepath: $dir/out}
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    // the run must leave NO cache pins behind: the stage's flagged-id
    // localCheckpoint registers with the RunCaches scope Pipeline.run
    // opens, and is released once the sink action completes
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    assert(Config.load(yaml).run(spark).rows === 2)
    assert(spark.sparkContext.getPersistentRDDs.keySet === pinnedBefore)
    assert(Readers.parquet(spark, s"$dir/out").select("vec_id")
      .as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    // threshold out of range is a pre-run validation error
    assert(Config.validate(Config.parse(yaml.replace("threshold: 0.95", "threshold: 1.5")))
      .exists(_.contains("threshold")))
  }

  test("lm_surprise and contamination_filter stages run from YAML") {
    val dir = tmp()
    val in = s"$dir/docs"
    val bench = s"$dir/bench"
    // doc 3 is a verbatim copy of the benchmark text → 100% shingle overlap
    Writers.csv(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated writing about distributed query engines here"),
      (3L, "held out benchmark prompt that must never reach the training set"))
      .toDF("doc_id", "text"), in)
    Writers.parquet(
      Seq((0L, "held out benchmark prompt that must never reach the training set"))
        .toDF("bench_id", "text"), bench)
    val yaml =
      s"""name: lm_and_decontam
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: contamination_filter
         |    key: doc_id
         |    column: text
         |    benchmark_filepath: $bench
         |    n: 5
         |    max_permille: 500
         |  - type: lm_surprise
         |    key: doc_id
         |    column: text
         |sink: {type: parquet, filepath: $dir/out}
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    val stats = Config.load(yaml).run(spark)
    assert(stats.rows === 2) // doc 3 filtered as contaminated
    val back = Readers.parquet(spark, s"$dir/out")
    assert(back.columns.toSet.contains("avg_millibits"))
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // validation catches out-of-range thresholds
    assert(Config.validate(Config.parse(yaml.replace("max_permille: 500",
      "max_permille: 5000"))).nonEmpty)
  }

  test("a YAML config loads and runs end-to-end against real files") {
    val in = s"${tmp()}/in"
    val out = s"${tmp()}/out"
    Writers.csv(
      (1 to 100).map(i => (i.toLong, ('A' + (i - 1) % 5).toChar.toString, 99L + i))
        .toDF("id", "category", "value"), in)
    val yaml =
      s"""name: e2e
         |source:
         |  type: csv
         |  filepath: $in
         |transformers:
         |  - type: cast
         |    columns: {value: int64}
         |  - type: filter
         |    condition: "value > 150"
         |  - type: expression
         |    expression: "v2 = value * 2"
         |  - type: aggregate
         |    group_by: [category]
         |    aggregations: {v2: [sum, mean], id: [count]}
         |  - type: sort
         |    by: [category]
         |sink:
         |  type: parquet
         |  filepath: $out
         |""".stripMargin
    val stats = Config.load(yaml).run(spark)
    assert(stats.rows === 5)
    val back = Readers.parquet(spark, out)
    assert(back.columns.toSet === Set("category", "v2_sum", "v2_mean", "id_count"))
  }

  test("orc source and sink run from YAML") {
    val in = s"${tmp()}/orc_in"
    val out = s"${tmp()}/orc_out"
    import spark.implicits._
    minietl.io.Writers.orc(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k"), in)
    val yaml =
      s"""name: orc_roundtrip
         |source: {type: orc, filepath: $in, columns: [id, k]}
         |transformers:
         |  - type: filter
         |    condition: "k = 'a'"
         |sink: {type: orc, filepath: $out}
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml)).isEmpty)
    val stats = Config.load(yaml).run(spark)
    assert(stats.rows === 2)
    assert(minietl.io.Readers.orc(spark, out).count() === 2)
  }

  test("a training-data cleaning pipeline runs from YAML") {
    val in = s"${tmp()}/docs_in"
    val out = s"${tmp()}/docs_out"
    Writers.csv(Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away today"), // exact dup
      (3L, "reach me at bob@corp.example.org for details about the offer"),
      (4L, "x")) // low quality: one char
      .toDF("doc_id", "text"), in)
    val yaml =
      s"""name: clean
         |source:
         |  type: csv
         |  filepath: $in
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: exact_dedup
         |    content: text
         |    key: doc_id
         |  - type: quality_filter
         |    column: text
         |    min_score: 50000
         |  - type: pii_redact
         |    column: text
         |  - type: expression
         |    expression: "lang = 'en'"
         |  - type: stratified_sample
         |    key: doc_id
         |    strata: lang
         |    fractions: {en: 1.0}
         |    default_fraction: 0.0
         |  - type: hash_sample
         |    key: doc_id
         |    fraction: 1.0
         |sink:
         |  type: parquet
         |  filepath: $out
         |""".stripMargin
    Config.load(yaml).run(spark)
    val back = Readers.parquet(spark, out).orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(back.map(_._1) === Seq(1L, 3L)) // dup 2 dropped, low-quality 4 dropped
    assert(back(1)._2.contains("<EMAIL>"))
    assert(!back(1)._2.contains("bob@corp.example.org"))
  }

  test("round-4 corpus stages run from YAML: gopher/temperature/budget/paragraph") {
    val in = s"${tmp()}/docs4_in"
    val out = s"${tmp()}/docs4_out"
    Writers.csv(Seq(
      (1L, "g1", "the cat and the dog ran over a hill to find food in town"),
      (2L, "g1", "the small bird under that tree sang with great joy for everyone around it"),
      (3L, "g1", "the cat and the dog ran over a hill to find food in town"),
      (4L, "g2", "no stops here just words words words words words words"))
      .toDF("doc_id", "grp", "text"), in)
    val yaml =
      s"""name: corpus4
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: gopher_filter
         |    column: text
         |    min_words: 5
         |    max_words: 100
         |  - type: temperature_sample
         |    key: doc_id
         |    strata: grp
         |    target_fraction: 1.0
         |  - type: paragraph_dedup
         |    text: text
         |    key: doc_id
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin
    Config.load(yaml).run(spark)
    val back = Readers.parquet(spark, out).orderBy("doc_id")
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toSeq
    // doc 4 fails the stopword rule; docs 1-3 pass gopher and the full-rate
    // temperature sample; doc 3 is a paragraph-level dup of doc 1
    assert(back === Seq((1L, 1L), (2L, 1L), (3L, 0L)))

    val budgetYaml =
      s"""name: corpus4b
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: expression
         |    expression: "n_tokens = 10"
         |  - type: token_budget
         |    strata: grp
         |    tokens: n_tokens
         |    budget: 20
         |    key: doc_id
         |sink: {type: parquet, filepath: ${tmp()}/docs4b_out}
         |""".stripMargin
    val p = Config.build(Config.parse(budgetYaml))
    assert(p.run(spark).rows === 3) // 2 of 3 in g1, 1 of 1 in g2
  }

  test("normalize/feature-hash/sigma-outlier stages run from YAML") {
    val in = s"${tmp()}/docs5_in"
    val out = s"${tmp()}/docs5_out"
    Writers.csv(Seq(
      (1L, "THE Cat  AND the dog", 1.0),
      (2L, "the cat and the dog", 1.01),
      (3L, "words here", 0.99),
      (4L, "more words", 100.0)) // 3-sigma value outlier in one group
      .toDF("doc_id", "text", "score")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g")), in)
    // pad the group so the lone extreme value can exceed 3 sigma
    val pad = (10L to 29L).map(i => (i, "filler text", 1.0, "g"))
    Writers.csv(pad.toDF("doc_id", "text", "score", "grp"), in, mode = "append")
    val yaml =
      s"""name: corpus5
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64, score: double}
         |  - type: sigma_outlier_filter
         |    group_by: [grp]
         |    value: score
         |    k: 3
         |  - type: normalize_text
         |    column: text
         |  - type: feature_hash
         |    column: text
         |    out_column: tf
         |    dim: 16
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin
    Config.load(yaml).run(spark)
    val back = Readers.parquet(spark, out)
    assert(back.count() === 23) // 24 rows minus the sigma outlier
    assert(back.where($"doc_id" === 4L).count() === 0)
    val r1 = back.where($"doc_id" === 1L).select("text", "tf").collect()(0)
    assert(r1.getString(0) === "the cat and the dog")
    assert(r1.getSeq[Long](1).length === 16)
    // docs 1 and 2 vectorize identically after normalization
    val r2 = back.where($"doc_id" === 2L).select("tf").collect()(0)
    assert(r1.getSeq[Long](1) === r2.getSeq[Long](0))
  }

  test("squeeze_repeats and dedup_lines stages clean text from YAML") {
    val in = s"${tmp()}/rep_in"
    val out = s"${tmp()}/rep_out"
    Seq((1L, "batch batch batch stream stream dup"), (2L, "a b a b"))
      .toDF("doc_id", "text").write.parquet(in)
    Config.load(
      s"""name: rep
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: squeeze_repeats, column: text}
         |  - {type: dedup_lines, column: text, delim: " "}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val back = Readers.parquet(spark, out).orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    // doc 1: squeeze → "batch stream dup", word-dedup idempotent;
    // doc 2: squeeze no-op (alternating), word-dedup → "a b"
    assert(back === Seq("batch stream dup", "a b"))
  }

  test("minhash_dedup and span_dedup stages run from YAML") {
    val in = s"${tmp()}/nd_in"
    val out = s"${tmp()}/nd_out"
    val span = (0 until 12).map("s" + _).mkString(" ")
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    Writers.csv(Seq(
      (1L, s"$base one"),
      (2L, s"$base two"), // near-dup of 1 (J = 12/14) → dropped
      (3L, s"intro $span tail"),
      (4L, s"$span closing words here")) // J vs 3 = 10/15 < 0.7; shares the span
      .toDF("doc_id", "text"), in)
    Config.load(
      s"""name: nd
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: minhash_dedup
         |    text: text
         |    key: doc_id
         |    threshold: 0.7
         |  - type: span_dedup
         |    text: text
         |    key: doc_id
         |    k: 4
         |    min_span_tokens: 8
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val back = Readers.parquet(spark, out).orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // doc 2 near-dup-dropped; doc 4 loses the span to doc 3 (keep-first);
    // untouched docs round-trip byte-identically through span_dedup
    assert(back.map(_._1) === Seq(1L, 3L, 4L))
    assert(back(0)._2 === s"$base one")
    assert(back(1)._2 === s"intro $span tail")
    assert(back(2)._2 === "closing words here")

    // transitive: true walks clusters instead of the greedy pair drop
    val outT = s"${tmp()}/nd_out_t"
    Config.load(
      s"""name: ndt
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: minhash_dedup
         |    text: text
         |    key: doc_id
         |    threshold: 0.7
         |    transitive: true
         |sink: {type: parquet, filepath: $outT}
         |""".stripMargin).run(spark)
    assert(Readers.parquet(spark, outT).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq === Seq(1L, 3L, 4L))

    // cross-field value checks surface pre-run, not as a mid-build require()
    def cfg(stage: String) = Config.parse(
      s"""name: x
         |source: {type: parquet, filepath: /tmp/x}
         |transformers:
         |$stage
         |sink: {type: parquet, filepath: /tmp/y}
         |""".stripMargin)
    assert(Config.validate(cfg(
      "  - {type: minhash_dedup, text: text, key: doc_id, k: 128, bands: 24}"))
      .exists(_.contains("must divide")))
    assert(Config.validate(cfg(
      "  - {type: span_dedup, text: text, key: doc_id, k: 6, min_span_tokens: 4}"))
      .exists(_.contains("must be >= 'k'")))
    assert(Config.validate(cfg(
      "  - {type: span_dedup, text: text, key: doc_id}")) === Nil)
    // single-key overrides are validated against the OTHER key's stage
    // default (k=128/bands=32 for minhash, k=4/min_span_tokens=8 for spans)
    assert(Config.validate(cfg(
      "  - {type: minhash_dedup, text: text, key: doc_id, bands: 24}"))
      .exists(_.contains("must divide")))
    assert(Config.validate(cfg(
      "  - {type: minhash_dedup, text: text, key: doc_id, k: 96}")) === Nil)
    assert(Config.validate(cfg(
      "  - {type: span_dedup, text: text, key: doc_id, k: 16}"))
      .exists(_.contains("must be >= 'k'")))
    assert(Config.validate(cfg(
      "  - {type: span_dedup, text: text, key: doc_id, min_span_tokens: 2}"))
      .exists(_.contains("must be >= 'k'")))
  }

  test("span_dedup fixpoint knob excises cascading splices from YAML") {
    val in = s"${tmp()}/fx_in"
    val out = s"${tmp()}/fx_out"
    // doc2 carries the junction doc1 only exposes AFTER its span to doc0 is
    // excised (k=4, min_span_tokens=8): single pass misses it, fixpoint
    // excises it in round 2
    val s = (1 to 8).map("s" + _).mkString(" ")
    val p = (1 to 4).map("p" + _).mkString(" ")
    val q = (1 to 4).map("q" + _).mkString(" ")
    Writers.csv(Seq(
      (0L, s), (1L, s"$p $s $q"), (2L, s"x1 $p $q x2"))
      .toDF("doc_id", "text"), in)
    Config.load(
      s"""name: fx
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64}
         |  - type: span_dedup
         |    text: text
         |    key: doc_id
         |    fixpoint: true
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val back = Readers.parquet(spark, out).orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    assert(back === Seq(s, s"$p $q", "x1 x2"))
    // max_iter validates as a numeric bound
    def cfg(stage: String) = Config.parse(
      s"""name: x
         |source: {type: parquet, filepath: /tmp/x}
         |transformers:
         |$stage
         |sink: {type: parquet, filepath: /tmp/y}
         |""".stripMargin)
    assert(Config.validate(cfg(
      "  - {type: span_dedup, text: text, key: doc_id, fixpoint: true, max_iter: 0}"))
      .nonEmpty)
  }

  test("winsorize stage clips from YAML and validates its bounds") {
    val in = s"${tmp()}/w_in"
    val out = s"${tmp()}/w_out"
    Writers.csv(((1 to 99).map(i => (i.toLong, "g", i.toDouble)) :+
      (100L, "g", 9999.0)).toDF("id", "grp", "v"), in)
    Config.load(
      s"""name: w
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {id: int64, v: double}
         |  - {type: winsorize, group_by: [grp], value: v, lo: 0.0, hi: 0.9}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val clipped = Readers.parquet(spark, out).where($"id" === 100L)
      .select("v_w").collect()(0).getDouble(0)
    assert(clipped < 9999.0)
    val errs = Config.validate(Config.parse(
      """name: x
        |source: {type: parquet, filepath: /tmp/x}
        |transformers:
        |  - {type: winsorize, group_by: [g], value: v, hi: 1.5}
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin))
    assert(errs.exists(_.contains("out of [0.0, 1.0]")))
  }

  test("mad_outlier_filter and top_p_select run from YAML") {
    val in = s"${tmp()}/mt_in"
    val out = s"${tmp()}/mt_out"
    // one extreme among 7 clustered values: sigma would mask it (z limit
    // √(49/6) < 3), the MAD stage must drop it; then top-p keeps the
    // best-mass prefix carrying 80% of what survives
    Writers.csv(((1L to 6L).map(i => (i, "g", 10.0 + (i % 3))) :+
      (99L, "g", 10000.0)).toDF("id", "grp", "v"), in)
    Config.load(
      s"""name: mt
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {id: int64, v: double}
         |  - {type: mad_outlier_filter, group_by: [grp], value: v, k: 3}
         |  - {type: top_p_select, strata: grp, mass: id, p_basis_points: 5000,
         |     tie_break: id}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val kept = Readers.parquet(spark, out).select("id")
      .as[Long].collect().toSet
    // MAD drops 99; ids 1..6 have mass 21, p=0.5 → target 10.5: 6 (before
    // 0), 5 (before 6) kept; 4 would start at 11 ≥ 10.5 → stop
    assert(kept === Set(6L, 5L))
    val errs = Config.validate(Config.parse(
      """name: x
        |source: {type: parquet, filepath: /tmp/x}
        |transformers:
        |  - {type: top_p_select, strata: g, mass: m, p_basis_points: 20000,
        |     tie_break: id}
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin))
    assert(errs.exists(_.contains("out of [0.0, 10000.0]")))
  }

  test("token_budget and top_p_select shards knob engages the salted path") {
    val in = s"${tmp()}/sh_in"
    val out = s"${tmp()}/sh_out"
    // one hot stratum of 40 docs, 10 tokens each; budget 100 over 4 shards
    // -> per-shard budget exactly 25 (2 docs of 10 fit; the 3rd would hit
    // 30 > 25), so kept tokens <= 100 with ~2 docs kept per shard
    Writers.csv((1L to 40L).map(i => (i, "hot", 10L)).toDF("doc_id", "grp", "n_tokens"), in)
    Config.load(
      s"""name: sh
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64, n_tokens: int64}
         |  - type: token_budget
         |    strata: grp
         |    tokens: n_tokens
         |    budget: 100
         |    key: doc_id
         |    shards: 4
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    val keptTokens = Readers.parquet(spark, out)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).as[Long].head()
    assert(keptTokens <= 100L && keptTokens >= 60L,
      s"salted budget must never overshoot and roughly fill: $keptTokens")

    val outP = s"${tmp()}/shp_out"
    Config.load(
      s"""name: shp
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64, n_tokens: int64}
         |  - {type: top_p_select, strata: grp, mass: n_tokens,
         |     p_basis_points: 5000, tie_break: doc_id, shards: 4}
         |sink: {type: parquet, filepath: $outP}
         |""".stripMargin).run(spark)
    // uniform mass: each shard keeps the smallest prefix crossing half its
    // own mass, so the union holds 50%..(50% + one doc per shard) of rows
    val keptRows = Readers.parquet(spark, outP).count()
    assert(keptRows >= 20L && keptRows <= 24L, s"per-shard nucleus size: $keptRows")

    assert(Config.validate(Config.parse(
      s"""name: x
         |source: {type: parquet, filepath: /tmp/x}
         |transformers:
         |  - {type: token_budget, strata: g, tokens: t, budget: 10, key: k, shards: 0}
         |sink: {type: parquet, filepath: /tmp/y}
         |""".stripMargin)).nonEmpty)

    // shards: auto validates clean and engages the salted path with the
    // census-derived count (hot stratum 400 tokens < 64M target -> 1 shard,
    // which reproduces the plain budget exactly)
    assert(Config.validate(Config.parse(
      s"""name: x
         |source: {type: parquet, filepath: /tmp/x}
         |transformers:
         |  - {type: token_budget, strata: g, tokens: t, budget: 10, key: k, shards: auto}
         |sink: {type: parquet, filepath: /tmp/y}
         |""".stripMargin)).isEmpty)
    val outA = s"${tmp()}/sha_out"
    Config.load(
      s"""name: sha
         |source: {type: csv, filepath: $in}
         |transformers:
         |  - type: cast
         |    columns: {doc_id: int64, n_tokens: int64}
         |  - {type: token_budget, strata: grp, tokens: n_tokens,
         |     budget: 100, key: doc_id, shards: auto}
         |sink: {type: parquet, filepath: $outA}
         |""".stripMargin).run(spark)
    val keptAuto = Readers.parquet(spark, outA)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).as[Long].head()
    assert(keptAuto === 100L, s"auto=1 shard must fill the budget exactly: $keptAuto")
  }

  test("missing required keys in new stage types are validation errors") {
    val c = Config.parse(
      """name: x
        |source: {type: parquet, filepath: /tmp/x}
        |transformers:
        |  - type: stratified_sample
        |    key: doc_id
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin)
    val errs = Config.validate(c)
    assert(errs.exists(_.contains("strata")))
    assert(errs.exists(_.contains("fractions")))
  }

  test("bad option values surface in the pre-run error list, not mid-build") {
    def cfg(stage: String) = Config.parse(
      s"""name: x
         |source: {type: parquet, filepath: /tmp/x}
         |transformers:
         |$stage
         |sink: {type: parquet, filepath: /tmp/y}
         |""".stripMargin)
    assert(Config.validate(cfg(
      "  - {type: hash_sample, key: id, fraction: 1.5}"))
      .exists(_.contains("out of [0.0, 1.0]")))
    // NaN fails every <|> comparison — the range check must catch it anyway
    assert(Config.validate(cfg(
      "  - {type: hash_sample, key: id, fraction: .nan}"))
      .exists(_.contains("out of [0.0, 1.0]")))
    assert(Config.validate(cfg(
      """  - type: stratified_sample
        |    key: id
        |    strata: lang
        |    fractions: {en: .nan}""".stripMargin))
      .exists(_.contains("fraction for 'en' out of [0, 1]")))
    assert(Config.validate(cfg(
      "  - {type: quality_filter, column: text, min_score: lots}"))
      .exists(_.contains("must be numeric")))
    assert(Config.validate(cfg(
      "  - {type: stratified_sample, key: id, strata: lang, fractions: 0.75}"))
      .exists(_.contains("must be a mapping")))
    assert(Config.validate(cfg(
      """  - type: stratified_sample
        |    key: id
        |    strata: lang
        |    fractions: {en: 2.0}""".stripMargin))
      .exists(_.contains("fraction for 'en' out of [0, 1]")))
    // float-form min_score is legal and builds
    assert(Config.validate(cfg(
      "  - {type: quality_filter, column: text, min_score: 50000.0}")) === Nil)
    Config.build(cfg("  - {type: quality_filter, column: text, min_score: 50000.0}"))
  }

  test("api source builds from config and pulls paginated records e2e") {
    // local JDK HttpServer — the same fixture pattern as ApiSourceSpec
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rows", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val page = q.split("&").collectFirst {
        case kv if kv.startsWith("page=") => kv.drop(5).toInt }.getOrElse(1)
      val start = (page - 1) * 4
      val items = (start until math.min(start + 4, 10))
        .map(i => s"""{"id":$i,"v":${i * 2}}""")
      val body = s"""{"data":{"items":[${items.mkString(",")}]}}"""
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val dir = tmp()
      val yaml =
        s"""name: api_pipe
           |source:
           |  type: api
           |  url: http://127.0.0.1:${server.getAddress.getPort}/rows
           |  data_path: data.items
           |  pagination: {type: page, limit: 4}
           |transformers:
           |  - {type: filter, condition: "v >= 4"}
           |sink: {type: parquet, filepath: $dir/out}
           |""".stripMargin
      assert(Config.validate(Config.parse(yaml)) === Nil)
      Config.load(yaml).run(spark)
      val out = Readers.parquet(spark, s"$dir/out")
      assert(out.count() === 8) // ids 2..9 of the 10 paginated records
      assert(out.columns.sorted.toSeq === Seq("id", "v"))
    } finally server.stop(0)

    // value-level validation still fires pre-run
    assert(Config.validate(Config.parse(
      """name: x
        |source: {type: api}
        |transformers: []
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin)).exists(_.contains("source api needs url")))
    assert(Config.validate(Config.parse(
      """name: x
        |source: {type: api, url: "http://h/x", auth: {type: digest}}
        |transformers: []
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin)).exists(_.contains("auth type must be basic or bearer")))
    assert(Config.validate(Config.parse(
      """name: x
        |source: {type: api, url: "http://h/x", pagination: {type: cursor}}
        |transformers: []
        |sink: {type: parquet, filepath: /tmp/y}
        |""".stripMargin)).exists(_.contains("pagination type must be page or offset")))
  }

  test("a dag: YAML assembles and runs a multi-source join + branch to two sinks") {
    val dir = tmp()
    Writers.parquet(Seq((1, 100.0), (2, 2000.0), (3, 1500.0)).toDF("k", "total"), s"$dir/orders")
    Writers.parquet(Seq((1, "alice", 5.0), (2, "bob", -3.0), (3, "carol", 9.0))
      .toDF("k", "name", "bal"), s"$dir/cust")
    val yaml =
      s"""name: multi
         |dag:
         |  sources:
         |    orders: {type: parquet, path: $dir/orders}
         |    cust:   {type: parquet, path: $dir/cust}
         |  nodes:
         |    - id: big
         |      input: orders
         |      transform: {type: filter, condition: "total > 1000"}
         |    - id: joined
         |      inputs: [big, cust]
         |      merge: {strategy: join, keys: [k], how: inner}
         |    - id: split
         |      input: joined
         |      branch: {condition: "bal > 0"}
         |  sinks:
         |    pos: {input: split.true,  type: parquet, path: $dir/pos}
         |    neg: {input: split.false, type: parquet, path: $dir/neg}
         |""".stripMargin
    assert(Config.isDagConfig(yaml) && !Config.isDagConfig(Config.sample))
    val dag = Config.loadDag(yaml)
    val counts = dag.run(spark)
    assert(counts === Map("pos" -> 1L, "neg" -> 1L))
    val pos = Readers.parquet(spark, s"$dir/pos", Nil).collect()
    assert(pos.map(_.getAs[String]("name")).toSeq === Seq("carol"))
    val neg = Readers.parquet(spark, s"$dir/neg", Nil).collect()
    assert(neg.map(_.getAs[String]("name")).toSeq === Seq("bob"))
  }

  test("dag: validation catches component and structural errors before running") {
    val errs = Config.validateDag(Config.parseDag(
      """name: bad
        |dag:
        |  sources:
        |    a: {type: teleport, path: x}
        |  nodes:
        |    - id: m
        |      input: a
        |      merge: {strategy: join}
        |    - id: t
        |      inputs: [a, m]
        |      transform: {type: filter}
        |  sinks:
        |    out: {input: t, type: csv}
        |""".stripMargin))
    assert(errs.exists(_.contains("unknown source type 'teleport'")))
    assert(errs.exists(_.contains("merge needs at least 2 inputs")))
    assert(errs.exists(_.contains("merge join needs 'keys'")))
    assert(errs.exists(_.contains("needs exactly one input")))
    assert(errs.exists(_.contains("missing 'condition'")))
    assert(errs.exists(_.contains("sink out csv needs filepath")))
    // structural errors (cycle) surface from the assembled DAG
    val cyclic = intercept[IllegalArgumentException] {
      Config.loadDag(
        """name: cyc
          |dag:
          |  sources:
          |    a: {type: parquet, path: /tmp/x}
          |  nodes:
          |    - id: t1
          |      input: t2
          |      transform: {type: drop, columns: [z]}
          |    - id: t2
          |      input: t1
          |      transform: {type: drop, columns: [z]}
          |  sinks:
          |    out: {input: t2, type: parquet, path: /tmp/y}
          |""".stripMargin)
    }
    assert(cyclic.getMessage.contains("cycle") ||
      cyclic.getMessage.contains("needs exactly one input"))
  }

  test("dag: dotted node ids and non-branch ports are rejected") {
    // '.' is the input-ref port separator, so a dotted id would be
    // silently misparsed into (from, port) — validation rejects it
    val errs = Config.validateDag(Config.parseDag(
      """name: dotted
        |dag:
        |  sources:
        |    "a.b": {type: parquet, path: /tmp/x}
        |  sinks:
        |    out: {input: a.b, type: parquet, path: /tmp/y}
        |""".stripMargin))
    assert(errs.exists(_.contains("may not contain '.'")))
    // an input ref's port must be a branch port: true or false
    val badPort = intercept[IllegalArgumentException] {
      Config.loadDag(
        """name: badport
          |dag:
          |  sources:
          |    a: {type: parquet, path: /tmp/x}
          |  nodes:
          |    - id: split
          |      input: a
          |      branch: {condition: "x > 0"}
          |  sinks:
          |    out: {input: split.maybe, type: parquet, path: /tmp/y}
          |""".stripMargin)
    }
    assert(badPort.getMessage.contains("port must be 'true' or 'false'"))
  }

  test("env substitution reaches file paths inside configs") {
    val dir = tmp()
    Writers.csv(Seq((1, "x")).toDF("id", "name"), s"$dir/in")
    val yaml =
      """source: {type: csv, filepath: "${CFG_TEST_DIR}/in"}
        |sink: {type: csv, filepath: "${CFG_TEST_DIR}/out"}
        |""".stripMargin
    val stats = Config.build(Config.parse(yaml, Map("CFG_TEST_DIR" -> dir))).run(spark)
    assert(stats.rows === 1)
  }

  test("round-14 stages run from YAML: naive_bayes_filter / dsir_select") {
    val in = s"${tmp()}/nb_in"
    val out = s"${tmp()}/nb_out"
    // doc 9 carries an en-vocabulary text but an fr label — the NB filter
    // must drop exactly that row (the mislabel is a MINORITY of fr's token
    // mass, so the poisoned class still loses the argmax for it)
    Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog ate the bone and the cat ran", "en"),
      (3L, "the cat and the dog sat on the bone", "en"),
      (4L, "the mat and the bone and the cat", "en"),
      (5L, "le chat dort sur le tapis", "fr"),
      (6L, "le chien mange un os et le chat", "fr"),
      (7L, "le tapis et le chat et le chien", "fr"),
      (8L, "le chien dort sur le tapis et le chat mange", "fr"),
      (9L, "the cat sat on the mat and the dog", "fr")
    ).toDF("doc_id", "text", "lang").write.parquet(in)
    Config.load(
      s"""name: nbf
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: naive_bayes_filter, label: lang, text: text, key: doc_id, dim: 512}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    assert(Readers.parquet(spark, out).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))

    // null-text rows PASS THROUGH the filter (ADVICE r14: a routing filter
    // must never silently drop rows it cannot score), and an all-null-text
    // label neither crashes training nor is dropped wholesale
    val inNull = s"${tmp()}/nb_null_in"
    val outNull = s"${tmp()}/nb_null_out"
    Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog ate the bone", "en"),
      (3L, "le chat dort sur le tapis", "fr"),
      (4L, null.asInstanceOf[String], "en"),
      (5L, null.asInstanceOf[String], "xx")
    ).toDF("doc_id", "text", "lang").write.parquet(inNull)
    Config.load(
      s"""name: nbf_null
         |source: {type: parquet, filepath: $inNull}
         |transformers:
         |  - {type: naive_bayes_filter, label: lang, text: text, key: doc_id, dim: 512}
         |sink: {type: parquet, filepath: $outNull}
         |""".stripMargin).run(spark)
    assert(Readers.parquet(spark, outNull).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L, 5L))

    val out2 = s"${tmp()}/dsir_out"
    Config.load(
      s"""name: dsir
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - type: dsir_select
         |    target_condition: "lang = 'en'"
         |    text: text
         |    key: doc_id
         |    k: 2
         |sink: {type: parquet, filepath: $out2}
         |""".stripMargin).run(spark)
    val picked = Readers.parquet(spark, out2).select("doc_id").as[Long].collect().toSet
    assert(picked.size === 2)
    assert(picked.forall(Set(1L, 2L, 3L, 4L, 9L)), // en-vocabulary docs outscore fr
      s"top-2 must be en-vocabulary docs, got $picked")
  }

  test("dsir_select: default dim 1024, advisory warning below 512 " +
    "(VERDICT r15 Next #5)") {
    assert(Config.DsirDefaultDim === 1024)
    def cfg(dimLine: String) = Config.parse(
      s"""name: d
         |source: {type: parquet, filepath: /tmp/in}
         |transformers:
         |  - type: dsir_select
         |    target_condition: "lang = 'en'"
         |    text: text
         |    key: doc_id
         |    k: 2
         |$dimLine
         |sink: {type: parquet, filepath: /tmp/out}
         |""".stripMargin.replace("\n\n", "\n"))
    // narrow dim: valid (no error) but warned, citing the measured overlap
    val narrow = cfg("    dim: 64")
    assert(Config.validate(narrow).isEmpty)
    val w = Config.warnings(narrow)
    assert(w.size === 1 && w.head.contains("dim=64") &&
      w.head.contains("20-36%"), w.mkString("; "))
    // omitted (-> default 1024) and explicit wide dims stay silent
    assert(Config.warnings(cfg("")).isEmpty)
    assert(Config.warnings(cfg("    dim: 512")).isEmpty)
    // and the CLI validate surface prints it without failing
    val p = s"${tmp()}/dsir_warn.yaml"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      s"""name: d
         |source: {type: parquet, filepath: /tmp/in}
         |transformers:
         |  - type: dsir_select
         |    target_condition: "lang = 'en'"
         |    text: text
         |    key: doc_id
         |    k: 2
         |    dim: 64
         |sink: {type: parquet, filepath: /tmp/out}
         |""".stripMargin.getBytes("UTF-8"))
    val (code, out) = minietl.cli.Main.execute(Seq("validate", p),
      () => spark)
    assert(code === 0 && out.startsWith("valid") && out.contains("WARNING:"),
      out)
  }

  test("warnings tolerates an unparseable dsir dim — validate owns that " +
    "error (ADVICE r16)") {
    val c = Config.parse(
      """name: d
        |source: {type: parquet, filepath: /tmp/in}
        |transformers:
        |  - type: dsir_select
        |    target_condition: "lang = 'en'"
        |    text: text
        |    key: doc_id
        |    k: 2
        |    dim: abc
        |sink: {type: parquet, filepath: /tmp/out}
        |""".stripMargin)
    // the advisory channel must not throw past validate's report
    assert(Config.warnings(c).isEmpty)
    assert(Config.validate(c).exists(_.contains("'dim' must be numeric")),
      Config.validate(c).mkString("; "))
  }

  test("exact-percentile stages earn a sketch-twin advisory; sketch-backed " +
    "aggregations stay silent (VERDICT r16 Next #3)") {
    def cfg(stage: String) = Config.parse(
      s"""name: p
         |source: {type: parquet, filepath: /tmp/in}
         |transformers:
         |$stage
         |sink: {type: parquet, filepath: /tmp/out}
         |""".stripMargin)
    def oneWarning(stage: String, must: String*): Unit = {
      val c = cfg(stage)
      assert(Config.validate(c).isEmpty, Config.validate(c).mkString("; "))
      val w = Config.warnings(c)
      assert(w.size === 1, s"$stage → ${w.mkString("; ")}")
      (Seq("EXACT", "approx_percentile", "q_quantile_sketch") ++ must)
        .foreach(s => assert(w.head.contains(s), s"missing '$s' in: ${w.head}"))
    }
    oneWarning("  - {type: winsorize, group_by: [g], value: v}", "winsorize")
    oneWarning("  - {type: mad_outlier_filter, group_by: [g], value: v}",
      "mad_outlier_filter")
    oneWarning("  - {type: impute, group_by: [g], value: v, strategy: median}",
      "median")
    oneWarning("  - {type: aggregate, group_by: [g], aggregations: {v: [median]}}",
      "median")
    // behavior unchanged: warned configs still validate clean (above) and
    // the sketch/mode shapes stay silent — they ARE the recommendation
    assert(Config.warnings(cfg(
      "  - {type: aggregate, group_by: [g], aggregations: {v: [sum, approx_nunique]}}"))
      .isEmpty)
    assert(Config.warnings(cfg(
      "  - {type: impute, group_by: [g], value: v, strategy: mode}")).isEmpty)
    // a malformed aggregations mapping is validate's problem, not a throw
    assert(Config.warnings(cfg(
      "  - {type: aggregate, group_by: [g], aggregations: nope}")).isEmpty)
  }

  test("quantile_sketch stage: the advisory's in-config twin runs from " +
    "YAML and matches the direct sketch call") {
    val in = s"${tmp()}/qs_in"
    val out = s"${tmp()}/qs_out"
    Seq(("a", 1.5), ("a", 2.5), ("a", 100.0), ("b", 0.25), ("b", 7.75))
      .toDF("g", "v").write.parquet(in)
    val yaml =
      s"""name: qs
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - type: quantile_sketch
         |    group_by: [g]
         |    value: v
         |    quantiles: [0.5, "19/20"]
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin
    val cfg = Config.parse(yaml)
    assert(Config.validate(cfg).isEmpty, Config.validate(cfg).mkString("; "))
    // the sketch stage is the RECOMMENDED shape: no percentile advisory
    assert(Config.warnings(cfg).isEmpty)
    Config.load(yaml).run(spark)
    val got = Readers.parquet(spark, out)
      .orderBy("g", "q_num").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("q_num"),
        r.getAs[Int]("q_den"), r.getAs[Double]("est"))).toSeq
    val direct = minietl.sketch.Sketches.logHistQuantiles(
      Readers.parquet(spark, in), Seq("g"), "v", Seq((5, 10), (19, 20)))
      .orderBy("g", "q_num").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("q_num"),
        r.getAs[Int]("q_den"), r.getAs[Double]("est"))).toSeq
    assert(got === direct && got.size === 4)
    // validation surface: unparseable / out-of-range quantiles, missing keys
    def errs(q: String) = Config.validate(Config.parse(
      yaml.replace("quantiles: [0.5, \"19/20\"]", s"quantiles: $q")))
    assert(errs("[abc]").exists(_.contains("unparseable quantile")))
    assert(errs("[1.5]").exists(_.contains("out of [0, 1]")))
    assert(errs("[]").exists(_.contains("non-empty list")))
    // a scalar quantile is the one-element list, in validate AND build
    assert(errs("0.5").isEmpty)
    // "0/0" must error at validate, not at the runtime require mid-pipeline
    assert(errs("[\"0/0\"]").exists(_.contains("out of [0, 1]")))
    // a YAML null is an error to REPORT, never an NPE out of validate
    assert(errs("[0.5, ~]").exists(_.contains("unparseable quantile")))
    assert(errs("~").exists(_.contains("unparseable quantile")))
    assert(Config.validate(Config.parse(
      yaml.replace("    value: v\n", "")))
      .exists(_.contains("missing 'value'")))
  }

  test("semdedup recluster_rounds is validated at validate time (ADVICE r16)") {
    def cfg(extra: String) = Config.parse(
      s"""name: sd
         |source: {type: parquet, filepath: /tmp/in}
         |transformers:
         |  - {type: semdedup, vec: embedding, key: vec_id$extra}
         |sink: {type: parquet, filepath: /tmp/out}
         |""".stripMargin)
    assert(Config.validate(cfg(", recluster_rounds: -1"))
      .exists(_.contains("recluster_rounds")))
    assert(Config.validate(cfg(", recluster_rounds: abc"))
      .exists(_.contains("recluster_rounds")))
    assert(Config.validate(cfg(", recluster_rounds: 0")).isEmpty)
    assert(Config.validate(cfg(", recluster_rounds: 2")).isEmpty)
    assert(Config.validate(cfg("")).isEmpty)
  }

  test("round-14 stages run from YAML: semdedup / image_dhash_dedup") {
    val in = s"${tmp()}/sd_in"
    val out = s"${tmp()}/sd_out"
    Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.04f)), // near-dup of 1
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding").write.parquet(in)
    Config.load(
      s"""name: sd
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: semdedup, vec: embedding, key: vec_id, nlist: 2, tau: 0.99}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin).run(spark)
    assert(Readers.parquet(spark, out).orderBy("vec_id")
      .select("vec_id").as[Long].collect().toSeq === Seq(1L, 3L, 4L))

    val in2 = s"${tmp()}/img_in"
    val out2 = s"${tmp()}/img_out"
    val pngA = minietl.multimodal.PerceptualHash.gradientPng(9, 9, 2, 3, 5)
    val pngB = minietl.multimodal.PerceptualHash.gradientPng(9, 9, 200, 1, 7)
    Seq(
      (1L, pngA), (2L, pngA),                       // exact dup → keep 1
      (3L, pngB),
      (4L, Array[Byte](9, 9, 9))                    // undecodable → passes
    ).toDF("media_id", "content").write.parquet(in2)
    Config.load(
      s"""name: imgdd
         |source: {type: parquet, filepath: $in2}
         |transformers:
         |  - {type: image_dhash_dedup, content: content, key: media_id}
         |sink: {type: parquet, filepath: $out2}
         |""".stripMargin).run(spark)
    assert(Readers.parquet(spark, out2).orderBy("media_id")
      .select("media_id").as[Long].collect().toSeq === Seq(1L, 3L, 4L))
  }

  test("image_neardup_dedup runs from YAML: transitive chain folds, " +
    "undecodable passes, max_dist dial honored") {
    def bitImg(bits: Set[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach { j =>
        var v = 100
        img.setRGB(0, j, v * 0x010101)
        (0 until 7).foreach { i =>
          if (bits(j * 7 + i)) v += 10
          img.setRGB(i + 1, j, v * 0x010101)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val in = s"${tmp()}/ind_in"
    Seq(
      (1L, bitImg(Set())), (2L, bitImg(Set())),
      (3L, bitImg(Set(0))), (4L, bitImg(Set(0, 1))),
      (5L, bitImg(Set(0, 1, 2, 3))),
      (6L, Array[Byte](7, 7))
    ).toDF("media_id", "content").write.parquet(in)
    def run(maxDist: Int): Seq[Long] = {
      val out = s"${tmp()}/ind_out_$maxDist"
      Config.load(
        s"""name: ind
           |source: {type: parquet, filepath: $in}
           |transformers:
           |  - type: image_neardup_dedup
           |    content: content
           |    key: media_id
           |    max_dist: $maxDist
           |sink: {type: parquet, filepath: $out}
           |""".stripMargin).run(spark)
      Readers.parquet(spark, out).orderBy("media_id")
        .select("media_id").as[Long].collect().toSeq
    }
    assert(run(3) === Seq(1L, 6L))        // 5 folds only via the 1-3-4-5 chain
    assert(run(1) === Seq(1L, 5L, 6L))    // tighter dial breaks the 4-5 link
    assert(Config.validate(Config.parse(
      s"""name: bad
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: image_neardup_dedup, content: content, key: media_id, max_dist: 9}
         |sink: {type: parquet, filepath: /tmp/x}
         |""".stripMargin, Map.empty)).exists(_.contains("max_dist")))
  }

  test("audio_hash_dedup runs from YAML: exact and near dials, " +
    "undecodable passes") {
    def bitWav(bits: Set[Int]): Array[Byte] = {
      val samples = new Array[Short](minietl.multimodal.PerceptualAudio.Windows * 4)
      var amp = 100
      (0 until minietl.multimodal.PerceptualAudio.Windows).foreach { w =>
        if (w > 0 && bits(w - 1)) amp += 10
        (0 until 4).foreach(k => samples(w * 4 + k) = amp.toShort)
      }
      minietl.multimodal.Multimodal.pcm16Wav(samples, 8000)
    }
    val in = s"${tmp()}/ah_in"
    Seq(
      (1L, bitWav(Set())), (2L, bitWav(Set())),   // exact dup pair
      (3L, bitWav(Set(0))),                        // dist 1 from 1
      (4L, Array[Byte](9))                         // undecodable
    ).toDF("media_id", "content").write.parquet(in)
    def run(maxDist: Int): Seq[Long] = {
      val out = s"${tmp()}/ah_out_$maxDist"
      Config.load(
        s"""name: ahd
           |source: {type: parquet, filepath: $in}
           |transformers:
           |  - type: audio_hash_dedup
           |    content: content
           |    key: media_id
           |    max_dist: $maxDist
           |sink: {type: parquet, filepath: $out}
           |""".stripMargin).run(spark)
      Readers.parquet(spark, out).orderBy("media_id")
        .select("media_id").as[Long].collect().toSeq
    }
    assert(run(0) === Seq(1L, 3L, 4L))   // exact: only the identical pair folds
    assert(run(1) === Seq(1L, 4L))       // near: 3 folds into 1 at distance 1
    assert(Config.validate(Config.parse(
      s"""name: bad
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: audio_hash_dedup, content: content, key: media_id, max_dist: 7}
         |sink: {type: parquet, filepath: /tmp/x}
         |""".stripMargin, Map.empty)).exists(_.contains("max_dist")))
  }

  test("random_projection composes with semdedup (nlist auto) from YAML") {
    val in = s"${tmp()}/rp_in"
    val out = s"${tmp()}/rp_out"
    // rows 1/2 identical in R^8 (identical projections — JL is a linear
    // map, so exact dups survive any seed); 3 and 4 point elsewhere
    val a = Seq(1.0f, 0.2f, 0.1f, 0.0f, 0.3f, 0.0f, 0.1f, 0.2f)
    val b = Seq(0.0f, 1.0f, 0.0f, 0.9f, 0.0f, 0.8f, 0.0f, 0.1f)
    val c = Seq(0.1f, 0.0f, 1.0f, 0.0f, 0.7f, 0.0f, 0.9f, 0.0f)
    Seq((1L, a), (2L, a), (3L, b), (4L, c))
      .toDF("vec_id", "embedding").write.parquet(in)
    val yaml =
      s"""name: rp_sd
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - type: random_projection
         |    vec: embedding
         |    out_column: y
         |    dim_in: 8
         |    dim_out: 4
         |    seed: 7
         |  - {type: semdedup, vec: y, key: vec_id, nlist: auto, tau: 0.999}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin
    assert(Config.validate(Config.parse(yaml, Map.empty)) === Nil)
    Config.load(yaml).run(spark)
    assert(Readers.parquet(spark, out).orderBy("vec_id")
      .select("vec_id").as[Long].collect().toSeq === Seq(1L, 3L, 4L))

    // validator: nlist must be numeric or the literal "auto"; the
    // projection stage requires its dims
    assert(Config.validate(Config.parse(yaml.replace("nlist: auto",
      "nlist: autox"), Map.empty)).exists(_.contains("nlist")))
    assert(Config.validate(Config.parse(
      s"""name: rp_bad
         |source: {type: parquet, filepath: $in}
         |transformers:
         |  - {type: random_projection, vec: embedding, out_column: y, dim_in: 8}
         |sink: {type: parquet, filepath: $out}
         |""".stripMargin, Map.empty)).exists(_.contains("dim_out")))
  }
}
