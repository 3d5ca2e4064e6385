package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Untimed warm-up passes at sf0.001 AND sf0.01 first
  * warm the JVM so the timed numbers measure the queries, not startup.
  * Two scales because they warm different things: sf0.001 compiles the
  * plans (Catalyst + codegen classes); sf0.01 supplies enough loop
  * iterations to push the string-heavy hot loops (explode+agg, LSH plane
  * dots) through C2 — measured: q_tfidf at sf0.1 is 11.4 s after an
  * sf0.001-only warm-up but 2.3 s after sf0.001+sf0.01.
  *
  * The battery is then timed TWICE at the target scale, and both passes are
  * reported per query:
  *   - pass "cold": first target-scale execution of each query — pays any
  *     residual target-scale-only JIT (e.g. the ~256 fused plane dots of
  *     the banded-LSH queries) and first-read page-cache misses. The same
  *     policy for every query — no per-query warm-up special cases, so the
  *     numbers are comparable across entries (earlier rounds pre-warmed
  *     exactly two LSH queries at target scale, which flattered them).
  *   - pass "warm": second execution — the steady-state number a deployed
  *     pipeline sees.
  * The headline "value" stays the cold-pass total (continuity with the
  * BENCH_r* trajectory, which timed first target-scale executions).
  *
  * Machine-state markers (page cache size, load average, JVM heap) are
  * recorded at the start of each pass so an outlier run can be classified
  * mechanically (an inflated total with high starting load or a shrunken
  * page cache is ambient machine state, not a code regression).
  */
object Bench {

  private def meminfoMb(keys: Set[String]): Long =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .map(_.split(":\\s+"))
        .collect { case Array(k, v) if keys(k) => v.trim.split("\\s+")(0).toLong }
        .sum / 1024
    } catch { case _: Throwable => -1L }

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def machineState(): String = {
    val rt = Runtime.getRuntime
    val heapUsedMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    s"""{"page_cache_mb": ${meminfoMb(Set("Buffers", "Cached"))}, """ +
      s""""mem_available_mb": ${meminfoMb(Set("MemAvailable"))}, """ +
      s""""load_avg_1m": ${loadAvg()}, "jvm_heap_used_mb": $heapUsedMb}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // tmpfs checkpoints for the streaming entries: the stream-stream join
      // commits offsets/state for 32 partitions x 4 stores per batch, and
      // those fsyncs against disk /tmp are fixed cost, not data work. A real
      // cluster points this at durable storage instead (HDFS/S3); the
      // provider/commit path is identical either way.
      .config("spark.sql.streaming.checkpointLocation",
        BatteryCheckpoints.freshBase("bench"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { warmDir =>
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, warmDir).count(); () }
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    def timedPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // release per-query persisted intermediates (untimed)
        name -> elapsed
      }.toMap
    val stateCold = machineState()
    val cold = timedPass()
    val stateWarm = machineState()
    val warm = timedPass()
    val totalCold = cold.values.sum
    val totalWarm = warm.values.sum
    val qs = cold.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$totalCold,"unit":"sec","queries":$qs,""" +
      s""""total_warm_sec":${math.round(totalWarm * 1000) / 1000.0},"sf":"$sfDir"}""")
    // Durable FULL per-query artifact: the driver's bench tail truncates at
    // ~66 queries, which hid q_pagerank's 8.5 s for five rounds (PLANS.md).
    // Every run therefore also writes the complete sorted timing map — one
    // line per query, both passes — to a committable file (override the
    // path with SPARK_GRAFT_BENCH_FULL).
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_full_latest.json")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val lines = cold.toSeq.sortBy(_._1).map { case (k, v) =>
      "  \"" + k + "\": [" + fmt(v) + ", " + fmt(warm.getOrElse(k, -1.0)) + "]" }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      s"""{
         |"sf": "$sfDir",
         |"n_queries": ${cold.size},
         |"total_sec": ${math.round(totalCold * 1000) / 1000.0},
         |"total_warm_sec": ${math.round(totalWarm * 1000) / 1000.0},
         |"warmup_policy": "untimed full-battery passes at sf0.001 + sf0.01 (plan compile + C2), then two timed target-scale passes: queries[q] = [first target-scale execution, steady-state repeat]; no per-query warm-up exceptions",
         |"machine_state_at_cold_pass": $stateCold,
         |"machine_state_at_warm_pass": $stateWarm,
         |"queries": {
         |${lines.mkString(",\n")}
         |}
         |}
         |""".stripMargin)
    spark.stop()
  }
}
