package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe for the streaming battery entries: `time` mode times
  * q_stream_window (fixed drain overhead vs data work); `late` mode runs the
  * q_stream_late_data rig and prints per-micro-batch progress (input rows,
  * watermark) to check the two-batch / watermark-advance choreography.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B the checkpoint base: SPARK_GRAFT_CKPT=shm uses the battery tmpfs
    // base, anything else leaves Spark's default disk temp checkpoints
    if (sys.env.get("SPARK_GRAFT_CKPT").contains("shm"))
      builder.config("spark.sql.streaming.checkpointLocation",
        BatteryCheckpoints.freshBase("probe"))
    // A/B the state-store provider: SPARK_GRAFT_STATE_PROVIDER=rocksdb swaps
    // in the RocksDB provider (default is HDFS-backed in-memory maps)
    if (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.nonEmpty) args(0) else "time"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    mode match {
      case "late" =>
        val m = classOf[SparkEntry.type].getDeclaredMethods
          .find(_.getName == "stagedLateEventStream").get
        m.setAccessible(true)
        val stream = m.invoke(SparkEntry, spark, dir)
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        val agg = stream
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"))
        val q = agg.writeStream.format("memory").queryName("late_probe")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
            s"watermark=${p.eventTime.get("watermark")} " +
            s"droppedByWatermark=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")}")
        }
        println(s"[probe] emitted=${spark.table("late_probe").count()}")
      case "ij" =>
        // per-batch duration breakdown of the stream-stream interval join
        val purchases = classOf[SparkEntry.type].getDeclaredMethods
          .find(_.getName == "stagedEventStream").get
        purchases.setAccessible(true)
        def staged() = purchases.invoke(SparkEntry, spark, dir)
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        val p = staged().where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val c = staged().where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"),
            col("event_id").as("click_id"), col("value").as("cval"))
        val joined = minietl.streaming.Streaming.intervalJoin(
          p, c, keys = Seq("user_id"), leftTs = "ts", rightTs = "cts",
          watermarkDelay = "2 hours", lookback = "1 hour", lookahead = "0 seconds")
        val t0 = System.nanoTime()
        val q = joined.writeStream.format("memory").queryName("ij_probe")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(f"[probe] total=${(System.nanoTime() - t0) / 1e9}%.2fs")
        q.recentProgress.foreach { pr =>
          println(s"[probe] batch=${pr.batchId} rows=${pr.numInputRows} " +
            s"durations=${pr.durationMs} state=${pr.stateOperators.map(so =>
              s"rows=${so.numRowsTotal} commit=${so.commitTimeMs}ms").mkString}")
        }
      case _ =>
        val qnames = (if (args.length > 2) args(2) else "q_stream_window").split(",")
        qnames.foreach { qname =>
          val q = SparkEntry.queries(qname)
          (1 to 3).foreach { i =>
            val t0 = System.nanoTime()
            val n = q(spark, dir).count()
            println(f"[probe] $qname run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
          }
        }
    }
    spark.stop()
  }
}
