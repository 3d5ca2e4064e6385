package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, to_json, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Dev entry for the optimization loop (guide §1.1 "empirical"): run ONE
  * named query with the bench session settings and print a per-job and
  * per-stage wall/task-time breakdown from a SparkListener — the local
  * stand-in for the Spark UI's Stages page (the UI is disabled in the
  * battery sessions). Times only the LAST rep so JIT/page-cache noise of
  * the earlier reps does not pollute the stage table.
  *
  * Usage: SPARK_GRAFT_PROF_REPS=3 sbt "runMain graft.ProfileQuery q_pagerank"
  */
object ProfileQuery {
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case a: ArrayType => containsMap(a.elementType)
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private def force(df: DataFrame): Unit = {
    val renamed = df.toDF(df.columns.indices.map("c" + _): _*)
    val cols = renamed.schema.fields.map { f =>
      if (containsMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    if (cols.isEmpty) { renamed.count(); () }
    else {
      renamed.select(xxhash64(cols.toIndexedSeq: _*).as("__row_h"))
        .agg(expr("bit_xor(__row_h)")).collect()
      ()
    }
  }

  final case class StageRec(stageId: Int, name: String, nTasks: Int,
                            submitMs: Long, doneMs: Long, taskTimeMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        BatteryCheckpoints.freshBase("prof"))
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    @volatile var recording = false
    val taskTime = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (recording) {
        taskTime.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong())
          .addAndGet(Option(t.taskInfo).map(_.duration).getOrElse(0L)); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (recording) {
        val si = sc.stageInfo
        stages.add(StageRec(si.stageId, si.name.split("\n")(0).take(90), si.numTasks,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          Option(taskTime.get(si.stageId)).map(_.get()).getOrElse(0L))); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (recording) {
        jobs.add((j.jobId, "", j.time)); ()
      }
    })
    args.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val fn = SparkEntry.queries(name)
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
        try force(fn(spark, d)) catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      (1 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
        println(f"[prof] $name warm rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
      stages.clear(); jobs.clear(); taskTime.clear()
      recording = true
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        println(s"[prof] $name FAILED: ${e.getMessage.take(200)}") }
      val total = (System.nanoTime() - t0) / 1e9
      recording = false
      spark.catalog.clearCache()
      println(f"\n[prof] $name recorded rep: $total%.2f s, ${stages.size} stages")
      import scala.jdk.CollectionConverters._
      val recs = stages.asScala.toSeq.sortBy(-_.taskTimeMs)
      println(f"${"stageId"}%8s ${"tasks"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s  name")
      recs.take(30).foreach { r =>
        println(f"${r.stageId}%8d ${r.nTasks}%6d ${r.doneMs - r.submitMs}%8d ${r.taskTimeMs}%8d  ${r.name}")
      }
      val wallSum = recs.map(r => r.doneMs - r.submitMs).sum
      val taskSum = recs.map(_.taskTimeMs).sum
      println(f"[prof] $name stage wall sum ${wallSum / 1e3}%.2f s, task time sum ${taskSum / 1e3}%.2f s, " +
        f"stages ${recs.size}, tasks ${recs.map(_.nTasks).sum}")
    }
    spark.stop()
  }
}
