package minietl.scheduler

import minietl.SparkTestBase
import minietl.pipeline.PipelineBuilder
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end drive of [[JobScheduler]] over a REAL Pipeline run
  * (VERDICT r16 Next #6): the parser/retry/runner pieces are unit-spec'd
  * in SchedulerSpec, but nothing proved a scheduled job actually executes
  * a Spark pipeline repeatedly on its interval and stops cleanly — the
  * way MainSpec executes the committed CLI examples. This uses the real
  * wall clock and the real background thread: a 1 s interval, a pipeline
  * that reads parquet, filters, and overwrites a parquet sink, and a
  * latch that requires at least TWO completed runs before the clean stop.
  */
class SchedulerPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("a 1 s-interval job runs a real pipeline at least twice, records " +
    "run stats, and stops cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("minietl-sched-e2e")
    val in = s"$dir/in"
    val out = s"$dir/out"
    Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "tag")
      .write.parquet(in)
    val pipeline = new PipelineBuilder("scheduled")
      .fromParquet(in)
      .filter("tag = 'keep'")
      .toParquet(out)
      .build()
    val runs = new java.util.concurrent.CountDownLatch(2)
    val sched = new JobScheduler() // real clock: the interval is honored
    sched.add("etl", "1s", () => { pipeline.run(spark); runs.countDown() })
    sched.start()
    try {
      // 2 fires at 1 s cadence + pipeline wall; generous bound, not a sleep
      assert(runs.await(60, java.util.concurrent.TimeUnit.SECONDS),
        s"fewer than 2 completed runs: ${sched.status.map(_.runCount)}")
    } finally sched.stop()
    assert(!sched.isRunning)
    val st = sched.status.head
    assert(st.runCount >= 2 && st.lastError.isEmpty && st.lastRun.nonEmpty)
    // the job ran the REAL pipeline: the sink holds the filtered rows
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted
      .toSeq === Seq(1L, 3L))
    // and a clean stop means no further fires land after it
    val after = sched.status.head.runCount
    Thread.sleep(1500)
    assert(sched.status.head.runCount === after)
  }
}
