package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev entry: run the whole battery twice in one session and
  * compare row counts — catches cross-query state leaks (temp views,
  * memory-sink names, cached frames, staged stream dirs).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def run(which: String): Option[Long] =
        try Some(fn(spark, dir).count())
        catch { case e: Throwable =>
          println(s"[scratch] $name $which FAILED: ${e.getMessage.take(120)}"); None }
      val a = run("run1"); spark.catalog.clearCache()
      val b = run("run2"); spark.catalog.clearCache()
      (a, b) match {
        case (Some(x), Some(y)) if x != y =>
          println(s"[scratch] $name MISMATCH run1=$x run2=$y"); bad += 1
        case (Some(_), Some(_)) => ()
        case _ => bad += 1 // failure already printed; count once
      }
    }
    println(s"[scratch] idempotence check done, $bad problem(s)")
    spark.stop()
  }
}
