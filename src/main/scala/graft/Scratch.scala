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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val a = try fn(spark, dir).count() catch { case e: Throwable => println(s"[scratch] $name run1 FAILED: ${e.getMessage.take(120)}"); bad += 1; -1L }
      spark.catalog.clearCache()
      val b = try fn(spark, dir).count() catch { case e: Throwable => println(s"[scratch] $name run2 FAILED: ${e.getMessage.take(120)}"); bad += 1; -2L }
      spark.catalog.clearCache()
      if (a != b) { println(s"[scratch] $name MISMATCH run1=$a run2=$b"); bad += 1 }
    }
    println(s"[scratch] idempotence check done, $bad problem(s)")
    spark.stop()
  }
}
