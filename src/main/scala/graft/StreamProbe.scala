package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev probe: times q_stream_window alone (twice) to separate
  * fixed streaming-drain overhead from data-dependent work.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val q = SparkEntry.queries("q_stream_window")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[probe] run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
