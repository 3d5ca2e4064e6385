package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r17 Next #7): within-one-JVM A/B of the relational
  * single-task scans — q1's aggregation over (a) the plain read and (b) a
  * narrow projection repartitioned before the aggregation ("project then
  * repartition", dodging the 11-column row-serialization objection that
  * killed the blanket rebalance in r17).
  */
object RelationalScanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def sec[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
    def q1Agg(src: DataFrame): Long =
      src.filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("_sq"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("_sp"),
          sum(revenue.cast("decimal(18,4)")).as("_sdp"),
          sum((revenue * (lit(1) + col("l_tax"))).cast("decimal(18,6)")).as("_sc"),
          sum(col("l_discount").cast("decimal(18,2)")).as("_sd"),
          count(lit(1)).as("count_order"))
        .collect().length.toLong
    val cols7 = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    (1 to 4).foreach { rep =>
      val li1 = spark.read.parquet(s"$dir/lineitem.parquet")
      val plain = sec(q1Agg(li1))
      val li2 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(cols7.map(col): _*)
        .repartition(spark.sparkContext.defaultParallelism)
      val proj = sec(q1Agg(li2))
      println(f"[rsp] rep$rep q1: plain=$plain%.2f projRepart=$proj%.2f s")
    }
    spark.stop()
  }
}
