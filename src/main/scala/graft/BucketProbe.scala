package graft

import org.apache.spark.sql.SparkSession

/** Dev entry behind PLANS.md's bucketed-layout evidence: bucket-write
  * lineitem and orders on the join key at SPARK_GRAFT_SF_DIR, then run the
  * same aggregation join bucketed and raw, printing both plans and timings.
  * The bucketed plan must contain NO Exchange — the shuffle was paid once at
  * write time, the read-side join runs bucket-local. Usage:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BucketProbe"
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warehouse =
      java.nio.file.Files.createTempDirectory("graft-bucketprobe").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      // disable broadcast so the exchange question is real (at sf0.1 orders
      // would broadcast; at 100 TB it would not)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    def q(li: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice")).as("price_sum"))

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm-up: JIT + page cache, untimed
    q(lineitem, orders).count()

    val (_, tRaw) = time(q(lineitem, orders).count())
    println(f"[bucketprobe] raw join (both sides shuffle): $tRaw%.2f s")
    println("===== raw plan =====")
    q(lineitem, orders).explain("formatted")

    val (_, tWrite) = time {
      minietl.io.Writers.bucketedTable(lineitem, "b_lineitem", buckets = 32,
        keys = Seq("l_orderkey"), sortKeys = Seq("l_orderkey"))
      minietl.io.Writers.bucketedTable(orders, "b_orders", buckets = 32,
        keys = Seq("o_orderkey"), sortKeys = Seq("o_orderkey"))
    }
    println(f"[bucketprobe] bucketed write (one-time layout cost): $tWrite%.2f s")

    val bl = spark.table("b_lineitem"); val bo = spark.table("b_orders")
    q(bl, bo).count() // warm-up on the bucketed layout
    val (_, tBucketed) = time(q(bl, bo).count())
    println(f"[bucketprobe] bucketed join (zero exchange): $tBucketed%.2f s")
    println("===== bucketed plan =====")
    q(bl, bo).explain("formatted")

    // the only exchange allowed in the bucketed plan is the post-join
    // aggregation shuffle (a handful of grouped rows); the join inputs
    // themselves must be exchange-free
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "(?m)^\\s*\\+?-?\\s*Exchange".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    println(s"[bucketprobe] exchanges: raw=${exchanges(q(lineitem, orders))} " +
      s"bucketed=${exchanges(q(bl, bo))} (the bucketed one is the post-agg " +
      "shuffle of grouped rows; both join inputs read bucket-local)")
    spark.stop()
  }
}
