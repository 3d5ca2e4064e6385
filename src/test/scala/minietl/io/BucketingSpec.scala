package minietl.io

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-join layout: the shuffle is paid at write time; subsequent
  * equi-joins on the bucket keys must plan WITHOUT an exchange.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def facts = (1 to 5000).map(i => (i.toLong % 97, i.toLong, i * 1.5))
    .toDF("k", "id", "v")
  private def dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("bucketed tables join without a shuffle exchange") {
    // force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Writers.bucketedTable(facts, "b_facts", buckets = 8, keys = Seq("k"), sortKeys = Seq("k"))
      Writers.bucketedTable(dims, "b_dims", buckets = 8, keys = Seq("k"), sortKeys = Seq("k"))
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 5000)

      // the same join over raw (unbucketed) frames DOES shuffle
      val rawPlan = facts.join(dims, "k").queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("aggregation on the bucket key skips the shuffle too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Writers.bucketedTable(facts, "b_agg", buckets = 8, keys = Seq("k"))
      val agg = spark.table("b_agg").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
      assert(agg.count() === 97)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_agg")
    }
  }
}
