package minietl.sketch

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("kmvDistinct degrades to the exact count below k") {
    val df = (1 to 50).map(i => s"v$i").toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(row.getAs[Long]("n_kept") === 50L)
    assert(row.getAs[Double]("estimate") === 50.0)
  }

  test("kmvDistinct estimates within ~3/sqrt(k) at 10x k distinct values") {
    val n = 2560
    val df = (1 to n).map(i => s"value_$i").toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(row.getAs[Long]("n_kept") === 256L)
    val est = row.getAs[Double]("estimate")
    // standard error of KMV is ~1/sqrt(k-2) ≈ 6.3%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.19, s"estimate $est too far from $n")
  }

  test("kmvDistinct ignores duplicates and nulls") {
    val df = ((1 to 100).map(i => s"x${i % 10}") :+ null).toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 64).head()
    assert(row.getAs[Long]("n_kept") === 10L)
    assert(row.getAs[Double]("estimate") === 10.0)
  }

  test("kmvDistinct partition-local bottom-k equals the naive distinct/sort/limit") {
    import minietl.functions.PortableHash
    // adversarial layout: duplicates crowding partitions, values interleaved
    // so every partition holds some of the global bottom-k
    val df = spark.range(0, 5000).repartition(16)
      .select(concat(lit("key_"), (col("id") % 1200).cast("string")).as("v"))
    val k = 64
    val fast = Sketches.kmvDistinct(df, "v", k).head()
    val naive = df
      .select(PortableHash.md5Hash60(col("v").cast("string")).as("h"))
      .where(col("h").isNotNull).distinct().orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash")).head()
    assert(fast.getAs[Long]("n_kept") === naive.getAs[Long]("n_kept"))
    assert(fast.getAs[Long]("kth_hash") === naive.getAs[Long]("kth_hash"))
  }

  test("kmvDistinct plan has no full-cardinality exchange before the bottom-k") {
    // the bounded accumulator must run BEFORE the shuffle: the scan-side
    // stage (everything below the first exchange) must contain the
    // mapPartitions stage, so the exchange moves <= p*k longs
    val df = spark.range(0, 1000).select(col("id").cast("string").as("v"))
    val plan = Sketches.kmvDistinct(df, "v", 32).queryExecution.executedPlan.toString
    val lastExchange = plan.lastIndexOf("Exchange")
    val mapPart = plan.indexOf("MapPartitions")
    assert(mapPart >= 0, s"expected a MapPartitions stage in:\n$plan")
    // the plan prints top-down (scan last), so "no exchange below the
    // accumulator" means every Exchange prints BEFORE the MapPartitions
    assert(mapPart > lastExchange,
      s"bottom-k accumulator must sit below every exchange (mapPartitions " +
        s"at $mapPart, last exchange at $lastExchange):\n$plan")
  }

  test("countMinSketch cell counts sum to depth x token count") {
    val toks = Seq("a", "b", "a", "c", "a", "b").toDF("t")
    val sketch = Sketches.countMinSketch(toks, "t", depth = 4, width = 16)
    assert(sketch.agg(sum("n")).head().getLong(0) === 4L * 6)
    assert(sketch.select("lane").distinct().count() === 4)
    assert(sketch.where(col("bucket") < 0 || col("bucket") >= 16).count() === 0)
  }

  test("countMinTopK estimates dominate exact counts and find the heavy hitter") {
    val toks = (Seq.fill(500)("heavy") ++ (1 to 300).map(i => s"rare_$i")).toDF("t")
    val out = Sketches.countMinTopK(toks, "t", depth = 4, width = 64, k = 5)
      .orderBy(col("exact_n").desc, col("token")).collect()
    assert(out.head.getAs[String]("token") === "heavy")
    assert(out.head.getAs[Long]("exact_n") === 500L)
    // CMS never underestimates
    out.foreach(r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"), r.toString))
    // with 300 rare tokens over 4x64 cells the heavy estimate stays close
    assert(out.head.getAs[Long]("cms_n") <= 500L + 300L)
  }

  test("logHistQuantiles is exact in the sub-8 integer range") {
    // scale 1, values 0..7 → bucket == x; p50 of 8 values: rank ceil(4) = 4,
    // first bucket with cum >= 4 is 3 → lower-bound estimate 3.0
    val df = (0 to 7).map(_.toDouble).toDF("v")
    val out = Sketches.logHistQuantiles(df, Nil, "v",
      Seq((50, 100), (100, 100)), scale = 1L).orderBy("q_num").collect()
    assert(out.map(r => (r.getAs[Int]("q_num"), r.getAs[Double]("est"))).toSeq
      === Seq((50, 3.0), (100, 7.0)))
  }

  test("logHistQuantiles brackets the exact quantile within one 12.5% bucket") {
    val vals = (1 to 2000).map(i => (i * i).toDouble / 7.0) // skewed spread
    val df = vals.toDF("v")
    val exactP95 = vals.sorted.apply(math.ceil(0.95 * vals.size).toInt - 1)
    val est = Sketches.logHistQuantiles(df, Nil, "v", Seq((95, 100)))
      .collect()(0).getAs[Double]("est")
    // the rank-th value lies inside the chosen bucket: [est, est * 1.125)
    assert(est <= exactP95, s"est $est > exact $exactP95")
    assert(exactP95 < est * 1.125 + 2.0 / 1000, s"exact $exactP95 outside bucket of $est")
  }

  test("logHistQuantiles partitions by keys") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 1000.0), ("b", 2000.0))
      .toDF("k", "v")
    val out = Sketches.logHistQuantiles(df, Seq("k"), "v", Seq((100, 100)))
      .orderBy("k").collect()
    // max estimates land in the right per-key octave (lower bound <= max < lb*1.125)
    val a = out(0).getAs[Double]("est"); val b = out(1).getAs[Double]("est")
    assert(a <= 30.0 && 30.0 < a * 1.125)
    assert(b <= 2000.0 && 2000.0 < b * 1.125)
  }

  test("logHistQuantiles fails loudly on a negative value") {
    val df = Seq(1.0, -2.0).toDF("v")
    val e = intercept[Exception] {
      Sketches.logHistQuantiles(df, Nil, "v", Seq((50, 100))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("requires v >= 0")),
      s"expected the contract message in: ${messages(e).mkString(" | ")}")
  }

  test("logHistQuantiles rejects malformed quantiles") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(df, Nil, "v", Seq((101, 100)))
    }
    intercept[IllegalArgumentException] {
      Sketches.logHistQuantiles(df, Nil, "v", Nil)
    }
  }
}
