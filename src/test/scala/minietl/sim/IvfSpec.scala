package minietl.sim

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // three well-separated clusters around axis corners, 30 vectors each
  private def clustered = {
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.5f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("autoNlist: ceil(n/target), clamped to maxNlist and to n") {
    val df = spark.range(2500).toDF("vec_id")
    assert(Ivf.autoNlist(df) === 5)                               // 2500/500
    assert(Ivf.autoNlist(df, targetClusterRows = 400) === 7)      // ceil
    assert(Ivf.autoNlist(df, targetClusterRows = 10000) === 1)    // floor 1
    assert(Ivf.autoNlist(df, targetClusterRows = 1, maxNlist = 64) === 64)
    // train requires corpus >= nlist, so the derivation clamps to n
    assert(Ivf.autoNlist(spark.range(3).toDF("vec_id"), targetClusterRows = 1) === 3)
    intercept[IllegalArgumentException] {
      Ivf.autoNlist(spark.range(0).toDF("vec_id"))
    }
  }

  test("train recovers well-separated clusters (each list gets ~a third)") {
    val model = Ivf.train(clustered, nlist = 3, iters = 4)
    assert(model.nlist === 3 && model.dim === 4)
    val counts = clustered
      .select(Ivf.assignList(transform(col("embedding"), _.cast("double")), model).as("l"))
      .groupBy("l").count().as[(Int, Long)].collect().toMap
    assert(counts.size === 3)
    assert(counts.values.forall(c => c >= 25 && c <= 35), counts.toString)
  }

  test("clusterComposition partitions the corpus and aggregates by the label column") {
    val model = Ivf.train(clustered, nlist = 3, iters = 4)
    // label = the planted cluster id (i % 3)
    val labeled = clustered.withColumn("label", pmod(col("vec_id"), lit(3)).cast("int"))
    val comp = Ivf.clusterComposition(labeled, model, byCols = Seq("label"))
      .collect()
    // every row is counted exactly once across the composition cells
    assert(comp.map(_.getAs[Long]("n")).sum === 90L)
    assert(comp.forall(r => r.getAs[Long]("cluster") >= 0 && r.getAs[Long]("cluster") < 3))
    // well-separated data: each k-means cluster is label-pure, so the
    // composition is exactly 3 cells of 30
    assert(comp.length === 3 && comp.forall(_.getAs[Long]("n") === 30L))
  }

  test("train is deterministic across invocations") {
    val a = Ivf.train(clustered, nlist = 3, iters = 3)
    val b = Ivf.train(clustered, nlist = 3, iters = 3)
    assert(a.centroids === b.centroids)
  }

  test("topK with nprobe=1 matches brute force on clustered data") {
    val model = Ivf.train(clustered, nlist = 3, iters = 4)
    val queries = clustered.filter(col("vec_id") < 3)
    val ivf = Ivf.topK(clustered, queries, model, k = 5, nprobe = 1)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSet
    // same-cluster neighbors dominate cosine here, so IVF@nprobe=1 is exact
    assert(ivf === brute)
  }

  test("probing more lists can only widen the candidate set") {
    val model = Ivf.train(clustered, nlist = 3, iters = 4)
    val queries = clustered.filter(col("vec_id") === 0)
    def candidates(np: Int) =
      Ivf.topK(clustered, queries, model, k = 90, nprobe = np).count()
    assert(candidates(1) <= candidates(2))
    assert(candidates(2) <= candidates(3))
  }

  test("works on the shared embeddings testdata with sane recall") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = Ivf.train(e, nlist = 8, iters = 3)
    val queries = e.filter(col("vec_id") < 5)
    val ivf = Ivf.topK(e, queries, model, k = 10, nprobe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, queries, k = 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }
}
