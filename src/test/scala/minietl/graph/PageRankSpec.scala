package minietl.graph

import minietl.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("coOccurrenceEdges emits symmetric distinct pairs within a group") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "z")).toDF("g", "item")
    val edges = PageRank.coOccurrenceEdges(df, "g", "item")
      .as[(String, String)].collect().toSet
    // groups: {a,b,c} and {a,b}; z is alone -> no edges
    assert(edges === Set(("a","b"),("b","a"),("a","c"),("c","a"),
      ("b","c"),("c","b")))
  }

  test("pageRankFixedPoint conserves mass and ranks the hub highest") {
    // star graph: hub h connected to 4 spokes (symmetric)
    val spokes = Seq("s1", "s2", "s3", "s4")
    val edges = spokes.flatMap(s => Seq(("h", s), (s, "h"))).toDF("src", "dst")
    val r = PageRank.pageRankFixedPoint(spark, edges, iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(r.keySet === Set("h") ++ spokes)
    // hub receives all spoke mass each round; spokes split the hub's
    assert(spokes.forall(s => r("h") > r(s)))
    // spokes are symmetric -> identical ranks
    assert(spokes.map(r).toSet.size === 1)
    // total mass stays ~scale (truncation loses < outdeg+2 units per node)
    val total = r.values.sum
    assert(math.abs(total - 1000000000000L) < 1000L, s"mass drifted: $total")
  }

  test("dangling graphs are rejected with a diagnostic, not averaged away") {
    // a -> b -> c: c has no out-edge (mass sink), a has no in-edge (vanishes)
    val dangling = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PageRank.pageRankFixedPoint(spark, dangling, iterations = 2)
    }
    assert(e.getMessage.contains("dangling-free"))
    assert(e.getMessage.contains("1 node(s) have no out-edge"))
    assert(e.getMessage.contains("1 node(s) have no in-edge"))
    // symmetrizing the same edges makes it valid
    val sym = dangling.unionByName(
      dangling.select(col("dst").as("src"), col("src").as("dst")))
    val r = PageRank.pageRankFixedPoint(spark, sym, iterations = 2)
      .as[(String, Long)].collect().toMap
    assert(r.keySet === Set("a", "b", "c"))
  }

  test("pageRankFixedPoint is deterministic across partitioning") {
    val edges = (1 to 40).flatMap { i =>
      val a = s"n${i % 7}"; val b = s"n${(i * 3) % 7}"
      if (a == b) Nil else Seq((a, b), (b, a))
    }.toDF("src", "dst")
    val r1 = PageRank.pageRankFixedPoint(spark, edges.repartition(1), 3)
      .as[(String, Long)].collect().toMap
    val r2 = PageRank.pageRankFixedPoint(spark, edges.repartition(13), 3)
      .as[(String, Long)].collect().toMap
    assert(r1 === r2)
  }
}
