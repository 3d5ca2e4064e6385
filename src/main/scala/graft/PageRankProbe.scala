package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: within-one-JVM A/B of the q_pagerank pipeline pieces at
  * sf0.1 — edge-build variants (plain single-task scan vs slim-projection
  * spread) and iteration-join variants (planner default SMJ vs
  * SHUFFLE_HASH-hinted rank side) — interleaved and repeated so JIT and
  * ambient noise hit all variants equally.
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def sec[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def edgeBuild(spread: Boolean): Double = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val src0 =
        if (spread) li.select(col("l_orderkey"), col("l_partkey"))
          .repartition(spark.sparkContext.defaultParallelism)
        else li
      val e = minietl.graph.PageRank
        .coOccurrenceEdges(src0, "l_orderkey", "l_partkey")
        .select("src", "dst").persist()
      val t = sec(e.count())
      e.unpersist(true)
      t
    }

    // one shared edge/deg cache for the iteration A/B
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e = minietl.graph.PageRank
      .coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .select("src", "dst").persist()
    val nE = e.count()
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nN = deg.count()
    println(s"[prp] edges=$nE nodes=$nN")
    val e2plain = e.join(deg, e("src") === deg("node"))
      .select(col("src"), col("dst"), col("outdeg")).persist()
    e2plain.count()
    val e2bySrc = e.join(deg, e("src") === deg("node"))
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src")).persist()
    e2bySrc.count()
    val scale = 1000000000000L
    val base = (15L * scale / 100L) / nN

    def iters(e2: DataFrame, hint: String): Double = sec {
      var r = deg.select(col("node"), lit(scale / nN).as("rank_fp"))
      (1 to 3).foreach { _ =>
        val rh = if (hint.isEmpty) r else r.hint(hint)
        val next = e2.join(rh, e2("src") === rh("node"))
          .groupBy(col("dst").as("node"))
          .agg((lit(base) + expr("85 * sum(rank_fp DIV outdeg) DIV 100")).as("rank_fp"))
        r = next.localCheckpoint(true)
      }
      r.unpersist()
    }

    // one-iteration plan dumps for the committed before/after evidence
    // (the declared query's own explain is a post-checkpoint stub)
    if (sys.env.contains("SPARK_GRAFT_PRP_PLANS")) {
      // the REAL iteration shape: the rank side of iterations 2..n is the
      // previous iteration's NESTED aggregation (no stats), exactly as
      // pageRankFixedPoint folds it — that is the shape where the planner
      // falls back to sort-merge without the hint
      def nestedPlan(e2: DataFrame, hint: String): Unit = {
        val init = deg.select(col("node"), lit(scale / nN).as("rank_fp"))
        val last = (1 to 3).foldLeft(init) { (r, _) =>
          val rh = if (hint.isEmpty) r else r.hint(hint)
          e2.join(rh, e2("src") === rh("node"))
            .groupBy(col("dst").as("node"))
            .agg((lit(base) + expr("85 * sum(rank_fp DIV outdeg) DIV 100")).as("rank_fp"))
        }
        println(s"===== pagerank_iteration hint='$hint' =====")
        last.explain("formatted")
      }
      nestedPlan(e2plain, "")
      nestedPlan(e2bySrc, "SHUFFLE_HASH")
      spark.stop()
      return
    }
    (1 to 4).foreach { rep =>
      val a = iters(e2plain, "")
      val b = iters(e2plain, "SHUFFLE_HASH")
      val c = iters(e2bySrc, "SHUFFLE_HASH")
      val d = iters(e2plain, "BROADCAST")
      println(f"[prp] rep$rep 3-iters: smj=$a%.2f shj=$b%.2f shj+src=$c%.2f bhj=$d%.2f s")
    }
    (1 to 4).foreach { rep =>
      val p = edgeBuild(spread = false)
      val s = edgeBuild(spread = true)
      println(f"[prp] rep$rep edgeBuild: plain=$p%.2f spread=$s%.2f s")
    }
    spark.stop()
  }
}
