package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, to_json, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Dev entry for the optimization loop: time ONLY the named queries at
  * SPARK_GRAFT_SF_DIR (default sf0.1), isolated from the battery, with the
  * same session settings and checksum-forced materialization as graft.Bench
  * (guide §1.4: count() lets Catalyst elide count-preserving operators, so
  * A/B numbers timed under count are not the numbers the bench sees).
  *
  * Usage: SPARK_GRAFT_QB_REPS=4 sbt "runMain graft.QueryBench q_pagerank ..."
  * Prints per-query rep times; rep1 ~ the bench cold pass (after the same
  * sf0.001+sf0.01 warm-ups, restricted to the named queries), reps 2+ ~ warm.
  */
object QueryBench {
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case a: ArrayType => containsMap(a.elementType)
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private def force(df: DataFrame): Unit = {
    val renamed = df.toDF(df.columns.indices.map("c" + _): _*)
    val cols = renamed.schema.fields.map { f =>
      if (containsMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    if (cols.isEmpty) { renamed.count(); () }
    else {
      renamed.select(xxhash64(cols.toIndexedSeq: _*).as("__row_h"))
        .agg(expr("bit_xor(__row_h)")).collect()
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryBench <query names...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QB_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        BatteryCheckpoints.freshBase("qbench"))
    // dev-only A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" lets a session
    // config candidate be measured both ways without a recompile. Bench
    // (the driver artifact) deliberately has no such hook — a config that
    // survives the A/B is promoted to an explicit, documented setting there.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { warmDir =>
      names.foreach { n =>
        try force(SparkEntry.queries(n)(spark, warmDir))
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try force(SparkEntry.queries(n)(spark, sfDir))
        catch { case e: Throwable =>
          println(s"[qbench] $n FAILED: ${e.getMessage.take(200)}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[qbench] $n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
