package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the trained-centroid digests IvfSpec pins (one line
  * per (sf, nlist)) so the golden values are generated, not hand-written.
  */
object IvfDigestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); nlist <- Seq(8, 4)) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val model = minietl.sim.Ivf.train(e, nlist = nlist, iters = 3)
      val rendered = model.centroids
        .map(_.map(_.toString).mkString(",")).mkString(";")
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(rendered.getBytes("UTF-8")).map("%02x".format(_)).mkString
      println(s"""[ivfdigest] ("$sf", $nlist) -> "$d",""")
    }
    spark.stop()
  }
}
