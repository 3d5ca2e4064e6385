package minietl.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the extension
  * point SURVEY §7.4 reserves for aggregates Spark lacks. Both are
  * partial/final decomposable (associative, commutative merge), so they run
  * with map-side combine like any built-in.
  */
object Aggregators {

  /** Geometric mean via log-sum decomposition: exp(Σ ln x / n) over positive
    * inputs; nulls and non-positives ignored. The right mean for ratio-style
    * quality signals.
    */
  val geometricMean: Aggregator[java.lang.Double, (Double, Long), java.lang.Double] =
    new Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
        if (x == null || x <= 0.0) b else (b._1 + math.log(x), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): java.lang.Double =
        if (b._2 == 0) null else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** md5 hex digest — the sampling sort key. md5 (unlike xxhash64) is
    * computed identically by every SQL engine, so a bottom-k-by-md5 sample
    * is reproducible in an external oracle (`ORDER BY md5(x)`), not just
    * across Spark runs.
    */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Deterministic uniform group sample: keeps the k strings with the
    * smallest md5 digest ("bottom-k by hash") — order- and partitioning-
    * independent, so the same rows are sampled on every run and every
    * cluster layout, unlike rand()-based sampling. Per-group state is
    * bounded at k entries regardless of group size.
    */
  def bottomKSample(k: Int): Aggregator[String, Seq[(String, String)], Seq[String]] =
    new Aggregator[String, Seq[(String, String)], Seq[String]] {
      // ROW sample: duplicate input values stay duplicated (they share a
      // hash, so determinism is unaffected). Buffer invariant: sorted by
      // hash, size <= k — once saturated, a row only triggers work when its
      // hash beats the current k-th smallest (probability ~k/n).
      def zero: Seq[(String, String)] = Vector.empty
      def reduce(b: Seq[(String, String)], x: String): Seq[(String, String)] =
        if (x == null) b
        else {
          val h = md5Hex(x)
          if (b.size < k) (b :+ ((h, x))).sortBy(_._1)
          else if (h < b.last._1) (b.init :+ ((h, x))).sortBy(_._1)
          else b
        }
      def merge(a: Seq[(String, String)], b: Seq[(String, String)]): Seq[(String, String)] =
        (a ++ b).sortBy(_._1).take(k)
      def finish(b: Seq[(String, String)]): Seq[String] = b.map(_._2)
      def bufferEncoder: Encoder[Seq[(String, String)]] = ExpressionEncoder()
      def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
    }

  /** Column forms for DataFrame use. */
  def geoMean(c: Column): Column = udaf(geometricMean).apply(c)
  def sampleK(c: Column, k: Int): Column = udaf(bottomKSample(k)).apply(c)
}
