package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 64

  // a separable two-language toy corpus: distinct token inventories
  private def corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog ate the bone", "en"),
    (3L, "a cat and a dog", "en"),
    (4L, "le chat dort sur le tapis", "fr"),
    (5L, "le chien mange un os", "fr"),
    (6L, "un chat et un chien", "fr")
  ).toDF("doc_id", "text", "lang")

  test("model shape: one row per label, dim-length weights, finite values") {
    val m = NaiveBayes.train(corpus, "lang", "text", dim).collect()
    assert(m.length === 2)
    m.foreach { r =>
      val w = r.getAs[scala.collection.Seq[Double]]("w")
      assert(w.length === dim)
      assert(w.forall(x => !x.isNaN && !x.isInfinite && x < 0.0))
      assert(r.getAs[Double]("log_prior") < 0.0)
    }
  }

  test("separable corpus classifies itself perfectly") {
    val m = NaiveBayes.train(corpus, "lang", "text", dim)
    val pred = NaiveBayes.classify(corpus, m, "doc_id", "text", dim)
      .join(corpus.select("doc_id", "lang"), "doc_id")
      .collect()
    assert(pred.length === 6)
    pred.foreach(r => assert(r.getAs[String]("pred") === r.getAs[String]("lang")))
  }

  test("score matches the closed-form fold computed independently") {
    val m: Map[String, (Double, scala.collection.Seq[Double])] =
      NaiveBayes.train(corpus, "lang", "text", dim).collect()
        .map(r => r.getAs[String]("label") ->
          (r.getAs[Double]("log_prior"), r.getAs[scala.collection.Seq[Double]]("w"))).toMap
    // recompute doc 1's en-score by hand with the same md5-60 slot hash
    val toks = "the cat sat on the mat".split(" ")
    def slot(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(15), 16) % dim).toInt
    }
    val tf = Array.fill(dim)(0L)
    toks.foreach(t => tf(slot(t)) += 1)
    val bayes = NaiveBayes.train(corpus, "lang", "text", dim)
    val got = NaiveBayes.classify(corpus.where($"doc_id" === 1), bayes,
      "doc_id", "text", dim).collect()(0)
    val (prior, w) = m("en")
    var expected = prior
    (0 until dim).foreach(s => expected += tf(s) * w(s))
    assert(got.getAs[String]("pred") === "en")
    assert(got.getAs[Double]("score") === expected)
  }

  test("tie-break: equal scores pick the lexicographically smallest label") {
    // two labels with IDENTICAL corpora produce identical weights and
    // priors, so every score ties — argmax must pick "a" over "b"
    val tied = Seq((1L, "x y z", "a"), (2L, "x y z", "b")).toDF("doc_id", "text", "lang")
    val m = NaiveBayes.train(tied, "lang", "text", dim)
    val out = NaiveBayes.classify(tied, m, "doc_id", "text", dim).collect()
    out.foreach(r => assert(r.getAs[String]("pred") === "a"))
  }

  test("a label whose documents are all null-text keeps its prior and " +
    "uniform weights (left-joined priors, ADVICE r14)") {
    // under the old inner join the "xx" label vanished from the model and
    // every xx row was silently unroutable
    val withNullLabel = corpus.unionByName(
      Seq((7L, null.asInstanceOf[String], "xx"),
          (8L, null.asInstanceOf[String], "xx")).toDF("doc_id", "text", "lang"))
    val m = NaiveBayes.train(withNullLabel, "lang", "text", dim).collect()
    assert(m.map(_.getAs[String]("label")).sorted.toSeq === Seq("en", "fr", "xx"))
    val xx = m.find(_.getAs[String]("label") == "xx").get
    assert(xx.getAs[Double]("log_prior") === math.log(2.0 / 8.0))
    val w = xx.getAs[scala.collection.Seq[Double]]("w")
    // total=0, every count 0 -> every slot weight ln(1/dim)
    assert(w.forall(_ === math.log(1.0 / dim)))
  }

  test("plan: serving is ONE scan with zero exchanges") {
    // the model is inlined as literals (Ivf centroid idiom), so the whole
    // serving pass — folds + argmax — happens scan-side with no shuffle,
    // no broadcast, no join
    val m = NaiveBayes.train(corpus, "lang", "text", dim)
    val plan = NaiveBayes.classify(corpus, m, "doc_id", "text", dim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"serving must be a single scan-side pass:\n$plan")
  }
}

class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 16

  private def corpus = Seq(
    (1L, "alpha beta gamma alpha", "en"),
    (2L, "alpha alpha beta delta", "en"),
    (3L, "zeta eta theta iota", "de"),
    (4L, "kappa zeta eta theta", "de"),
    (5L, "alpha beta zeta kappa", "mix")
  ).toDF("doc_id", "text", "lang")

  test("log-ratio vector is one row of dim doubles") {
    val r = Dsir.logRatio(corpus, "text", col("lang") === "en", dim).collect()
    assert(r.length === 1)
    val v = r(0).getAs[scala.collection.Seq[Double]](0)
    assert(v.length === dim)
    assert(v.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("target-domain docs outscore off-domain docs; top-k is deterministic") {
    val ratio = Dsir.logRatio(corpus, "text", col("lang") === "en", dim)
    val top = Dsir.select(corpus, ratio, "doc_id", "text", dim, k = 2).collect()
    assert(top.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(1L, 2L)),
      s"top-2 under an en-target ratio must be the en docs, got ${top.mkString(",")}")
    assert(top.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2))
  }

  test("scores are the sequential fold of tf times ratio") {
    val ratio = Dsir.logRatio(corpus, "text", col("lang") === "en", dim)
    val rv = ratio.collect()(0).getAs[scala.collection.Seq[Double]](0)
    def slot(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.take(15), 16) % dim).toInt
    }
    val toks = "alpha beta gamma alpha".split(" ")
    val tf = Array.fill(dim)(0L)
    toks.foreach(t => tf(slot(t)) += 1)
    var expected = 0.0
    (0 until dim).foreach(s => expected += tf(s) * rv(s))
    val got = Dsir.select(corpus, ratio, "doc_id", "text", dim, k = 5)
      .where($"doc_id" === 1).collect()(0).getAs[Double]("score")
    assert(got === expected)
  }
}
