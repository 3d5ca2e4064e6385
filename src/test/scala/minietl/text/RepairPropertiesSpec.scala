package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the within-document repetition repairs: both cleaners
  * must be idempotent (cleaning clean text is a no-op), order-preserving,
  * and agree with a straightforward Scala reference implementation on
  * arbitrary token streams — including empty tokens and single-token docs.
  */
class RepairPropertiesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache): 40 seeded draws per property.
    */
  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    (1 to 40).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // small alphabet so runs and repeats actually occur
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "aa", "x1"))
  } yield toks.mkString(" ")

  private def squeezeRef(s: String): String = {
    val t = s.split(" ", -1)
    t.zipWithIndex.collect { case (x, i) if i == 0 || x != t(i - 1) => x }
      .mkString(" ")
  }

  private def firstOccRef(s: String): String = {
    val t = s.split(" ", -1)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    t.foreach(seen.add)
    seen.mkString(" ")
  }

  private def run(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                  s: String): String =
    Seq(Tuple1(s)).toDF("text").select(fn(col("text")).as("r")).as[String].collect()(0)

  test("squeezeRepeats agrees with the reference fold and is idempotent") {
    forAll(docGen) { doc =>
      val once = run(TextAnalysis.squeezeRepeats(_), doc)
      assert(once === squeezeRef(doc), s"input: '$doc'")
      assert(run(TextAnalysis.squeezeRepeats(_), once) === once, s"not idempotent on '$doc'")
    }
  }

  test("dedupSegmentsInDoc agrees with ordered-set semantics and is idempotent") {
    forAll(docGen) { doc =>
      val once = run(TextAnalysis.dedupSegmentsInDoc(_, " "), doc)
      assert(once === firstOccRef(doc), s"input: '$doc'")
      assert(run(TextAnalysis.dedupSegmentsInDoc(_, " "), once) === once,
        s"not idempotent on '$doc'")
    }
  }

  test("dedup after squeeze equals dedup alone (squeeze removes only duplicates)") {
    forAll(docGen) { doc =>
      val squeezedThenDedup =
        run(TextAnalysis.dedupSegmentsInDoc(_, " "), run(TextAnalysis.squeezeRepeats(_), doc))
      assert(squeezedThenDedup === firstOccRef(doc), s"input: '$doc'")
    }
  }
}
