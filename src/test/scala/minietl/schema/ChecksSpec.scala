package minietl.schema

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0, "en"),
    (2L, Some("b"), 55.0, "en"),
    (3L, None, 99.0, "de"),
    (3L, Some("d"), 200.0, "xx"))
    .toDF("id", "name", "score", "lang")

  test("all check types evaluate from one aggregation pass") {
    val results = Checks.run(df, Seq(
      Checks.complete("id"),
      Checks.complete("name"),
      Checks.completeness("name", 0.7),
      Checks.unique("id"),
      Checks.unique("name"),
      Checks.inRange("score", 0, 100),
      Checks.isIn("lang", Seq("en", "de", "fr")),
      Checks.satisfies("score>5", col("score") > 5),
      Checks.countBetween(1, 10)))
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("complete(id)").passed)
    assert(!byName("complete(name)").passed)
    assert(byName("complete(name)").detail === "1 null(s)")
    assert(byName("completeness(name >= 0.7)").passed)
    assert(!byName("unique(id)").passed)
    assert(byName("unique(name)").passed) // nulls ignored
    assert(!byName("inRange(score, [0.0, 100.0])").passed)
    assert(!byName("isIn(lang)").passed)
    assert(byName("satisfies(score>5 >= 1.0)").passed)
    assert(byName("countBetween(1, 10)").passed)
  }

  test("enforce throws with every failing check named") {
    val e = intercept[IllegalStateException] {
      Checks.enforce(df, Seq(Checks.unique("id"), Checks.inRange("score", 0, 100)))
    }
    assert(e.getMessage.contains("unique(id)"))
    assert(e.getMessage.contains("inRange"))
    Checks.enforce(df, Seq(Checks.complete("id"))) // passing set: no throw
  }

  test("empty input: every check flavor is vacuously true") {
    val empty = df.filter(col("id") < 0)
    val results = Checks.run(empty, Seq(
      Checks.complete("name"), Checks.completeness("name", 0.9),
      Checks.unique("id"), Checks.inRange("score", 0, 1),
      Checks.satisfies("p", col("score") > 1e9), Checks.countBetween(0, 10)))
    assert(results.forall(_.passed), results.filterNot(_.passed).toString)
  }

  test("report mirrors run as a (check_name, passed, observed) frame") {
    val checks = Seq(
      Checks.complete("id"), Checks.unique("id"),
      Checks.satisfies("pos", col("score") >= 0, 1.0))
    val rep = Checks.report(df, checks).orderBy("check_name")
      .as[(String, Boolean, Option[Double])].collect().toSeq
    val byName = Checks.run(df, checks).map(r => r.name -> r.passed).toMap
    assert(rep.map(_._1).toSet === byName.keySet)
    rep.foreach { case (name, passed, obs) =>
      assert(passed === byName(name))
      assert(obs.isDefined) // all three aggregates observe a number
    }
  }

  test("checks integrate as a pipeline gate") {
    val p = new minietl.pipeline.PipelineBuilder("gated")
      .fromDataFrame(df)
      .transform { d => Checks.enforce(d, Seq(Checks.complete("id"))); d }
      .toNoop()
      .build()
    assert(p.run(spark).rows === 4)
  }
}
