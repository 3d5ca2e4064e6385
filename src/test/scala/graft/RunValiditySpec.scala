package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the committed r12 bench artifacts through [[RunValidity]]:
  * the driver's contaminated run must classify suspect, the clean runs
  * must not — the two-sided-validity done-criteria from VERDICT r12 #1.
  *
  * Fixture discipline (VERDICT r13 #1): every file this spec asserts on is
  * IMMUTABLE — either a frozen copy under src/test/resources (the
  * contaminated r12 run, which used to live at BENCH_full_latest.json until
  * the driver's next bench run rewrote it and silently flipped the
  * assertion) or a round-stamped BENCH_full_rNN_runK.json the driver never
  * touches again.
  *
  * BASELINE discipline (r18): the HISTORICAL replays (r12/r15 artifacts)
  * are calibrated against a FROZEN contemporaneous baseline
  * (src/test/resources/baseline_r17_frozen.json). They cannot run against
  * the live BENCH_baseline_clean.json: the live file tracks the CURRENT
  * tree's speed, and after a round that genuinely accelerates the battery
  * (r18: ~1.3x), runs from older, slower trees legitimately flag as
  * suspect under the new bands — which is the check working, not a
  * mis-calibration. The live file keeps two self-maintaining assertions:
  * its own recorded source_runs must replay clean under it (the
  * re-calibration every refresh must keep passing), and every registered
  * query must have a band.
  */
class RunValiditySpec extends AnyFunSuite {

  private def load(name: String): Map[String, (Double, Double)] = {
    val m = RunValidity.loadBaseline(name)
    assert(m.nonEmpty, s"fixture $name missing or unparseable")
    m
  }

  private val baseline = load("BENCH_baseline_clean.json")

  private val frozen = load("src/test/resources/baseline_r17_frozen.json")
  private val frozenCold = frozen.map { case (k, v) => k -> v._1 }
  private val frozenWarm = frozen.map { case (k, v) => k -> v._2 }

  /** Replay a round-stamped artifact against the FROZEN r17 baseline —
    * the calibration contemporaneous with the historical fixtures below.
    */
  private def verdictOf(file: String): RunValidity.Verdict = {
    val run = load(file)
    RunValidity.assess(run.map { case (k, v) => k -> v._1 },
      run.map { case (k, v) => k -> v._2 }, frozenCold, frozenWarm)
  }

  test("the live baseline's own source runs replay clean under it") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_baseline_clean.json")), "UTF-8")
    val sources = """"source_runs"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(text)
      .map(m => """"([^"]+)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)
    assert(sources.nonEmpty, "live baseline carries no source_runs provenance")
    val baseCold = baseline.map { case (k, v) => k -> v._1 }
    val baseWarm = baseline.map { case (k, v) => k -> v._2 }
    val noisy = RunValidity.loadNoisy("BENCH_baseline_clean.json")
    for (f <- sources) {
      val run = load(f)
      val v = RunValidity.assess(run.map { case (k, v) => k -> v._1 },
        run.map { case (k, v) => k -> v._2 }, baseCold, baseWarm, noisy = noisy)
      assert(!v.suspect, s"$f flagged under its own baseline: ${v.reasons.mkString("; ")}")
    }
  }

  test("the contaminated r12 driver run (busy COLD pass, ratio 0.44) is suspect") {
    val v = verdictOf("src/test/resources/bench_r12_contaminated.json")
    assert(v.suspect)
    // the failure mode the old one-sided rule could not catch: cold-pass
    // offenders with a healthy-looking warm/cold ratio
    assert(v.offendersCold.size >= 3, v.offendersCold.mkString(", "))
    assert(v.offendersCold.exists(_.startsWith("q1_pricing_summary")))
    assert(v.reasons.exists(_.contains("cold pass")))
  }

  test("the committed clean r12 runs stay unsuspect") {
    // run2/run3 are the baseline's own sources — exactly the replay the
    // done-criteria asks for ("clean runs still passing")
    for (f <- Seq("BENCH_full_r12_run2.json", "BENCH_full_r12_run3.json")) {
      val v = verdictOf(f)
      assert(!v.suspect, s"$f flagged: ${v.reasons.mkString("; ")}")
    }
  }

  test("warm-pass interference (the r11 failure mode) still flags") {
    val cold = Map("a" -> 10.0, "b" -> 10.0)
    val warm = Map("a" -> 20.0, "b" -> 15.0) // ratio 1.75 > 1.25
    val v = RunValidity.assess(cold, warm, Map.empty, Map.empty)
    assert(v.suspect && v.reasons.exists(_.contains("warm total")))
  }

  test("band check needs BOTH the ratio and the absolute floor") {
    val base = Map("tiny" -> 0.1, "big" -> 10.0)
    // tiny query at 4x but only +0.3 s: scheduling noise, not interference
    val v1 = RunValidity.assess(
      Map("tiny" -> 0.4, "big" -> 10.0), Map("tiny" -> 0.1, "big" -> 10.0),
      base, base)
    assert(v1.offendersCold.isEmpty)
    // three queries at 3x with > 0.75 s deltas: flags
    val base3 = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val v2 = RunValidity.assess(
      Map("a" -> 3.0, "b" -> 3.0, "c" -> 3.0), base3.map(identity), base3, base3)
    assert(v2.suspect && v2.offendersCold.size == 3)
  }

  test("side (c): the uniformly-slow r15 run4 is suspect via the total band " +
    "(VERDICT r15 Next #1)") {
    // the shape neither prior side catches: ~1.3x ambient slowdown across
    // the board (load_avg 3.32 at cold start) — no per-query 2.5x excursion,
    // warm/cold ratio ~0.95. 234.1 s cold vs the 174.3 s baseline total
    // = 1.34x, +59.8 s: both the ratio and the +15 s floor clear.
    val v = verdictOf("BENCH_full_r15_run4.json")
    assert(v.suspect, "run4 must flag under the total-time band")
    // the COLD side is the stable signal (234.1 s = 1.3-1.4x any clean
    // baseline); the warm side fired against the r15 bands (1.29x) but
    // sits marginally under 1.25x whenever a refresh lands on a slightly
    // slower warm median — don't over-pin it
    assert(v.reasons.exists(_.contains("cold pass total")), v.reasons.mkString("; "))
    // and the per-query band still does NOT fire — proving (c) is the side
    // that catches this class, not a louder (b)
    assert(v.offendersCold.size < 3 && v.offendersWarm.size < 3)
  }

  test("side (c): the clean r15 runs 1-3 stay unsuspect under the total band") {
    for (f <- Seq("BENCH_full_r15_run1.json", "BENCH_full_r15_run2.json",
                  "BENCH_full_r15_run3.json")) {
      val v = verdictOf(f)
      assert(!v.suspect, s"$f flagged: ${v.reasons.mkString("; ")}")
    }
  }

  test("side (c) needs BOTH the ratio and the +15 s floor, and only counts " +
    "queries shared with the baseline") {
    val base = Map("a" -> 10.0, "b" -> 10.0)
    // uniform 1.4x on a small battery: +8 s total, under the floor -> clean
    val small = RunValidity.assess(
      Map("a" -> 14.0, "b" -> 14.0), Map("a" -> 14.0, "b" -> 14.0), base, base)
    assert(!small.suspect, small.reasons.mkString("; "))
    // a NEW query (absent from the baseline) must not inflate the total
    val withNew = RunValidity.assess(
      Map("a" -> 10.0, "b" -> 10.0, "brand_new" -> 500.0),
      Map("a" -> 10.0, "b" -> 10.0, "brand_new" -> 500.0), base, base)
    assert(!withNew.suspect, withNew.reasons.mkString("; "))
    // uniform 1.4x with a cleared floor -> suspect, with zero (b) offenders
    val big = Map("a" -> 40.0, "b" -> 40.0)
    val uniform = RunValidity.assess(
      Map("a" -> 56.0, "b" -> 56.0), big.map(identity), big, big)
    assert(uniform.suspect && uniform.offendersCold.isEmpty,
      uniform.reasons.mkString("; "))
    assert(uniform.reasons.exists(_.contains("cold pass total")))
  }

  test("queries absent from the baseline are skipped, empty baseline disables bands") {
    val v = RunValidity.assess(Map("new_q" -> 99.0), Map("new_q" -> 99.0),
      Map.empty, Map.empty)
    assert(!v.suspect)
  }

  test("every registered query has a band in the committed clean baseline") {
    // RunValidity.assess SKIPS queries absent from the baseline (they get
    // no band until the next refresh), so a refresh that drops entries — or
    // a round that adds queries without refreshing — silently weakens the
    // production check. Fail loudly instead: the band file must cover the
    // exact battery Bench runs, i.e. every SparkEntry.queries key.
    val missing = SparkEntry.queries.keySet -- baseline.keySet
    assert(missing.isEmpty,
      s"queries with no band in BENCH_baseline_clean.json (refresh it from " +
        s"this round's clean runs): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("the contaminated fixture is frozen, not the driver-mutable path") {
    // Guards the fixture-discipline regression itself: the suspect replay
    // above must never silently point back at a file the driver rewrites.
    val src = scala.io.Source.fromFile(
      "src/test/scala/graft/RunValiditySpec.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    val asserted = """verdictOf\("([^"]+)"\)""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    assert(!asserted.contains("BENCH_full_latest.json"),
      "spec asserts on BENCH_full_latest.json, which the driver overwrites every bench run")
  }

  test("noisy-ledger queries are excluded from side (b) but still count " +
    "in the total bands (VERDICT r16 Next #5)") {
    val base3 = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val slow = Map("a" -> 3.0, "b" -> 3.0, "c" -> 3.0)
    // all three offenders in the ledger: side (b) is silent...
    val v = RunValidity.assess(slow, base3.map(identity), base3, base3,
      noisy = Set("a", "b", "c"))
    assert(v.offendersCold.isEmpty && !v.suspect, v.reasons.mkString("; "))
    // ...but a ledger entry cannot hide a UNIFORM slowdown from side (c)
    val big = Map("a" -> 40.0, "b" -> 40.0)
    val uniform = RunValidity.assess(
      Map("a" -> 56.0, "b" -> 56.0), big.map(identity), big, big,
      noisy = Set("a", "b"))
    assert(uniform.suspect && uniform.reasons.exists(_.contains("cold pass total")))
    // partial ledger: non-ledger offenders still count
    val v2 = RunValidity.assess(slow, base3.map(identity), base3, base3,
      noisy = Set("a"))
    assert(v2.offendersCold.size == 2)
  }

  test("loadNoisy reads the ledger, empty on old-format/missing files") {
    val dir = java.nio.file.Files.createTempDirectory("noisy")
    val p = dir.resolve("base.json")
    java.nio.file.Files.write(p,
      """{"noisy_queries": ["q_x", "q_y"], "queries": {"q_x": [1.0, 1.0]}}"""
        .getBytes("UTF-8"))
    assert(RunValidity.loadNoisy(p.toString) === Set("q_x", "q_y"))
    val old = dir.resolve("old.json")
    java.nio.file.Files.write(old, """{"queries": {"q_x": [1.0, 1.0]}}""".getBytes("UTF-8"))
    assert(RunValidity.loadNoisy(old.toString).isEmpty)
    assert(RunValidity.loadNoisy(dir.resolve("absent.json").toString).isEmpty)
  }

  test("parseQueriesBlock reads the committed artifact format") {
    val m = RunValidity.parseQueriesBlock(
      """"queries": {
        |  "q_a": [1.5, 0.75],
        |  "q_b": [0.1, -1.000]
        |}""".stripMargin)
    assert(m === Map("q_a" -> (1.5, 0.75), "q_b" -> (0.1, -1.0)))
  }
}
