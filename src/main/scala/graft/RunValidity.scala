package graft

/** Three-sided bench run-validity assessment.
  *
  * The r12 lesson (VERDICT r12 "What's wrong" #1): the original rule —
  * suspect iff warm-pass total > 1.25x cold-pass total — is ONE-SIDED. It
  * catches interference landing in the WARM pass (which inflates the ratio)
  * but structurally cannot catch interference in the COLD pass, because a
  * busy cold pass makes the warm/cold ratio look BETTER. The committed
  * driver artifact BENCH_r12 was the live counterexample: load_avg 3.92 at
  * cold start, q1_pricing_summary 13.4 s cold vs 1.8-2.0 s in all three
  * clean runs, stamped `suspect: false` at ratio 0.44.
  *
  * The two-sided rule adds a PER-QUERY BAND CHECK against the committed
  * clean-run baseline (BENCH_baseline_clean.json — per-query [cold, warm]
  * medians of the r12 clean runs): a pass is suspect when at least
  * `minOffenders` queries exceed `bandRatio` x their baseline AND beat an
  * absolute floor (`bandFloorSec`, so sub-second scheduling noise on trivial
  * queries never flags). Three offenders are required because ambient
  * interference (a competing process) inflates a contiguous STRETCH of
  * queries, while a single slow query is more likely a real plan change.
  * The check fires on interference OR genuine code regression — both need a
  * human eye, and the offender list distinguishes them (regressions follow
  * the diff; interference follows the clock).
  *
  * Calibration against the four committed r12 artifacts:
  *   - contaminated driver run (BENCH_full_latest): q_case_tier 3.60 vs
  *     band 0.15, q_string_funcs 2.67 vs 0.18, q1 13.39 vs 1.94,
  *     q_salted_agg 11.92 vs ~0.6 → >= 4 cold offenders → suspect.
  *   - clean runs 2/3: max per-query deviation ~1.2x → zero offenders.
  *
  * load_avg_1m is recorded as EVIDENCE but does not drive the verdict: the
  * clean r12 runs measured 2.9-5.4 at cold-pass start (the battery's own
  * untimed warm-up passes drive load), the contaminated run 3.92 — the
  * marker does not separate the classes, the per-query band does.
  *
  * The r15 lesson (VERDICT r15 Next #1) adds side (c), a TOTAL-TIME BAND:
  * a UNIFORM ambient slowdown inflates every query a little and no query a
  * lot, so it trips neither (a) — both passes slow down together, the
  * ratio stays ~1 — nor (b) — no single query reaches 2.5x its band. The
  * live counterexample was BENCH_full_r15_run4: 234.1 s cold / 221.3 s
  * warm vs a 162.7-193.9 s clean band (~1.3x across the board, load_avg
  * 3.32 at cold start), stamped `suspect: false` and then skewing every
  * cross-round median that included it. Side (c): a pass is suspect when
  * its total over the queries SHARED with the baseline exceeds
  * `totalBandRatio` (1.25) x the baseline's total over the same queries
  * AND the excess beats `totalFloorSec` (15 s — so small batteries and
  * sub-minute jitter never false-positive). Restricting both sides to the
  * shared query set means newly registered queries can never inflate the
  * comparison. Calibration on the committed r15 artifacts: run4 cold
  * 234.1 s vs baseline 174.3 s = 1.34x, +59.8 s -> suspect; runs 1-3 cold
  * 162.7-193.9 s = at most 1.11x -> clean (replayed byte-for-byte in
  * RunValiditySpec).
  *
  * Pure functions over plain maps so the spec can replay the committed
  * artifacts byte-for-byte through the real code path.
  */
object RunValidity {

  final case class Verdict(suspect: Boolean, reasons: Seq[String],
                           offendersCold: Seq[String], offendersWarm: Seq[String])

  /** Queries whose `pass` time exceeds both the ratio and absolute-delta
    * bands vs `baseline`; formatted "name observed vs baseline". Queries
    * absent from the baseline (new this round) are skipped — they get a
    * band once a clean run of the new code is committed. Queries in the
    * `noisy` ledger (clean cross-run spread > 1.3x — a persisted property
    * measured by tools/baseline.py, VERDICT r16 Next #5) are skipped too:
    * a single noisy-query excursion is ambient by recorded evidence, and
    * the >= 3-offender rule already refused to act on singletons — this
    * makes the exclusion explicit and citable. The total bands (a)/(c)
    * still include noisy queries, so broad slowdowns cannot hide in the
    * ledger.
    */
  private def offenders(pass: Map[String, Double], baseline: Map[String, Double],
                        bandRatio: Double, bandFloorSec: Double,
                        noisy: Set[String]): Seq[String] =
    pass.toSeq.sortBy(-_._2).collect {
      case (q, t) if !noisy.contains(q) && baseline.get(q).exists(b =>
        t > b * bandRatio && t - b > bandFloorSec) =>
        f"$q $t%.2f vs ${baseline(q)}%.2f"
    }

  /** Side (c) for one pass: total over the queries shared with the
    * baseline, compared against the baseline's total over the SAME shared
    * set — a reason string when the pass is uniformly slow, None otherwise.
    */
  private def totalBandReason(pass: Map[String, Double], baseline: Map[String, Double],
                              label: String, totalBandRatio: Double,
                              totalFloorSec: Double): Option[String] = {
    val shared = pass.keySet & baseline.keySet
    if (shared.isEmpty) None
    else {
      val t = shared.toSeq.map(pass).sum
      val b = shared.toSeq.map(baseline).sum
      if (b > 0 && t > b * totalBandRatio && t - b > totalFloorSec)
        Some(f"$label pass total $t%.1f s > ${totalBandRatio}x the committed clean-baseline total $b%.1f s over the ${shared.size} shared queries (uniform ambient slowdown or broad regression)")
      else None
    }
  }

  def assess(cold: Map[String, Double], warm: Map[String, Double],
             baselineCold: Map[String, Double], baselineWarm: Map[String, Double],
             warmColdRatioMax: Double = 1.25,
             bandRatio: Double = 2.5, bandFloorSec: Double = 0.75,
             minOffenders: Int = 3,
             totalBandRatio: Double = 1.25, totalFloorSec: Double = 15.0,
             noisy: Set[String] = Set.empty): Verdict = {
    val totalCold = cold.values.sum
    val totalWarm = warm.values.sum
    val reasons = Seq.newBuilder[String]
    if (totalCold > 0 && totalWarm / totalCold > warmColdRatioMax)
      reasons += f"warm total ${totalWarm}%.1f s > ${warmColdRatioMax}x cold total ${totalCold}%.1f s (interference in the warm pass)"
    val offCold = offenders(cold, baselineCold, bandRatio, bandFloorSec, noisy)
    val offWarm = offenders(warm, baselineWarm, bandRatio, bandFloorSec, noisy)
    if (offCold.size >= minOffenders)
      reasons += s"cold pass: ${offCold.size} queries >${bandRatio}x the committed clean baseline (interference or code regression): ${offCold.take(4).mkString("; ")}"
    if (offWarm.size >= minOffenders)
      reasons += s"warm pass: ${offWarm.size} queries >${bandRatio}x the committed clean baseline (interference or code regression): ${offWarm.take(4).mkString("; ")}"
    totalBandReason(cold, baselineCold, "cold", totalBandRatio, totalFloorSec)
      .foreach(reasons += _)
    totalBandReason(warm, baselineWarm, "warm", totalBandRatio, totalFloorSec)
      .foreach(reasons += _)
    val rs = reasons.result()
    Verdict(rs.nonEmpty, rs, offCold, offWarm)
  }

  /** Parse the `"name": [cold, warm]` lines of a BENCH_full/baseline file
    * (a format this repo controls at both ends — no JSON library needed,
    * and the spec replays the committed artifacts through the same parser).
    */
  def parseQueriesBlock(text: String): Map[String, (Double, Double)] = {
    val re = """"([A-Za-z0-9_]+)"\s*:\s*\[\s*(-?[0-9.]+)\s*,\s*(-?[0-9.]+)\s*\]""".r
    re.findAllMatchIn(text).map { m =>
      m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)
    }.toMap
  }

  /** The file as UTF-8 text, None when missing/unreadable — the shared
    * read both baseline loaders sit on (a bench run must never fail
    * because the baseline is absent).
    */
  private def readText(path: String): Option[String] =
    try Some(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => None }

  /** Load a baseline file; empty map (band checks become no-ops, with a
    * visible note in the artifact) when the file is missing or unreadable.
    */
  def loadBaseline(path: String): Map[String, (Double, Double)] =
    readText(path).map(parseQueriesBlock).getOrElse(Map.empty)

  /** The baseline's `noisy_queries` ledger (tools/baseline.py: queries
    * whose clean cross-run spread exceeded 1.3x — see [[offenders]]).
    * Empty on a missing/old-format file: the ledger is an exclusion, so
    * its absence only makes the verdict stricter, never laxer.
    */
  def loadNoisy(path: String): Set[String] =
    readText(path).flatMap { text =>
      """"noisy_queries"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(text)
        .map(m => """"([A-Za-z0-9_]+)"""".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSet)
    }.getOrElse(Set.empty)
}
