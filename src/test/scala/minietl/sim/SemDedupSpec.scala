package minietl.sim

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // two well-separated directions in R^4, plus a chain around the first
  private def corpus = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),     // cluster A canonical
    (2L, Seq(0.98f, 0.199f, 0.0f, 0.0f)),  // ≈ 1
    (3L, Seq(0.92f, 0.392f, 0.0f, 0.0f)),  // ≈ 2, NOT ≈ 1 at a tight τ
    (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),     // cluster B canonical
    (5L, Seq(0.0f, 0.0f, 0.98f, 0.199f)),  // ≈ 4
    (6L, Seq(0.0f, 0.0f, 0.0f, 1.0f))      // isolated-ish
  ).toDF("vec_id", "embedding")

  test("transitive chains collapse to one canonical even when ends are far") {
    val model = Ivf.Model(Vector(
      Vector(1.0, 0.0, 0.0, 0.0), Vector(0.0, 0.0, 1.0, 0.0)))
    // cos(1,2) ≈ .98, cos(2,3) ≈ .987, cos(1,3) ≈ .92 — τ=.97 connects the
    // chain only through 2: transitivity must still fold 3 into comp 1
    val out = SemDedup.semDedup(corpus, model, tau = 0.97)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (1L, 1L))
    assert(out(2L) === (1L, 0L))
    assert(out(3L)._1 === 1L, "chain end must join via transitivity")
    assert(out(3L)._2 === 0L)
    assert(out(4L) === (4L, 1L))
    assert(out(5L) === (4L, 0L))
    assert(out(6L)._2 === 1L)
  }

  test("pairs never cross cluster boundaries (the published recall trade)") {
    // identical vectors forced into different clusters by the model can't
    // be connected — SemDeDup's documented design point, verified here so
    // a regression toward all-pairs would fail loudly
    val twins = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      // 3 (tie → cluster 0) and 4 (clearly cluster 0) merge within-cluster;
      // 5 sits across the boundary in cluster 1, near-identical to both
      // (cos ≈ .998) yet must NOT merge — that is the recall trade
      (3L, Seq(0.71f, 0.71f)), (4L, Seq(0.72f, 0.70f)), (5L, Seq(0.70f, 0.72f))
    ).toDF("vec_id", "embedding")
    val model = Ivf.Model(Vector(Vector(1.0, 0.0), Vector(0.0, 1.0)))
    val rows = SemDedup.semDedup(twins, model, tau = 0.9).collect()
    val out = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cl = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(3L) === 0L && cl(4L) === 0L && cl(5L) === 1L)
    assert(out(3L) === out(4L))
    assert(out(5L) === 5L, "cross-cluster near-identical rows must not merge")
    assert(out(1L) === 1L && out(2L) === 2L)
  }

  test("trained end-to-end on a bimodal corpus: every row labeled, keeps canonical") {
    val model = Ivf.train(corpus, nlist = 2, iters = 2)
    val out = SemDedup.semDedup(corpus, model, tau = 0.97).collect()
    assert(out.length === 6)
    // canonical rows are exactly the distinct comps
    val comps = out.map(_.getLong(2)).toSet
    val keeps = out.filter(_.getLong(3) == 1L).map(_.getLong(0)).toSet
    assert(keeps === comps)
    // every comp is the min id of its members
    out.groupBy(_.getLong(2)).foreach { case (c, rows) =>
      assert(rows.map(_.getLong(0)).min === c)
    }
  }

  test("hot-cluster census cap at reclusterRounds=0: an over-cap cluster " +
    "pairs nothing — its rows stay isolated keep=1 — while under-cap " +
    "clusters still dedup") {
    // cluster 0 gets 4 near-identical members (over a cap of 3), cluster 1
    // gets 2 (under cap). Without the cap rows 1-4 would collapse to one
    // canonical; with the cap AND recovery disabled they must ALL survive
    // as isolated rows, and the under-cap cluster must still merge.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.01f)),
      (3L, Seq(0.999f, 0.02f)), (4L, Seq(0.999f, 0.03f)),
      (5L, Seq(0.0f, 1.0f)), (6L, Seq(0.01f, 0.999f))
    ).toDF("vec_id", "embedding")
    val model = Ivf.Model(Vector(Vector(1.0, 0.0), Vector(0.0, 1.0)))
    val out = SemDedup.semDedup(vecs, model, tau = 0.9, maxClusterSize = 3,
        reclusterRounds = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id) === (id, 1L),
        s"row $id of the over-cap cluster must stay an isolated canonical")
    }
    assert(out(5L) === (5L, 1L))
    assert(out(6L) === (5L, 0L), "under-cap cluster must still dedup")
    // and the uncapped control collapses cluster 0, proving the cap (not
    // the geometry) isolated the rows above
    val un = SemDedup.semDedup(vecs, model, tau = 0.9, maxClusterSize = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(Seq(2L, 3L, 4L).forall(un(_) === 0L))
  }

  test("recluster recovery: an over-cap cluster is split by a second " +
    "k-means round and dedups within sub-cells (VERDICT r15 Next #2)") {
    // 8 near-parallel vectors in ONE cluster, cap 4: the r15 guard would
    // isolate all 8 (zero recall). One recovery round trains a sub-model
    // (autoNlist: 8 rows / target 2 -> 4 cells), and with <= 4 non-empty
    // cells over 8 rows at least one cell holds >= 2 near-identical rows,
    // so SOME dedup must come back.
    val vecs = (1 to 8).map(k => (k.toLong, Seq(1.0f, k * 0.01f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.Model(Vector(Vector(1.0, 0.0)))
    val (out, subs) = SemDedup.semDedupTrace(vecs, model, tau = 0.9,
      maxClusterSize = 4, reclusterRounds = 1)
    assert(subs.size === 1, "exactly one recovery round must have trained")
    val rows = out.collect()
    val kept = rows.count(_.getLong(3) == 1L)
    assert(kept < 8, "recovery must merge at least one sub-cell pair")
    // output contract holds through the recovery: comp = min member id,
    // cluster stays the TOP-LEVEL assignment
    assert(rows.forall(_.getLong(1) == 0L))
    rows.groupBy(_.getLong(2)).foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min === c)
    }
    // rounds=0 control: the same corpus isolates everything — proving the
    // recovery (not the geometry) restored the recall
    val iso = SemDedup.semDedup(vecs, model, tau = 0.9, maxClusterSize = 4,
      reclusterRounds = 0).collect()
    assert(iso.count(_.getLong(3) == 1L) === 8)
  }

  test("recluster recovery: a group k-means cannot separate (identical " +
    "vectors, tie-to-lowest sub) stays over cap and isolates — bounded, " +
    "never infinite") {
    // 8 IDENTICAL vectors, cap 4: the sub-model's centroids are identical,
    // every row ties to sub 0, the (cluster, sub0) cell is still 8 > cap —
    // the final census must isolate all rows (and with 2 rounds the second
    // round re-trains, again cannot separate, and still terminates).
    val vecs = (1 to 8).map(k => (k.toLong, Seq(1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.Model(Vector(Vector(1.0, 0.5)))
    for (rounds <- Seq(1, 2)) {
      val (out, subs) = SemDedup.semDedupTrace(vecs, model, tau = 0.9,
        maxClusterSize = 4, reclusterRounds = rounds)
      assert(subs.size === rounds,
        s"every round trains on the still-over-cap rows (rounds=$rounds)")
      val rows = out.collect()
      assert(rows.length === 8)
      assert(rows.forall(_.getLong(3) == 1L),
        s"inseparable over-cap group must isolate (rounds=$rounds)")
    }
  }

  test("recluster hierarchy: the nlist clamp forces a second round; the " +
    "chain stays bounded and the output contract holds") {
    // reclusterMaxNlist=2 caps round 1 at a 2-cell split, so its largest
    // composite group holds >= ceil(12/2) = 6 rows > cap 4 by pigeonhole —
    // round 2 MUST train (the 100 TB hierarchy mechanism: bounded assign
    // width per round, multiplicative cell shrink across rounds)
    val vecs = (1 to 12).map(k => (k.toLong, Seq(1.0f, k * 0.01f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.Model(Vector(Vector(1.0, 0.0)))
    val (out, subs) = SemDedup.semDedupTrace(vecs, model, tau = 0.9,
      maxClusterSize = 4, reclusterRounds = 2, reclusterMaxNlist = 2)
    assert(subs.size === 2)
    assert(subs.forall(_.nlist <= 2), "every round respects the clamp")
    val rows = out.collect()
    assert(rows.length === 12 && rows.forall(_.getLong(1) == 0L))
    rows.groupBy(_.getLong(2)).foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min === c)
    }
    // and the oracle unrolls BOTH trained rounds with the composite key
    val sql = SemDedup.oracleSql(model, tau = 0.9, maxClusterSize = 4,
      subModels = subs)
    assert(sql.contains("sub1_assign") && sql.contains("sub2_assign"))
    assert(sql.contains("x.cluster = y.cluster AND x.sub1 = y.sub1 AND x.sub2 = y.sub2"))
  }

  test("recluster oracle SQL unrolls exactly the trained rounds") {
    val main = Ivf.Model(Vector(Vector(1.0, 0.0)))
    val sub = Ivf.Model(Vector(Vector(1.0, 0.01), Vector(1.0, 0.07)))
    val flat = SemDedup.oracleSql(main, tau = 0.9)
    assert(!flat.contains("sub1_assign") && flat.contains("bigF"))
    val rec = SemDedup.oracleSql(main, tau = 0.9, maxClusterSize = 4,
      subModels = Seq(sub))
    assert(rec.contains("sub1_assign") && rec.contains("over1") &&
      rec.contains("coalesce(s.idx, -1) AS sub1"))
    assert(rec.contains("x.cluster = y.cluster AND x.sub1 = y.sub1"))
  }

  test("ground-truth recall of the recovery chain on a planted-class " +
    "corpus: zero false merges, recall above the stated floor at the " +
    "default rounds (VERDICT r16 Next #1)") {
    // The battery-scale twin of the r17 recover_recall probe (PLANS.md):
    // 16 duplicate classes on mutually orthogonal/antipodal axis
    // directions in R^8 (cross-class cos ~0 or -1 — never >= tau), each
    // row = its class center + hash noise of +-5e-5 per dim (within-class
    // cos >= 0.9999 — always >= tau), so the TRUE components are exactly
    // the classes, by construction. Mass is skewed: class 0 holds 50% of
    // rows, class 1 25%, classes 2-5 5% each, classes 6-15 0.5% each —
    // at n=4000 and cap=40 every class but the last ten exceeds the cap,
    // so the recovery chain (not the plain within-cluster pairing) does
    // the work. id -> class is id % 200 banded, which also makes the ids
    // LAYOUT-CORRELATED — the shape that exposed the smallest-id k-means
    // init (hash-spread init is what makes round-1 recovery effective;
    // Ivf.train scaladoc).
    val n = 4000L
    val m = pmod(col("id"), lit(200L))
    val cls = when(m < 100, lit(0L)).when(m < 150, lit(1L))
      .when(m < 190, lit(2L) + floor((m - lit(150L)) / lit(10L)).cast("long"))
      .otherwise(lit(6L) + (m - lit(190L)))
    val emb = spark.range(n).select(
      col("id").as("vec_id"), cls.as("cls"),
      transform(sequence(lit(0), lit(7)), d =>
        (when(d === (cls % 8),
          when(cls < 8, lit(1.0)).otherwise(lit(-1.0))).otherwise(lit(0.0)) +
          (pmod(xxhash64(col("id"), d), lit(1001)).cast("double") - lit(500.0))
            / lit(1e7)).cast("float")).as("embedding"))
      .localCheckpoint(true)
    val model = Ivf.train(emb, nlist = 4, iters = 3)
    val out = SemDedup.semDedup(emb, model, tau = 0.99,
      maxClusterSize = 40) // default reclusterRounds — the shipped dial
    val agg = out.where(col("keep") === 1L).select(col("id"))
      .join(emb.select(col("vec_id").as("id"), col("cls")), Seq("id"))
      .agg(count(lit(1)).as("kept"), countDistinct(col("cls")).as("covered"))
      .head()
    val (kept, covered) = (agg.getLong(0), agg.getLong(1))
    // false merge = a class with no surviving representative: a component
    // that crossed class lines erased one. Must never happen — cross-class
    // cosine can't reach tau by construction.
    assert(covered === 16L, s"false-merged classes: ${16 - covered}")
    // recall floor: every drop is correct once covered == 16 (all rows of
    // a class are mutual duplicates), so recall = dropped / (n - classes).
    // The dial's closed form (measured across cap 40/250/1000/4000 at the
    // probe, PLANS.md r17): recovered cells hold ~target = max(2, cap/8)
    // rows and keep one representative each, so kept ~= n/target and
    //   recall ~= 1 - 8/cap   (cap 40 -> 0.80, default 1000 -> 0.992).
    // Assert the model with margin rather than a magic floor.
    val recall = (n - kept).toDouble / (n - 16).toDouble
    val predicted = 1.0 - 1.0 / math.max(2, 40 / 8)
    assert(recall >= predicted - 0.03,
      f"recovery-chain recall $recall%.4f below the 1 - 8/cap model " +
        f"($predicted%.2f at cap 40) (kept=$kept)")
  }

  test("pair join is keyed on the cluster id, not a cross product") {
    val model = Ivf.Model(Vector(Vector(1.0, 0.0, 0.0, 0.0),
      Vector(0.0, 0.0, 1.0, 0.0)))
    val plan = SemDedup.semDedup(corpus, model, tau = 0.9)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), s"within-cluster join must be an equi-join:\n$plan")
  }
}
