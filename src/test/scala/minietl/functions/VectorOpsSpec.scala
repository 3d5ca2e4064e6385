package minietl.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM specs for the native expression kernels. */
class VectorOpsSpec extends AnyFunSuite {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)
  private def larr(xs: Long*) = new GenericArrayData(xs.toArray)

  test("dot: sequential fold, null on length mismatch") {
    assert(VectorOps.dot(arr(1, 2, 3), arr(4, 5, 6)) === 32.0)
    assert(VectorOps.dot(arr(1, 2), arr(1, 2, 3)) === null)
    assert(VectorOps.dot(arr(), arr()) === 0.0)
  }

  test("dotInt: exact 64-bit fold, null on length mismatch") {
    val iarr = (xs: Seq[Int]) => new GenericArrayData(xs.toArray)
    assert(VectorOps.dotInt(iarr(Seq(64, -127, 32)), iarr(Seq(64, -127, 32))) ===
      (64L * 64 + 127L * 127 + 32L * 32))
    assert(VectorOps.dotInt(iarr(Seq(1, 2)), iarr(Seq(1, 2, 3))) === null)
    assert(VectorOps.dotInt(iarr(Nil), iarr(Nil)) === 0L)
    // no 32-bit overflow: 20000 * 127 * 127 > Int.MaxValue
    val big = iarr(Seq.fill(20000)(127))
    assert(VectorOps.dotInt(big, big) === 20000L * 127 * 127)
  }

  test("jaccardSorted: merge-walk intersection over sorted distinct arrays") {
    assert(VectorOps.jaccardSorted(larr(1, 2, 3), larr(2, 3, 4)) === 0.5)
    assert(VectorOps.jaccardSorted(larr(1, 2), larr(3, 4)) === 0.0)
    assert(VectorOps.jaccardSorted(larr(1, 2), larr(1, 2)) === 1.0)
    assert(VectorOps.jaccardSorted(larr(), larr()) === null)
  }

  test("hashParams deterministic in seed, a in [1, p-1], b in [0, p-1]") {
    val (a1, b1) = VectorOps.hashParams(64, 42L)
    val (a2, b2) = VectorOps.hashParams(64, 42L)
    assert(a1.toSeq === a2.toSeq && b1.toSeq === b2.toSeq)
    assert(a1.forall(a => a >= 1 && a < VectorOps.MersennePrime))
    assert(b1.forall(b => b >= 0 && b < VectorOps.MersennePrime))
    val (a3, _) = VectorOps.hashParams(64, 7L)
    assert(a1.toSeq !== a3.toSeq)
  }

  test("minhash: k lanes, identical inputs → identical signature, est = 1") {
    val (as, bs) = VectorOps.hashParams(32, 42L)
    val s1 = VectorOps.minhash(larr(10, 20, 30), as, bs)
    val s2 = VectorOps.minhash(larr(10, 20, 30), as, bs)
    assert(s1.numElements() === 32)
    assert(VectorOps.equalLaneFraction(s1, s2) === 1.0)
    // monotone: supersets can only lower lane minima
    val s3 = VectorOps.minhash(larr(10, 20, 30, 40), as, bs)
    (0 until 32).foreach(i => assert(s3.getLong(i) <= s1.getLong(i)))
  }

  test("minhash estimate approximates true Jaccard on random sets") {
    val (as, bs) = VectorOps.hashParams(256, 42L)
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(200)(rnd.nextLong())
    val shared = xs.take(100)
    val a = shared ++ Array.fill(50)(rnd.nextLong())
    val b = shared ++ Array.fill(50)(rnd.nextLong())
    val trueJac = 100.0 / 200.0
    val est = VectorOps.equalLaneFraction(
      VectorOps.minhash(new GenericArrayData(a), as, bs),
      VectorOps.minhash(new GenericArrayData(b), as, bs))
    assert(math.abs(est - trueJac) < 0.12, s"est=$est trueJac=$trueJac")
  }

  test("shingleHashes: sorted, distinct, n-gram count, short-doc case") {
    def toks(ts: String*) =
      new GenericArrayData(ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
    val h = VectorOps.shingleHashes(toks("a", "b", "c", "d"), 3)
    assert(h.numElements() === 2) // "a b c", "b c d"
    assert((0 until h.numElements() - 1).forall(i => h.getLong(i) < h.getLong(i + 1)))
    // repeated n-gram collapses
    val rep = VectorOps.shingleHashes(toks("a", "b", "a", "b", "a"), 2)
    assert(rep.numElements() === 2) // "a b" and "b a"
    // fewer tokens than n → one whole-text shingle
    assert(VectorOps.shingleHashes(toks("a", "b"), 3).numElements() === 1)
    // same token sequence → same hashes; different sequence → different
    val h2 = VectorOps.shingleHashes(toks("a", "b", "c", "d"), 3)
    assert(h.getLong(0) === h2.getLong(0) && h.getLong(1) === h2.getLong(1))
    val swapped = VectorOps.shingleHashes(toks("d", "c", "b", "a"), 3)
    assert(VectorOps.jaccardSorted(h, swapped) === 0.0)
  }

  test("simhash: identical inputs equal, disjoint inputs differ") {
    val a = larr(1L, 2L, 3L)
    assert(VectorOps.simhash(a, 64) === VectorOps.simhash(larr(1L, 2L, 3L), 64))
    assert(VectorOps.simhash(a, 64) !== VectorOps.simhash(larr(99L, 98L, 97L), 64))
  }

  test("hyperplaneSig: per-bit sign of the sequential dot, 0 on malformed input") {
    val planes = Array(1.0, -1.0, 1.0, // plane 0
      -1.0, -1.0, 1.0) // plane 1
    assert(VectorOps.hyperplaneSig(arr(2, 1, 0.5), planes, 2, 3) === 1) // only dot0 > 0
    assert(VectorOps.hyperplaneSig(arr(-2, 1, 0.5), planes, 2, 3) === 2) // only dot1 > 0
    assert(VectorOps.hyperplaneSig(arr(2, 1, 10), planes, 2, 3) === 3) // both
    // an exactly-zero dot is NOT > 0 — bit stays clear (plane0·(1,1,0)=0)
    assert(VectorOps.hyperplaneSig(arr(1, 1, 0), planes, 2, 3) === 0)
    // length mismatch → 0, matching the null-dot/otherwise-0 chain this
    // kernel replaced
    assert(VectorOps.hyperplaneSig(arr(1.0, 2.0), planes, 2, 3) === 0)
  }

  test("equalLaneFraction counts matching positions") {
    assert(VectorOps.equalLaneFraction(larr(1, 2, 3, 4), larr(1, 9, 3, 9)) === 0.5)
    assert(VectorOps.equalLaneFraction(larr(1), larr(1, 2)) === null)
  }
}
