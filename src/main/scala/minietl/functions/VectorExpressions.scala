package minietl.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the per-pair hot loops of the similarity /
  * dedup operators.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`) are
  * evaluated by interpreting the lambda expression tree per element — they
  * never enter whole-stage codegen. That is fine per-row, but inside an
  * all-pairs or bucketed join the lambda runs per PAIR, and interpretation
  * dominates the query (measured ~3-10× end-to-end on the sf0.1 bench).
  * These expressions keep identical numeric semantics (same fold order, same
  * modular arithmetic) but execute as tight JVM loops, invoked from
  * generated code via `doGenCode`, so the surrounding operators stay inside
  * one codegen stage.
  */
object VectorOps {

  /** Sequential-fold dot product; identical result bits to
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`. Null element or length
    * mismatch → null, matching zip_with's null-padding semantics.
    */
  /** [[HyperplaneSignature]]'s kernel: bit b of the result is set iff
    * Σ_j a(j)·planes(b·dim + j) > 0, each plane dot accumulated in index
    * order with the same double arithmetic as [[dot]]. A length mismatch
    * or null element yields 0 — in the per-bit when-chain formulation this
    * replaces, those cases made every plane dot NULL and every bit take
    * its otherwise-0 branch.
    */
  def hyperplaneSig(a: ArrayData, planes: Array[Double], bits: Int, dim: Int): Int = {
    if (a.numElements() != dim) return 0
    var i = 0
    while (i < dim) { if (a.isNullAt(i)) return 0; i += 1 }
    var sig = 0
    var b = 0
    while (b < bits) {
      var s = 0.0
      val off = b * dim
      var j = 0
      while (j < dim) { s += a.getDouble(j) * planes(off + j); j += 1 }
      if (s > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** [[NearestCentroid]]'s kernel: argmin over a flattened row-major
    * centroid matrix of the squared-distance surrogate `|c|² - 2 v·c`,
    * ties to the LOWER index (strict `<` keeps the first minimum) —
    * bit-identical scores and tie order to the (score, idx)-struct
    * `array_min` formulation it replaces ([[minietl.sim.Ivf.assignList]]):
    * `c2(i)` is the same sequential square-sum fold and each dot
    * accumulates in index order with the same double ops. Null element or
    * dim mismatch → null (the corpora these serve are non-null fixed-dim;
    * a malformed row gets no cluster rather than a garbage one).
    */
  def nearestCentroid(v: ArrayData, cents: Array[Double], c2: Array[Double],
                      dim: Int): java.lang.Integer = {
    if (v.numElements() != dim) return null
    var j = 0
    while (j < dim) { if (v.isNullAt(j)) return null; j += 1 }
    val nlist = c2.length
    var best = 0
    var bestScore = 0.0
    var i = 0
    while (i < nlist) {
      var s = 0.0
      val off = i * dim
      var k = 0
      while (k < dim) { s += v.getDouble(k) * cents(off + k); k += 1 }
      val score = c2(i) - 2.0 * s
      if (i == 0 || score < bestScore) { bestScore = score; best = i }
      i += 1
    }
    Integer.valueOf(best)
  }

  /** [[WinnowOrds]]'s kernel. `th` holds token hashes already in
    * [0, 2^31-1); documents shorter than k tokens hash as one
    * whole-document gram. Window = min(w, gram count), so every non-empty
    * document selects at least one fingerprint. Consecutive-duplicate
    * suppression IS full dedup: if an ord is the minimum of windows j1 and
    * j2 it is the minimum of every window between (each lies inside
    * [j1, j2+w) and contains the ord's position), so equal selections are
    * always adjacent. Any null element → null result (malformed input,
    * callers hash non-null tokens).
    *
    * The packing `ord = gram * 2^21 + pos` budgets 2^21 gram positions per
    * document; a longer document would silently overflow position bits into
    * the gram hash and corrupt every downstream fingerprint (span dedup
    * would then excise WRONG spans with no error), so the bound is enforced
    * fail-fast here — callers must chunk over-long documents first
    * ([[minietl.text.Chunking]]).
    */
  def winnowOrds(th: ArrayData, k: Int, w: Int): ArrayData = {
    val M = 2147483647L
    val Pos = 2097152L
    val n = th.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    var c = 0
    while (c < n) { if (th.isNullAt(c)) return null; c += 1 }
    val ng = if (n >= k) n - k + 1 else 1
    if (ng > Pos) throw new IllegalArgumentException(
      s"winnowOrds: document has $ng k-grams, exceeding the 2^21 position " +
        "packing budget; chunk documents over ~2M tokens before " +
        "fingerprinting (minietl.text.Chunking)")
    val grams = new Array[Long](ng)
    if (n >= k) {
      var i = 0
      while (i < ng) {
        var acc = 0L
        var j = 0
        while (j < k) { acc = (acc * 31 + th.getLong(i + j)) % M; j += 1 }
        grams(i) = acc
        i += 1
      }
    } else {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 31 + th.getLong(j)) % M; j += 1 }
      grams(0) = acc
    }
    val weff = if (w < ng) w else ng
    val sel = new Array[Long](ng - weff + 1)
    var selN = 0
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0
    var i = 0
    while (i < ng) {
      val ord = grams(i) * Pos + i
      while (tail > head && grams(deque(tail - 1)) * Pos + deque(tail - 1) >= ord)
        tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - weff) head += 1
      if (i >= weff - 1) {
        val m = grams(deque(head)) * Pos + deque(head)
        if (selN == 0 || sel(selN - 1) != m) { sel(selN) = m; selN += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, selN))
  }

  /** [[SlotHistogram]]'s kernel: counts of each slot id in [0, dim), one
    * pass, O(tokens + dim). Null or out-of-range ids → null (malformed
    * input; callers produce ids via `hash % dim`).
    */
  def slotHistogram(slots: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    val n = slots.numElements()
    var i = 0
    while (i < n) {
      if (slots.isNullAt(i)) return null
      val s = slots.getLong(i)
      if (s < 0 || s >= dim) return null
      out(s.toInt) += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var s = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Sequential integer dot product of two int arrays (int8 quantization
    * codes); 64-bit exact. Same null/length contract as [[dot]].
    */
  def dotInt(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var s = 0L
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    s
  }

  /** Intersection size of two SORTED distinct long arrays by merge-walk —
    * zero allocation per pair, O(|a|+|b|). The building block for
    * containment scoring (|A∩B| / |A|).
    */
  def intersectSortedCount(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Jaccard similarity of two SORTED distinct long arrays by merge-walk —
    * zero allocation per pair, O(|a|+|b|).
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na + nb == 0) return null
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  final val MersennePrime = 2147483647L // 2^31 - 1

  /** k (a, b) universal-hash parameter pairs, deterministic in `seed`
    * (splitmix64 expansion — public-domain mixing constants).
    */
  def hashParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = math.abs(next()) % (MersennePrime - 1) + 1
      bs(i) = math.abs(next()) % MersennePrime
      i += 1
    }
    (as, bs)
  }

  /** All k MinHash lanes in one pass over the hashed-shingle array. Lane i =
    * min over x of ((x mod p) * a_i + b_i) mod p — identical arithmetic to
    * the per-lane `aggregate` fold.
    */
  def minhash(hashes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val x = hashes.getLong(i)
        val xm = { val m = x % MersennePrime; if (m < 0) m + MersennePrime else m }
        var lane = 0
        while (lane < k) {
          val h = (xm * as(lane) + bs(lane)) % MersennePrime
          if (h < out(lane)) out(lane) = h
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct 64-bit hashes of the word n-gram shingles of a token
    * array, computed without materializing any shingle string: each token is
    * xxhash64'd once, and a shingle's hash is an xxhash64 fold over its n
    * token hashes. Shingle-set identity (which is all Jaccard/MinHash use) is
    * preserved modulo 64-bit collisions. Fewer than n tokens → one shingle
    * covering the whole text, mirroring the string shingler's short-document
    * case.
    */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i)
        th(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      i += 1
    }
    val cnt = if (m < n) 1 else m - n + 1
    val out = new Array[Long](math.max(cnt, 1))
    if (m < n) {
      var acc = 42L
      var j = 0
      while (j < m) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(j), acc)
        j += 1
      }
      out(0) = acc
    } else {
      var j = 0
      while (j < cnt) {
        var acc = 42L
        var t = 0
        while (t < n) {
          acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(j + t), acc)
          t += 1
        }
        out(j) = acc
        j += 1
      }
    }
    java.util.Arrays.sort(out)
    // dedupe adjacent (sorted) — shingle sets are distinct by construction
    var w = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w + 1))
  }

  /** Fraction of equal lanes between two equal-length signatures — the
    * MinHash Jaccard estimate. Null on length mismatch.
    */
  def equalLaneFraction(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var i = 0
    var eq = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** 64-bit SimHash from pre-hashed tokens: per bit, sum +1/-1 votes; sign
    * sets the bit. Identical to the vote-fold expression version.
    */
  def simhash(hashes: ArrayData, k: Int): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var bit = 0
        while (bit < 64) {
          votes(bit) += (((h >>> bit) & 1L).toInt * 2) - 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= 1L << bit
      bit += 1
    }
    sig
  }
}

/** Codegen'd dot product of two array<double> columns. */
case class DotProductDouble(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = minietl.functions.VectorOps.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd 64-bit integer dot product of two array<int> columns. */
case class DotProductInt(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotIntRes")
      s"""
         |java.lang.Long $r = minietl.functions.VectorOps.dotInt($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Jaccard similarity of two sorted distinct array<bigint> columns. */
case class JaccardSortedLong(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("jacRes")
      s"""
         |java.lang.Double $r = minietl.functions.VectorOps.jaccardSorted($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd merge-walk intersection count over sorted long arrays. */
case class IntersectSortedCount(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "intersect_sorted_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.intersectSortedCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("interRes")
      s"""
         |java.lang.Long $r = minietl.functions.VectorOps.intersectSortedCount($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd k-lane MinHash signature over an xxhash64'd shingle array. */
case class MinHashSignature64(child: Expression, k: Int, seed: Long)
  extends UnaryExpression {
  @transient private lazy val params: (Array[Long], Array[Long]) = VectorOps.hashParams(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(in: Any): Any =
    VectorOps.minhash(in.asInstanceOf[ArrayData], params._1, params._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", params._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", params._2, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = minietl.functions.VectorOps.minhash($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd MinHash Jaccard estimate (equal-lane fraction) of two
  * signatures.
  */
case class MinHashEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_estimate"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.equalLaneFraction(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("estRes")
      s"""
         |java.lang.Double $r = minietl.functions.VectorOps.equalLaneFraction($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sorted-distinct shingle hashing over a token array. */
case class ShingleHashes64(child: Expression, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(in: Any): Any =
    VectorOps.shingleHashes(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = minietl.functions.VectorOps.shingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd random-hyperplane LSH signature: one matrix-vector pass over
  * `bits` ±1 sign planes (flattened row-major into `planes`, each row
  * `dim` wide), bit i set iff the plane-i dot product is > 0. Replaces a
  * per-bit `when(vec_dot(vec, plane_i) > 0, 1<<i)` chain whose generated
  * code grew LINEARLY in the plane count — at 512 planes (corpus-sized
  * 16-bit × 32-band configs, PLANS.md round-10) it exceeded Janino's
  * 64KB method limit and the whole stage fell back to interpreted
  * evaluation. Here the plane matrix travels as a codegen reference
  * object and the generated code is one helper call — constant size in
  * `bits`. Accumulation order and arithmetic match [[VectorOps.dot]]
  * exactly, so signatures are bit-identical to the chain it replaces
  * (the DuckDB oracles replay the same plane literals unchanged).
  * Null/length edge semantics of the old chain are preserved by the
  * caller wrapping with `coalesce(_, 0)`: every malformed input produced
  * signature 0 there (null dot → every bit's otherwise-0 branch).
  */
case class HyperplaneSignature(child: Expression, planes: Array[Double],
                               bits: Int, dim: Int)
  extends UnaryExpression {
  require(planes.length == bits * dim,
    s"plane matrix must be bits*dim = ${bits * dim} long, got ${planes.length}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(in: Any): Any =
    VectorOps.hyperplaneSig(in.asInstanceOf[ArrayData], planes, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = minietl.functions.VectorOps.hyperplaneSig($c, $ref, $bits, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd k-means assignment: index of the centroid minimizing
  * `|c|² - 2 v·c` over a flattened (nlist × dim) literal matrix, ties to
  * the lower index — [[VectorOps.nearestCentroid]]. A native expression
  * rather than `array_min` over (score, idx) structs because the struct
  * formulation allocates nlist InternalRows per input ROW: at the r16
  * recovery probe's shape (200k rows × 400 centroids × 4 training/assign
  * passes) the struct path measured ~61 ns per centroid-eval — 23.3 s of
  * a 35 s wall — where this loop is a dozen fused multiply-adds.
  */
case class NearestCentroid(child: Expression, centroids: Array[Double], dim: Int)
  extends UnaryExpression {
  require(dim > 0 && centroids.length % dim == 0,
    s"centroid matrix length ${centroids.length} must be a multiple of dim $dim")
  // the same sequential fold as the struct path's c.map(x => x*x).sum
  private lazy val c2: Array[Double] = {
    val nlist = centroids.length / dim
    Array.tabulate(nlist) { i =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += centroids(i * dim + j) * centroids(i * dim + j); j += 1 }
      s
    }
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(in: Any): Any =
    VectorOps.nearestCentroid(in.asInstanceOf[ArrayData], centroids, c2, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val c2Ref = ctx.addReferenceObj("centroidNorms", c2, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ncRes")
      s"""
         |java.lang.Integer $r = minietl.functions.VectorOps.nearestCentroid($c, $cRef, $c2Ref, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd winnowing selection (Schleimer/Wilkerson/Aiken '03) over an
  * array of token hashes already reduced mod 2^31-1. Computes the k-gram
  * polynomial hashes (`acc * 31 + x mod 2^31-1`, the [[minietl.dedup.Winnow]]
  * contract shared with the DuckDB oracle), packs each as
  * `gram * 2^21 + position` (min = "smallest hash, leftmost position" in one
  * comparison), and selects each w-window's minimum with a monotonic deque —
  * O(n·k + n) per document.
  *
  * A native expression rather than `transform`/`slice`/`array_min` columns
  * because higher-order-function lambdas re-evaluate every captured
  * subexpression PER ELEMENT: the column formulation (original round-11
  * draft) re-ran the token-hash array inside the gram lambda and the ords
  * array inside the window lambda — O(n³) md5 calls per document once
  * CollapseProject inlined the stages, ~300+ s for a 500-doc corpus that
  * this expression handles in milliseconds.
  */
case class WinnowOrds(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1, s"k must be >= 1 (got $k)")
  require(w >= 1, s"w must be >= 1 (got $w)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the kernel returns null for null token hashes — the codegen must test
  // for it (DotProductDouble pattern) or a null ArrayData escapes with
  // isNull=false and the consuming operator NPEs
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_ords"

  override def nullSafeEval(in: Any): Any =
    VectorOps.winnowOrds(in.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("winnowRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  minietl.functions.VectorOps.winnowOrds($c, $k, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd slot histogram (the hashing-trick TF vector): one pass over an
  * array of slot ids in [0, dim), counting occurrences into a dim-length
  * long array — O(tokens + dim) per document.
  *
  * A native expression for the same reason as [[WinnowOrds]]: the column
  * formulation `transform(sequence(0, dim-1), s -> size(filter(slots, h ->
  * h = s)))` re-evaluates the CAPTURED slots array — md5 per token — once
  * PER SLOT after CollapseProject inlines it, an O(dim × tokens) md5 blow-up
  * (measured: q_feature_hash 7.9 s warm at sf0.1 with dim = 32; this
  * expression retimes it at ~0.6 s, and the r12 checksum-forcing Bench fix
  * is what exposed the cost — count() had been pruning the vector away).
  * Out-of-range or null slot ids → null result (callers mod by dim).
  */
case class SlotHistogram(child: Expression, dim: Int)
  extends UnaryExpression {
  require(dim > 0, s"dim must be positive (got $dim)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the kernel returns null for null or out-of-range slot ids — unreachable
  // via FeatureHash.tfVector (slots are pmod(hash, dim)), but slotHistogram
  // is public API, so the codegen must surface the documented null instead
  // of leaking a null ArrayData with isNull=false
  override def nullable: Boolean = true
  override def prettyName: String = "slot_histogram"

  override def nullSafeEval(in: Any): Any =
    VectorOps.slotHistogram(in.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("histRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  minietl.functions.VectorOps.slotHistogram($c, $dim);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash over an xxhash64'd token array. */
case class SimHash64(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any =
    VectorOps.simhash(in.asInstanceOf[ArrayData], 64)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = minietl.functions.VectorOps.simhash($c, 64);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level facade over the native expressions. */
object vec {
  private def expr(c: Column) = org.apache.spark.sql.minietl.ColumnBridge.expression(c)

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(DotProductDouble(expr(a), expr(b)))

  def dotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(DotProductInt(expr(a), expr(b)))

  def jaccardSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(JaccardSortedLong(expr(a), expr(b)))

  def intersectSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(IntersectSortedCount(expr(a), expr(b)))

  def minhashEstimate(a: Column, b: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(MinHashEstimate(expr(a), expr(b)))

  def shingleHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(ShingleHashes64(expr(toks), n))

  def minhashSignature(hashes: Column, k: Int, seed: Long): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(MinHashSignature64(expr(hashes), k, seed))

  def simhash64(hashes: Column): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(SimHash64(expr(hashes)))

  def hyperplaneSig(v: Column, planes: Array[Double], bits: Int, dim: Int): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(
      HyperplaneSignature(expr(v), planes, bits, dim))

  def nearestCentroid(v: Column, centroids: Array[Double], dim: Int): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(
      NearestCentroid(expr(v), centroids, dim))

  def winnowOrds(tokenHashes: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(
      WinnowOrds(expr(tokenHashes), k, w))

  def slotHistogram(slots: Column, dim: Int): Column =
    org.apache.spark.sql.minietl.ColumnBridge.column(
      SlotHistogram(expr(slots), dim))
}
